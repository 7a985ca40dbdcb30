"""Chunked multi-frame pipeline == per-frame pipeline, byte-for-byte.

The chunk path (pipeline/p_chunk.py) moves deblock + SAO derivation on
device and compacts the coefficient fetch; every AU must still equal the
per-frame path's output exactly (and decode via libde265 where available).
"""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.utils.synth import synth_clip


def _cfg(w, h, mode, **kw):
    return EncoderConfig(width=w, height=h, qp=32, cu_size=32,
                         intra_period=100, sign_hiding=True,
                         me_search_range=8, performance_mode=mode, **kw)


@pytest.mark.parametrize("mode", [PerformanceMode.FAST_COMPUTATION,
                                  PerformanceMode.FASTEST_COMPUTATION])
def test_chunk_matches_frame_path(mode):
    W, H = 128, 96
    frames = list(synth_clip(W, H, 6, seed=3))
    cfg = _cfg(W, H, mode, sample_adaptive_offset=True, deblocking=True)
    ref = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    want = [ref.encode_frame(*f) for f in frames]
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    got = enc.encode_frames(frames, chunk=3)
    for k, (a, b) in enumerate(zip(want, got)):
        assert a == b, f"frame {k} differs: {len(a)} vs {len(b)} bytes"


def test_chunk_overflow_fallback(monkeypatch):
    """Tiny capacity forces the dense-levels fallback path."""
    W, H = 128, 96
    frames = list(synth_clip(W, H, 4, seed=1))
    cfg = _cfg(W, H, PerformanceMode.FAST_COMPUTATION,
               sample_adaptive_offset=False, deblocking=True)
    ref = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    want = [ref.encode_frame(*f) for f in frames]
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    monkeypatch.setattr(HomerEncoder, "_chunk_cap", property(lambda self: 4))
    got = enc.encode_frames(frames, chunk=4)
    assert want == got


def test_chunk_decodes():
    de265 = pytest.importorskip("homerhevc_tpu.validate.de265")
    if not de265.available():
        pytest.skip("libde265 missing")
    W, H = 128, 96
    frames = list(synth_clip(W, H, 5, seed=2))
    cfg = _cfg(W, H, PerformanceMode.FAST_COMPUTATION,
               sample_adaptive_offset=True, deblocking=True)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=True)
    # per-frame twin for the reference recon
    tw = HomerEncoder(cfg, backend="jax", fetch_recon=True)
    recons = []
    for f in frames:
        tw.encode_frame(*f)
        recons.append(tw.last_recon)
    enc2 = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    aus = enc2.encode_frames(frames, chunk=2)
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == len(frames)
    for k, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(dy, recons[k][0]), f"luma mismatch frame {k}"
        assert np.array_equal(du, recons[k][1])
        assert np.array_equal(dv, recons[k][2])


@pytest.mark.parametrize("depth", [2, 3])
def test_pipeline_depth_matches(depth):
    """cfg.frame_pipeline_depth keeps D chunks in flight; streams must
    stay byte-identical to the per-frame path."""
    import dataclasses
    W, H = 128, 96
    frames = list(synth_clip(W, H, 7, seed=3))
    cfg = _cfg(W, H, PerformanceMode.FASTEST_COMPUTATION,
               sample_adaptive_offset=True, deblocking=True)
    ref = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    want = [ref.encode_frame(*f) for f in frames]
    c2 = dataclasses.replace(cfg, frame_pipeline_depth=depth)
    enc = HomerEncoder(c2, backend="jax", fetch_recon=False)
    got = enc.encode_frames(frames, chunk=2)
    assert want == got
