"""Hierarchical wide-window ME (search > 24): device == golden, wide-motion
RD wins, and config validation of the range/padding contract."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.pipeline import gop
from homerhevc_tpu.utils.synth import synth_clip


def test_hier_jax_matches_golden_stream():
    frames = list(synth_clip(96, 64, 3, 0))
    a = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=True,
                        search=32, backend="golden")
    b = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=True,
                        search=32, backend="jax")
    assert a.stream == b.stream


def test_hier_catches_wide_motion():
    """A +-40px pan is invisible to the dense +-16 window but caught by the
    hierarchical pyramid: P frames must get materially cheaper."""
    from homerhevc_tpu.api import HomerEncoder
    H, W = 96, 160
    pad = 128
    yy, xx = np.mgrid[0:H + 2 * pad, 0:W + 2 * pad]
    rng = np.random.default_rng(1)
    base = np.clip(((xx * 2 + yy * 3 + (xx * yy) // 97) % 256)
                   + rng.integers(-12, 13, xx.shape), 0, 255).astype(np.uint8)
    frames = []
    for k in range(3):
        oy, ox = pad - 40 * k, pad + 28 * k
        u = np.full((H // 2, W // 2), 128, np.uint8)
        frames.append((base[oy:oy + H, ox:ox + W], u, u.copy()))
    sizes = {}
    for sr in (16, 64):
        cfg = EncoderConfig(width=W, height=H, qp=32, cu_size=32,
                            intra_period=100, me_search_range=sr,
                            sign_hiding=True,
                            performance_mode=PerformanceMode.FAST_COMPUTATION,
                            reinit_gop_on_scene_change=False)
        enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
        sizes[sr] = sum(len(enc.encode_frame(*f)) for f in frames[1:])
    assert sizes[64] < 0.75 * sizes[16], sizes


def test_search_range_validation():
    base = dict(width=64, height=64, qp=32)
    EncoderConfig(**base, me_search_range=24).validate()
    EncoderConfig(**base, me_search_range=64).validate()
    with pytest.raises(ValueError):
        EncoderConfig(**base, me_search_range=65).validate()
    with pytest.raises(ValueError):
        EncoderConfig(**base, me_search_range=30).validate()  # not 4-aligned
    with pytest.raises(ValueError):
        EncoderConfig(**base, me_search_range=0).validate()
