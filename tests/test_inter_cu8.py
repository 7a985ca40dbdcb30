"""8x8 inter CUs (PerformanceMode.FULL_COMPUTATION): the quadtree's
deepest level carries four independent MVs per 16x16 — the spec-legal
form of the reference's PART_NxN inter role (hmr_motion_inter.c:2507;
with min_cu 8 in the SPS, 7.4.9.5 forbids inter NxN itself)."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def _motion_boundary_clip(n=4, w=192, h=96):
    """Textured square moving across a differently-moving background:
    16x16 blocks straddling the boundary want two MVs."""
    rng = np.random.default_rng(3)
    bg = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    sq = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    frames = []
    for t in range(n):
        y = bg[t * 2:t * 2 + h, t:t + w].copy()
        y[30 + t * 5:54 + t * 5, 40 + t * 7:64 + t * 7] = sq
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (255 - y[::2, ::2]).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _encode(frames, pm, search=16, chunked=False):
    cfg = EncoderConfig(width=frames[0][0].shape[1],
                        height=frames[0][0].shape[0], qp=30, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=search, performance_mode=pm)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    if chunked:
        aus = enc.encode_frames(frames, chunk=len(frames) - 1)
    else:
        aus = [enc.encode_frame(*f) for f in frames]
    return enc, aus


def test_cu8_decision_fires():
    import jax.numpy as jnp
    from homerhevc_tpu.pipeline import p_jax
    frames = _motion_boundary_clip()
    enc, _ = _encode(frames[:1], PerformanceMode.FULL_COMPUTATION)
    # 192x96 is CTU-aligned, so the raw planes are already padded
    out = p_jax.p_frame_tree_device(
        jnp.asarray(frames[1][0]),
        jnp.asarray(frames[1][1]), jnp.asarray(frames[1][2]),
        *enc._ref, ctu=32, qp=30, search=16, me_precision=2,
        sign_hiding=True, tr_split=True, intra_in_p=True,
        vis=(96, 192), cu8=True)
    hist = np.bincount(np.asarray(out["depth_u"]).ravel(), minlength=3)
    assert hist[2] > 0, hist       # some 8x8 CUs chosen


@needs_decoder
@pytest.mark.parametrize("search", [16, 32])
def test_cu8_conformant(search):
    frames = _motion_boundary_clip()
    enc, aus = _encode(frames, PerformanceMode.FULL_COMPUTATION,
                       search=search)
    dec = de265.decode_annexb(b"".join(aus))
    for ci in range(3):
        assert np.array_equal(dec[-1][ci], np.asarray(enc._ref[ci])), ci


@needs_decoder
def test_cu8_chunked_conformant():
    frames = _motion_boundary_clip(n=5)
    enc, aus = _encode(frames, PerformanceMode.FULL_COMPUTATION,
                       chunked=True)
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == len(frames)
    for ci in range(3):
        assert np.array_equal(dec[-1][ci], np.asarray(enc._ref[ci])), ci


@needs_decoder
def test_cu8_bits_win_on_motion_boundaries():
    frames = _motion_boundary_clip()
    _, aus_fast = _encode(frames, PerformanceMode.FAST_COMPUTATION)
    _, aus_full = _encode(frames, PerformanceMode.FULL_COMPUTATION)
    assert sum(map(len, aus_full)) < sum(map(len, aus_fast))
