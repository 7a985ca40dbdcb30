"""Intra transform-depth RDO (split_transform_flag, one level): role of
the reference's residual-quadtree loop in encode_intra_luma
(hmr_motion_intra.c:1229-1632). A TU-split CU keeps its single PU/mode but
codes four half-size TBs, each re-predicting from in-CU recon. Streams
must decode bit-exactly in libde265 with splits present."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def _mixed_frame():
    """Smooth gradient + textured patches: quadrant-inhomogeneous CUs where
    TU splitting wins."""
    rng = np.random.default_rng(7)
    H, W = 128, 256
    y = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    y[32:48, 32:48] = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    y[64:72, 64:72] = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    y[96:112, 128:144] = ((np.arange(16)[:, None] * 16
                           + np.arange(16)[None]) % 256).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
    v = (255 - y[::2, ::2]).astype(np.uint8)
    return y, u, v


def test_decision_fires():
    import jax.numpy as jnp
    from homerhevc_tpu import tables
    from homerhevc_tpu.pipeline import intra_jax
    y, _, _ = _mixed_frame()
    lam = int(tables.LAMBDA_FX[32])
    _, _, _, trd_u = intra_jax._open_loop_maps(
        jnp.asarray(y.astype(np.int32)), B=32, qp=32, lam_fx=lam,
        strong_smoothing=True, rd_mode=1, tu_split=True)
    assert int(np.asarray(trd_u).sum()) > 0


@needs_decoder
@pytest.mark.parametrize("cu", [32, 64])
def test_tu_split_conformant(cu):
    y, u, v = _mixed_frame()
    cfg = EncoderConfig(width=256, height=128, qp=32, cu_size=cu,
                        max_intra_tr_depth=1, sign_hiding=True,
                        sample_adaptive_offset=True)
    enc = HomerEncoder(cfg, backend="jax")
    au = enc.encode_frame(y, u, v)
    dec = de265.decode_annexb(au)
    for d, r in zip(dec[0], enc.last_recon):
        assert np.array_equal(d, r)


@needs_decoder
def test_tu_split_rd_no_worse():
    """With the extra RD option the stream must not get (meaningfully)
    bigger at equal-or-better quality on split-friendly content."""
    y, u, v = _mixed_frame()
    sizes = {}
    for td in (0, 1):
        cfg = EncoderConfig(width=256, height=128, qp=32, cu_size=32,
                            max_intra_tr_depth=td, sign_hiding=True,
                            sample_adaptive_offset=True)
        enc = HomerEncoder(cfg, backend="jax")
        sizes[td] = len(enc.encode_frame(y, u, v))
    # allow the split-flag bins but no real regression
    assert sizes[1] <= sizes[0] * 1.02, sizes
