"""Inter CU quadtree P frames: conformance + BS-map consistency.

The tree path (performance_mode FULL/FAST) RD-selects per-CTU between
CU = CTU/32/16 with hierarchical ME; the decoder cross-check (libde265
reconstruction must equal the encoder's device recon) validates the
variable-depth syntax, the z-order merge/AMVP walk and the unit-granular
deblocking in one shot."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

pytestmark = pytest.mark.skipif(not de265.available(),
                                reason="libde265 missing")


def test_tree_ippp_conformance_cu32():
    frames = list(synth_clip(128, 64, 5, seed=2))
    cfg = EncoderConfig(width=128, height=64, qp=30, cu_size=32,
                        intra_period=0, sign_hiding=True,
                        sample_adaptive_offset=True)
    enc = HomerEncoder(cfg, backend="jax")
    assert enc.inter_split            # default performance mode => tree on
    bs = b""
    recs = []
    for y, u, v in frames:
        bs += enc.encode_frame(y, u, v)
        recs.append(enc.last_recon)
    dec = list(de265.decode_annexb(bs))
    assert len(dec) == 5
    for i, d in enumerate(dec):
        for k in range(3):
            np.testing.assert_array_equal(d[k], recs[i][k])


def test_tree_actually_splits():
    """A frame with localized motion must produce mixed CU depths."""
    import jax.numpy as jnp

    from homerhevc_tpu.pipeline import p_jax

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 128), np.uint8)
    ref = base.copy()
    cur = base.copy()
    # shift one 16-aligned patch by 2 pels: its 16-CU finds an exact MV
    # while the rest of the CTU is static — a single 32-MV can't do both
    cur[0:16, 0:16] = ref[2:18, 2:18]
    flat_u = np.full((32, 64), 128, np.uint8)
    out = p_jax.p_frame_tree_device(
        jnp.asarray(cur.astype(np.int32)), jnp.asarray(flat_u),
        jnp.asarray(flat_u), jnp.asarray(ref), jnp.asarray(flat_u),
        jnp.asarray(flat_u), ctu=32, qp=32, search=8, me_precision=2)
    depth = np.asarray(out["depth_u"])
    assert depth.max() >= 1           # something split
    assert (depth == 0).any()         # something stayed whole


def test_bs_units_matches_blocks_on_fixed_grid():
    """depth-0 quadtree == fixed 32-grid: the unit BS maps must agree with
    the block-based derivation used by the flat pipeline."""
    from homerhevc_tpu.ops import deblock as dbk

    rng = np.random.default_rng(3)
    nby, nbx, B = 3, 4, 32
    mvs = rng.integers(-20, 20, (nby, nbx, 2)).astype(np.int32)
    cbf = rng.integers(0, 2, (nby, nbx)).astype(bool)
    bs_v_b, bs_h_b = dbk.inter_bs_from_blocks(mvs, cbf, B, xp=np)

    un = B // 4
    depth_u = np.zeros((nby * un, nbx * un), np.int32)
    mv_u = np.repeat(np.repeat(mvs, un, 0), un, 1)
    cbf_u = np.repeat(np.repeat(cbf, un, 0), un, 1)
    bs_v_u, bs_h_u = dbk.inter_bs_from_units(depth_u, mv_u, cbf_u, 5, xp=np)
    np.testing.assert_array_equal(bs_v_b, bs_v_u)
    np.testing.assert_array_equal(bs_h_b, bs_h_u)
