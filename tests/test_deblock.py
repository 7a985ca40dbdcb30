"""Deblocking conformance: enable deblocking in the PPS, decode with
libde265, and require the decoder's (deblocked) output to equal our
deblock_frame() applied to the encoder reconstruction — a bit-exact
cross-implementation check of spec 8.7.2."""

import numpy as np
import pytest

from homerhevc_tpu.entropy import headers
from homerhevc_tpu.ops import deblock
from homerhevc_tpu.pipeline import assemble, intra_golden
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

pytestmark = pytest.mark.skipif(not de265.available(), reason="libde265 missing")


def encode_and_compare(w, h, qp, ctu_log2, seed=0):
    y, u, v = next(synth_clip(w, h, 1, seed))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=ctu_log2)
    params = headers.StreamParams(
        width=w, height=h, ctu_log2=ctu_log2, min_cu_log2=ctu_log2,
        max_tu_log2=min(5, ctu_log2), max_tr_depth_intra=0, init_qp=qp,
        deblocking_disabled=False)
    stream = assemble.assemble_idr_au(params, plan.ctu_plans, slice_qp=qp)
    frames = de265.decode_annexb(stream)
    assert len(frames) == 1

    B = 1 << ctu_log2
    tu = min(B, 32)
    bs_v, bs_h = deblock.intra_edge_maps(h, w, tu)
    qp_map = np.full((h // 4, w // 4), qp, np.int32)
    fy, fu, fv = deblock.deblock_frame(
        plan.recon[0].astype(np.int32), plan.recon[1].astype(np.int32),
        plan.recon[2].astype(np.int32),
        bs_v=bs_v, bs_h=bs_h, qp_map=qp_map)
    for name, dec, ours in zip("yuv", frames[0], (fy, fu, fv)):
        assert np.array_equal(dec.astype(np.int32), ours), f"{name} mismatch"


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_deblock_qp(qp):
    encode_and_compare(64, 64, qp, 5)


def test_deblock_ctu16():
    encode_and_compare(64, 48, 37, 4)


def test_deblock_larger():
    encode_and_compare(160, 96, 32, 5, seed=7)


def test_deblock_jax_matches_numpy():
    import jax.numpy as jnp
    w, h, qp = 64, 64, 32
    y, u, v = next(synth_clip(w, h, 1, 3))
    bs_v, bs_h = deblock.intra_edge_maps(h, w, 32)
    qp_map = np.full((h // 4, w // 4), qp, np.int32)
    args = dict(bs_v=bs_v, bs_h=bs_h, qp_map=qp_map)
    ny, nu, nv = deblock.deblock_frame(y.astype(np.int32), u.astype(np.int32),
                                       v.astype(np.int32), **args)
    jy, ju, jv = deblock.deblock_frame(jnp.asarray(y, jnp.int32),
                                       jnp.asarray(u, jnp.int32),
                                       jnp.asarray(v, jnp.int32),
                                       xp=jnp, **args)
    assert np.array_equal(ny, np.asarray(jy))
    assert np.array_equal(nu, np.asarray(ju))
    assert np.array_equal(nv, np.asarray(jv))
