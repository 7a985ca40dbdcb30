"""Cross-validation: JAX wavefront pipeline == sequential golden encoder,
and its streams decode bit-exactly with libde265."""

import numpy as np
import pytest

from homerhevc_tpu.entropy import headers
from homerhevc_tpu.pipeline import assemble, intra_golden, intra_jax, plans
from homerhevc_tpu.validate import de265


def synth(w, h, seed=5, noise=20):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 2 + yy * 3 + (xx * yy) // 64) % 256)
                + rng.integers(-noise, noise + 1, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(128 + (xx[::2, ::2] - yy[::2, ::2]) // 4, 0, 255).astype(np.uint8)
    v = np.clip(128 - xx[::2, ::2] // 4, 0, 255).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_jax_matches_golden(qp):
    w, h, B = 96, 64, 32
    y, u, v = synth(w, h)
    gp = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    out = intra_jax.encode_frame_intra(y, u, v, B=B, qp=qp)
    out = {k: np.asarray(val) for k, val in out.items()}

    gmodes = np.array([int(p.luma_mode[0, 0]) for p in gp.ctu_plans]
                      ).reshape(h // B, w // B)
    assert np.array_equal(gmodes, out["modes"])
    glev = np.stack([p.coeff_y for p in gp.ctu_plans]).reshape(h // B, w // B, B, B)
    assert np.array_equal(glev, out["lev_y"])
    assert np.array_equal(gp.recon[0], out["recon_y"])
    assert np.array_equal(gp.recon[1], out["recon_u"])
    assert np.array_equal(gp.recon[2], out["recon_v"])


@pytest.mark.skipif(not de265.available(), reason="libde265 missing")
def test_jax_stream_decodes():
    w, h, B, qp = 96, 64, 32, 30
    y, u, v = synth(w, h, seed=9)
    out = intra_jax.encode_frame_intra(y, u, v, B=B, qp=qp)
    out = {k: np.asarray(val) for k, val in out.items()}
    ctu_plans = plans.plans_from_fixed_grid(out, B)
    params = headers.StreamParams(
        width=w, height=h, ctu_log2=5, min_cu_log2=5, max_tu_log2=5,
        max_tr_depth_intra=0, init_qp=qp, deblocking_disabled=True)
    stream = assemble.assemble_idr_au(params, ctu_plans, slice_qp=qp)
    frames = de265.decode_annexb(stream)
    assert np.array_equal(frames[0][0], out["recon_y"])
    assert np.array_equal(frames[0][1], out["recon_u"])
    assert np.array_equal(frames[0][2], out["recon_v"])
