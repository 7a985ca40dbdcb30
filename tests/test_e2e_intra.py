"""End-to-end conformance: encode all-intra, decode with libde265, require
bit-exact reconstruction match (SURVEY.md §4 decode-and-compare strategy)."""

import numpy as np
import pytest

from homerhevc_tpu.entropy import headers
from homerhevc_tpu.pipeline import assemble, intra_golden
from homerhevc_tpu.utils.psnr import psnr
from homerhevc_tpu.validate import de265

pytestmark = pytest.mark.skipif(not de265.available(), reason="libde265 missing")


def synth_frame(w, h, seed=0, noise=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 2 + yy * 3 + (xx * yy) // 64) % 256).astype(np.int32)
    if noise:
        y = y + rng.integers(-noise, noise + 1, size=y.shape)
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(128 + (xx[::2, ::2] - yy[::2, ::2]) // 4, 0, 255).astype(np.uint8)
    v = np.clip(128 - xx[::2, ::2] // 4 + (yy[::2, ::2]) // 8, 0, 255).astype(np.uint8)
    return y, u, v


def roundtrip(w, h, qp, ctu_log2, noise=0, seed=0):
    y, u, v = synth_frame(w, h, seed=seed, noise=noise)
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=ctu_log2)
    params = headers.StreamParams(
        width=w, height=h, ctu_log2=ctu_log2, min_cu_log2=ctu_log2,
        max_tu_log2=min(5, ctu_log2), max_tr_depth_intra=0, init_qp=qp,
        deblocking_disabled=True)
    stream = assemble.assemble_idr_au(params, plan.ctu_plans, slice_qp=qp)
    frames = de265.decode_annexb(stream)
    assert len(frames) == 1
    for dec, rec in zip(frames[0], plan.recon):
        assert np.array_equal(dec, rec), "decoder/encoder recon mismatch"
    return y, plan.recon[0], len(stream)


@pytest.mark.parametrize("qp", [12, 22, 32, 45, 51])
def test_qp_sweep(qp):
    y, rec, nbytes = roundtrip(64, 64, qp, 5)
    if qp <= 22:
        assert psnr(y, rec) > 40


def test_ctu16():
    roundtrip(64, 48, 32, 4)


def test_noisy_content():
    roundtrip(64, 64, 27, 5, noise=40, seed=3)


def test_wider_frame():
    roundtrip(160, 96, 32, 5, noise=10, seed=7)
