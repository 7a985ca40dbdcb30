"""IPPP conformance: encode IDR+P sequence, decode with libde265, require
bit-exact reconstruction (decode-and-compare, SURVEY.md §4)."""

import numpy as np
import pytest

from homerhevc_tpu.pipeline import gop
from homerhevc_tpu.utils.psnr import psnr
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

pytestmark = pytest.mark.skipif(not de265.available(), reason="libde265 missing")


def run_seq(w, h, n, qp, seed=0, **kw):
    frames = list(synth_clip(w, h, n, seed))
    res = gop.encode_ippp(frames, qp=qp, ctu_log2=5, **kw)
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == n, (len(dec), n)
    for t, (df, rf) in enumerate(zip(dec, res.recons)):
        for name, d, r in zip("yuv", df, rf):
            assert np.array_equal(d, r), f"frame {t} plane {name} mismatch"
    return frames, res


def test_ippp_basic():
    frames, res = run_seq(64, 64, 4, 32, deblocking=False, search=8)
    # P frames should be much cheaper than the IDR on panning content.
    assert res.per_frame_bytes[1] < res.per_frame_bytes[0]


def test_ippp_deblocked():
    run_seq(64, 64, 4, 30, deblocking=True, search=8)


def test_ippp_wider_motion():
    frames, res = run_seq(128, 64, 5, 34, seed=2, deblocking=True, search=12)
    y_last = frames[-1][0]
    # quality smoke guard; 26.5 (was 27.0) after the structure-aware TB bit
    # costs deliberately moved the QP34 RD point toward fewer bits
    assert psnr(y_last, res.recons[-1][0]) > 26.5


def test_ippp_qp_sweep():
    for qp in (22, 42):
        run_seq(64, 64, 3, qp, deblocking=True, search=8)


def test_ippp_midstream_idr():
    run_seq(64, 64, 5, 32, deblocking=True, search=8, intra_period=3)


def test_ippp_pel_precision():
    run_seq(64, 64, 3, 32, deblocking=True, search=8, me_precision=0)
