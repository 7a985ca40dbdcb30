"""IBP GOP with B frames: conformance via libde265 (display-order
reconstruction must match bit-exactly) — validates two-list merge with
combined-bi candidates, per-list AMVP with MV scaling, bi-prediction
averaging, B-slice syntax, and the reorder/RPS machinery."""

import numpy as np
import pytest

from homerhevc_tpu.pipeline import gop
from homerhevc_tpu.utils.psnr import psnr
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def run_ibp(w, h, n, qp, seed=0, **kw):
    frames = list(synth_clip(w, h, n, seed))
    res = gop.encode_ibp(frames, qp=qp, ctu_log2=5, **kw)
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == n, (len(dec), n)
    for t, (df, rf) in enumerate(zip(dec, res.recons)):
        for name, d, r in zip("yuv", df, rf):
            assert np.array_equal(d, r), f"frame {t} plane {name}"
    return frames, res


@needs_decoder
def test_ibp_basic():
    frames, res = run_ibp(64, 64, 5, 32, deblocking=False, search=8)
    # B frames should be cheap (bi-prediction + merge from both anchors)
    assert res.per_frame_bytes[1] <= res.per_frame_bytes[2]


@needs_decoder
def test_ibp_deblocked():
    run_ibp(96, 64, 5, 30, seed=2, deblocking=True, search=8)


@needs_decoder
def test_ibp_even_length_and_sbh():
    frames, res = run_ibp(64, 64, 6, 33, seed=4, deblocking=True, search=8,
                          sign_hiding=True)
    y = frames[-1][0]
    assert psnr(y, res.recons[-1][0]) > 25


@needs_decoder
def test_ibp_quality_vs_ippp():
    frames = list(synth_clip(96, 64, 5, 1))
    ibp = gop.encode_ibp(frames, qp=32, ctu_log2=5, deblocking=True, search=8)
    ippp = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=True,
                           search=8)
    de265.decode_annexb(ibp.stream)
    # bi-prediction should not cost more bits overall on smooth motion
    assert sum(ibp.per_frame_bytes) <= sum(ippp.per_frame_bytes) * 1.15
