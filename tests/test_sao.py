"""SAO: conformance (libde265 applies our signaled offsets — recon equality
validates stats, params, application and syntax together), native/python
byte equality, and quality sanity."""

import numpy as np
import pytest

from homerhevc_tpu.entropy import headers, native_backend
from homerhevc_tpu.ops import sao
from homerhevc_tpu.pipeline import assemble, gop, intra_golden
from homerhevc_tpu.utils.psnr import psnr
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


@needs_decoder
def test_sao_intra_conformance():
    w, h, qp = 96, 64, 37
    y, u, v = next(synth_clip(w, h, 1, 1))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    qp_c = 34
    info, filt = sao.sao_stage((y, u, v), plan.recon, 32, qp, qp_c)
    params = headers.StreamParams(
        width=w, height=h, ctu_log2=5, min_cu_log2=5, max_tu_log2=5,
        max_tr_depth_intra=0, init_qp=qp, deblocking_disabled=True,
        sao_enabled=True)
    stream = assemble.assemble_idr_au(params, plan.ctu_plans, slice_qp=qp,
                                      sao_info=info)
    dec = de265.decode_annexb(stream)
    assert len(dec) == 1
    for name, d, r in zip("yuv", dec[0], filt):
        assert np.array_equal(d, r), f"{name} mismatch"
    # SAO should not hurt quality (it was RD-chosen against the source)
    assert psnr(y, filt[0]) >= psnr(y, plan.recon[0]) - 0.01


@needs_decoder
def test_sao_ippp_conformance():
    frames = list(synth_clip(96, 64, 4, 7))
    res = gop.encode_ippp(frames, qp=34, ctu_log2=5, deblocking=True,
                          search=8, sao=True, backend="jax")
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == 4
    for t, (df, rf) in enumerate(zip(dec, res.recons)):
        for name, d, r in zip("yuv", df, rf):
            assert np.array_equal(d, r), f"frame {t} {name}"


@needs_decoder
def test_sao_with_wpp_and_sbh():
    frames = list(synth_clip(96, 96, 3, 2))
    res = gop.encode_ippp(frames, qp=33, ctu_log2=5, deblocking=True,
                          search=8, sao=True, wpp=True, sign_hiding=True,
                          backend="jax")
    dec = de265.decode_annexb(res.stream)
    for df, rf in zip(dec, res.recons):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)


def test_sao_native_matches_python():
    w, h, qp = 96, 64, 36
    y, u, v = next(synth_clip(w, h, 1, 4))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    info, _ = sao.sao_stage((y, u, v), plan.recon, 32, qp, 33)
    params = headers.StreamParams(
        width=w, height=h, ctu_log2=5, min_cu_log2=5, max_tu_log2=5,
        max_tr_depth_intra=0, init_qp=qp, deblocking_disabled=True,
        sao_enabled=True)
    py = assemble.encode_slice_data(params, plan.ctu_plans, slice_qp=qp,
                                    native=False, sao_info=info)
    maps = native_backend.frame_maps_from_plans(plan.ctu_plans, w, h, 32)
    nat = native_backend.encode_slice_from_maps(
        params, maps, slice_qp=qp, slice_type=headers.SLICE_I, sao_info=info)
    assert py == nat
