"""Per-CTU-row QP (cu_qp_delta): dQP syntax in both entropy backends and
the device pipeline's decoded-QP inference, all decode-verified."""

import dataclasses

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import BitrateMode, EncoderConfig, PerformanceMode
from homerhevc_tpu.entropy import headers, native_backend
from homerhevc_tpu.pipeline import assemble, intra_golden, p_golden
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


@needs_decoder
def test_dqp_syntax_python_and_native_byte_equal():
    """Per-row-QP golden P frame: python oracle == C++ walker, and the
    stream decodes to the exact per-row-quantised reconstruction."""
    W, H, ctu = 128, 96, 32
    frames = list(synth_clip(W, H, 2, seed=0))
    params = headers.StreamParams(
        width=W, height=H, ctu_log2=5, min_cu_log2=5, max_tu_log2=5,
        init_qp=32, sign_hiding=False, deblocking_disabled=True,
        num_ref_frames=1, cu_qp_delta_enabled=True, cu_qp_delta_depth=0)
    ip = intra_golden.encode_intra_frame(*frames[0], qp=32, ctu_log2=5)
    stream = assemble.assemble_idr_au(params, ip.ctu_plans, slice_qp=32)
    nbx = W // ctu
    row_qps = [30, 33, 34]
    plans, recon_y = [], np.zeros((H, W), np.uint8)
    for r, q in enumerate(row_qps):
        pr = p_golden.encode_p_frame(*frames[1], ip.recon, qp=q, ctu_log2=5,
                                     search=8, me_precision=2)
        for c in range(nbx):
            plans.append(dataclasses.replace(pr.ctu_plans[r * nbx + c],
                                             qp_ctu=q))
        recon_y[r * ctu:(r + 1) * ctu] = pr.recon[0][r * ctu:(r + 1) * ctu]
    au_native = assemble.assemble_p_au(params, plans, poc=1, slice_qp=32)
    avail = native_backend.available
    native_backend.available = lambda: False
    try:
        au_py = assemble.assemble_p_au(params, plans, poc=1, slice_qp=32)
    finally:
        native_backend.available = avail
    assert au_py == au_native
    dec = de265.decode_annexb(stream + au_native)
    assert np.array_equal(dec[1][0], recon_y)


@needs_decoder
def test_row_qp_device_recon_exact():
    """Chunked device pipeline with a forced varying row-QP plan: the
    device reference planes must equal the decoder output bit-exactly
    (covers quant/dequant/SBH with per-block QP, dQP coding, and the
    decoded-QP inference feeding deblock)."""
    from homerhevc_tpu.rate_control import RateControl
    W, H = 192, 128
    frames = list(synth_clip(W, H, 5, seed=0))
    cfg = EncoderConfig(width=W, height=H, qp=32, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=8, wpp=True,
                        bitrate_mode=BitrateMode.CBR, bitrate=500_000,
                        frame_rate=25,
                        performance_mode=PerformanceMode.FAST_COMPUTATION)
    orig_plan = RateControl.plan_rows
    RateControl.plan_rows = lambda self, q, n, *a, **k: np.clip(
        np.asarray([q - 4, q, q + 2, q + 1][:n]), 0, 51).astype(np.int32)
    try:
        enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
        assert enc._row_qp_on
        aus = enc.encode_frames(frames, chunk=4)
    finally:
        RateControl.plan_rows = orig_plan
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == len(frames)
    ref = tuple(np.asarray(p) for p in enc._ref)
    for ci in range(3):
        assert np.array_equal(dec[-1][ci], ref[ci]), ci


@needs_decoder
def test_row_qp_cbr_720_smoke():
    """CBR with per-row QP active end-to-end on a wider frame (multiple
    CTU columns/rows) stays decodable and RC-stable."""
    W, H = 320, 192
    frames = list(synth_clip(W, H, 8, seed=1))
    cfg = EncoderConfig(width=W, height=H, qp=34, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=8, wpp=True,
                        bitrate_mode=BitrateMode.CBR, bitrate=600_000,
                        frame_rate=25,
                        performance_mode=PerformanceMode.FAST_COMPUTATION)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    aus = enc.encode_frames(frames, chunk=4)
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == len(frames)
