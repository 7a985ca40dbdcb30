"""WPP (entropy_coding_sync): per-row substreams, context sync, entry-point
offsets. Validated by libde265 decode (it follows the entry points and the
9.3.2.2 sync rules) and by native/python byte equality."""

import numpy as np
import pytest

from homerhevc_tpu.entropy import headers, native_backend
from homerhevc_tpu.pipeline import assemble, gop, intra_golden
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def wpp_params(w, h, qp):
    return headers.StreamParams(
        width=w, height=h, ctu_log2=5, min_cu_log2=5, max_tu_log2=5,
        max_tr_depth_intra=0, init_qp=qp, deblocking_disabled=True,
        wpp_enabled=True)


def test_native_matches_python_wpp():
    w, h, qp = 96, 96, 30
    y, u, v = next(synth_clip(w, h, 1, 1))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    p = wpp_params(w, h, qp)
    py_data, py_sizes = assemble.encode_slice_data_wpp(
        p, plan.ctu_plans, slice_qp=qp)
    maps = native_backend.frame_maps_from_plans(plan.ctu_plans, w, h, 32)
    nat_data, nat_sizes = native_backend.encode_slice_from_maps(
        p, maps, slice_qp=qp, slice_type=headers.SLICE_I, wpp=True)
    assert py_sizes == nat_sizes
    assert py_data == nat_data
    assert sum(py_sizes) == len(py_data)


@needs_decoder
def test_wpp_intra_conformance():
    w, h, qp = 128, 96, 32
    y, u, v = next(synth_clip(w, h, 1, 3))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    p = wpp_params(w, h, qp)
    stream = assemble.assemble_idr_au(p, plan.ctu_plans, slice_qp=qp)
    dec = de265.decode_annexb(stream)
    assert len(dec) == 1
    for d, r in zip(dec[0], plan.recon):
        assert np.array_equal(d, r)


@needs_decoder
def test_wpp_ippp_conformance():
    frames = list(synth_clip(96, 96, 4, 5))
    res = gop.encode_ippp(frames, qp=30, ctu_log2=5, deblocking=True,
                          search=8, wpp=True, backend="jax")
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == 4
    for df, rf in zip(dec, res.recons):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)


@needs_decoder
def test_wpp_single_column():
    """One CTU per row: no above-right CTU, contexts re-init per row."""
    w, h, qp = 32, 96, 33
    y, u, v = next(synth_clip(w, h, 1, 2))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    p = wpp_params(w, h, qp)
    stream = assemble.assemble_idr_au(p, plan.ctu_plans, slice_qp=qp)
    dec = de265.decode_annexb(stream)
    for d, r in zip(dec[0], plan.recon):
        assert np.array_equal(d, r)
