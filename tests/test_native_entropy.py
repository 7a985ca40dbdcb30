"""Native C++ CABAC backend must be byte-identical to the Python oracle
(same strategy as the reference's EE/EC duality validation: two
implementations of the same normative process cross-checked)."""

import numpy as np
import pytest

from homerhevc_tpu.entropy import headers, native_backend
from homerhevc_tpu.pipeline import assemble, intra_golden, p_golden
from homerhevc_tpu.utils.synth import synth_clip

pytestmark = pytest.mark.skipif(not native_backend.available(),
                                reason="g++ backend unavailable")


def params_for(w, h, qp, ctu_log2=5, sign_hiding=False):
    return headers.StreamParams(
        width=w, height=h, ctu_log2=ctu_log2, min_cu_log2=ctu_log2,
        max_tu_log2=min(5, ctu_log2), max_tr_depth_intra=0,
        max_tr_depth_inter=0, init_qp=qp, sign_hiding=sign_hiding,
        deblocking_disabled=True)


@pytest.mark.parametrize("qp", [17, 32, 47])
def test_intra_slice_equal(qp):
    y, u, v = next(synth_clip(96, 64, 1, 3))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=qp, ctu_log2=5)
    p = params_for(96, 64, qp)
    py = assemble.encode_slice_data(p, plan.ctu_plans, slice_qp=qp,
                                    native=False)
    nat = native_backend.encode_slice_data_native(
        p, plan.ctu_plans, slice_qp=qp, slice_type=headers.SLICE_I)
    assert py == nat


def test_p_slice_equal():
    frames = list(synth_clip(96, 64, 2, 5))
    ip = intra_golden.encode_intra_frame(*frames[0], qp=30, ctu_log2=5)
    pp = p_golden.encode_p_frame(*frames[1], ip.recon, qp=30, ctu_log2=5,
                                 search=8)
    p = params_for(96, 64, 30)
    py = assemble.encode_slice_data(p, pp.ctu_plans, slice_qp=30,
                                    slice_type=headers.SLICE_P, native=False)
    nat = native_backend.encode_slice_data_native(
        p, pp.ctu_plans, slice_qp=30, slice_type=headers.SLICE_P)
    assert py == nat


def test_ctu16_equal():
    y, u, v = next(synth_clip(64, 48, 1, 9))
    plan = intra_golden.encode_intra_frame(y, u, v, qp=28, ctu_log2=4)
    p = params_for(64, 48, 28, ctu_log2=4)
    py = assemble.encode_slice_data(p, plan.ctu_plans, slice_qp=28,
                                    native=False)
    nat = native_backend.encode_slice_data_native(
        p, plan.ctu_plans, slice_qp=28, slice_type=headers.SLICE_I)
    assert py == nat


def test_native_tree_decisions_match_python():
    """C++ decision walk == Python golden walk on random quadtrees."""
    from homerhevc_tpu.entropy import native_backend
    from homerhevc_tpu.ops.inter_golden import derive_tree_decisions
    if not native_backend.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for ctu_log2, (uh, uw) in [(5, (24, 32)), (6, (32, 48))]:
        step = (1 << ctu_log2) // 4
        depth = np.zeros((uh, uw), np.int32)
        for r in range(0, uh, step):
            for c in range(0, uw, step):
                d = int(rng.integers(0, 3))
                depth[r:r+step, c:c+step] = d
                if d >= 1:  # random deeper split of one quadrant
                    h = step // 2
                    q = int(rng.integers(0, 4))
                    ro, co = r + (q // 2) * h, c + (q % 2) * h
                    depth[ro:ro+h, co:co+h] = d + int(rng.integers(0, 2))
        # constant MV over each depth-region leaf: emulate by unit-level MVs
        # snapped per 4-unit block (good enough: walk reads corner unit)
        mv = rng.integers(-32, 33, (uh, uw, 2)).astype(np.int32)
        mv = np.repeat(np.repeat(mv[::4, ::4], 4, 0), 4, 1)[:uh, :uw]
        nz = rng.random((uh, uw)) < 0.4
        want, _ = derive_tree_decisions(depth, mv, nz, ctu_log2, 5)
        got = native_backend.derive_tree_decisions_native(depth, mv, nz,
                                                          ctu_log2, 5)
        for k in want:
            assert np.array_equal(want[k], got[k]), (ctu_log2, k)
