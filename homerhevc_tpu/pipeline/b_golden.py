"""Sequential numpy B-frame encoder (IBP GOP, one reference per list).

Role of the reference's B paths: bi-ME (hmr_motion_inter.c:1279), weighted
average (:2903), per-list estimation loop (:2556-2584). Structure mirrors
p_golden: stage A per-block ME/MC/residual (order-independent), stage B the
sequential decision walk over decoder-exact B merge/AMVP lists
(ops/inter_b.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import tables
from ..entropy.syntax import CtuPlan
from ..ops import golden, interp
from ..ops.inter_b import (BMotion, BMotionField, amvp_candidates_b,
                           merge_candidates_b)
from ..ops.inter_golden import mv_bits_fx
from .p_golden import PAD, integer_search, lambda_me_fx, subpel_refine


@dataclass
class BFramePlan:
    ctu_plans: list
    recon: tuple
    field: BMotionField
    cbf_y_unit: np.ndarray


def encode_b_frame(y, u, v, ref0, ref1, *, qp: int, ctu_log2: int = 5,
                   search: int = 16, me_precision: int = 2,
                   max_merge_cand: int = 5, sign_hiding: bool = False,
                   poc: int = 1, poc_refs=(0, 2)) -> BFramePlan:
    """Encode one B frame, CU = TU = CTU grid, refs (past, future)."""
    size = 1 << ctu_log2
    h, w = y.shape
    uh, uw = h // 4, w // 4
    units = size // 4
    nby, nbx = h // size, w // size
    qp_c = int(tables.chroma_qp_from_luma(qp))
    lam_fx = lambda_me_fx(qp)
    log2 = ctu_log2

    pads = []
    for rp in (ref0, ref1):
        pads.append((interp.pad_plane(rp[0].astype(np.int32), PAD),
                     interp.pad_plane(rp[1].astype(np.int32), PAD // 2),
                     interp.pad_plane(rp[2].astype(np.int32), PAD // 2)))

    rec_y = np.zeros((h, w), np.uint8)
    rec_u = np.zeros((h // 2, w // 2), np.uint8)
    rec_v = np.zeros((h // 2, w // 2), np.uint8)
    arr_idc = np.zeros((nby, nbx), np.int32)
    arr_mv0 = np.zeros((nby, nbx, 2), np.int32)
    arr_mv1 = np.zeros((nby, nbx, 2), np.int32)
    arr_lev_y = np.zeros((nby, nbx, size, size), np.int32)
    arr_lev_u = np.zeros((nby, nbx, size // 2, size // 2), np.int32)
    arr_lev_v = np.zeros_like(arr_lev_u)

    def code_block(orig, pred, qpq, lg2):
        resid = orig.astype(np.int32) - pred
        coeff = golden.forward_transform(resid)
        lev = golden.quantize(coeff, qpq, lg2, is_intra=False)
        if sign_hiding:
            from .intra_golden import _apply_sbh
            lev = _apply_sbh(lev, coeff, qpq, lg2, False)
        if np.any(lev):
            r = golden.inverse_transform(golden.dequantize(lev, qpq, lg2))
        else:
            r = np.zeros_like(resid)
        rec = np.clip(pred + r, 0, 255)
        lamf = int(tables.LAMBDA_FX_P[qpq])
        o32 = orig.astype(np.int32)
        ssd_c = int(((o32 - rec) ** 2).sum())
        ssd_s = int(((o32 - pred) ** 2).sum())
        bits = min(int(tables.level_bits_est(lev)), 16383)
        if not (ssd_c + (((lamf >> 4) * bits) >> 4) < ssd_s):
            lev = np.zeros_like(lev)
            rec = pred
        return lev, rec.astype(np.uint8)

    for r in range(nby):
        for c in range(nbx):
            y0, x0 = r * size, c * size
            blk = y[y0:y0 + size, x0:x0 + size].astype(np.int32)
            cs = size // 2
            cx0, cy0 = x0 // 2, y0 // 2

            # per-list ME
            mvs, costs = [], []
            for l in (0, 1):
                ry_p = pads[l][0]
                ix, iy, _ = integer_search(blk, ry_p, x0, y0, search, lam_fx)
                mx, my = subpel_refine(blk, ry_p, x0, y0, (ix, iy), lam_fx,
                                       me_precision)
                pred = interp.mc_luma(ry_p, PAD, x0, y0, size, size, mx, my)
                sad = int(np.abs(blk - pred).sum())
                mvs.append((mx, my))
                costs.append(sad + ((lam_fx * mv_bits_fx(mx, my)) >> 8))
            # bi: average of the two HP predictions
            hp0 = interp.mc_luma_hp(pads[0][0], PAD, x0, y0, size, size, *mvs[0])
            hp1 = interp.mc_luma_hp(pads[1][0], PAD, x0, y0, size, size, *mvs[1])
            pred_bi = interp.bi_average(hp0, hp1)
            sad_bi = int(np.abs(blk - pred_bi).sum())
            cost_bi = sad_bi + ((lam_fx * (mv_bits_fx(*mvs[0])
                                           + mv_bits_fx(*mvs[1]))) >> 8)
            all_costs = [costs[0], costs[1], cost_bi]
            idc = int(np.argmin(all_costs))      # tie: L0, L1, BI order

            if idc == 2:
                pred_y = pred_bi
                pu = interp.bi_average(
                    interp.mc_chroma_hp(pads[0][1], PAD // 2, cx0, cy0, cs, cs, *mvs[0]),
                    interp.mc_chroma_hp(pads[1][1], PAD // 2, cx0, cy0, cs, cs, *mvs[1]))
                pv = interp.bi_average(
                    interp.mc_chroma_hp(pads[0][2], PAD // 2, cx0, cy0, cs, cs, *mvs[0]),
                    interp.mc_chroma_hp(pads[1][2], PAD // 2, cx0, cy0, cs, cs, *mvs[1]))
                motion = BMotion(True, True, mvs[0], mvs[1])
            else:
                p = pads[idc]
                mv = mvs[idc]
                pred_y = interp.mc_luma(p[0], PAD, x0, y0, size, size, *mv)
                pu = interp.mc_chroma(p[1], PAD // 2, cx0, cy0, cs, cs, *mv)
                pv = interp.mc_chroma(p[2], PAD // 2, cx0, cy0, cs, cs, *mv)
                motion = BMotion(idc == 0, idc == 1,
                                 mvs[0] if idc == 0 else (0, 0),
                                 mvs[1] if idc == 1 else (0, 0))

            lev_y, rc_y = code_block(blk, pred_y, qp, log2)
            lev_u, rc_u = code_block(u[cy0:cy0 + cs, cx0:cx0 + cs], pu,
                                     qp_c, log2 - 1)
            lev_v, rc_v = code_block(v[cy0:cy0 + cs, cx0:cx0 + cs], pv,
                                     qp_c, log2 - 1)
            has_resid = bool(np.any(lev_y) or np.any(lev_u) or np.any(lev_v))

            arr_idc[r, c] = idc
            arr_mv0[r, c] = mvs[0] if idc != 1 else (0, 0)
            arr_mv1[r, c] = mvs[1] if idc != 0 else (0, 0)
            arr_lev_y[r, c] = lev_y
            arr_lev_u[r, c] = lev_u
            arr_lev_v[r, c] = lev_v
            rec_y[y0:y0 + size, x0:x0 + size] = rc_y
            rec_u[cy0:cy0 + cs, cx0:cx0 + cs] = rc_u
            rec_v[cy0:cy0 + cs, cx0:cx0 + cs] = rc_v

    return build_b_plans(arr_idc, arr_mv0, arr_mv1, arr_lev_y, arr_lev_u,
                         arr_lev_v, (rec_y, rec_u, rec_v), size=size,
                         poc=poc, poc_refs=poc_refs,
                         max_merge_cand=max_merge_cand)


def build_b_plans(idc_a, mv0_a, mv1_a, lev_y_a, lev_u_a, lev_v_a, recon, *,
                  size: int, poc: int, poc_refs, max_merge_cand: int = 5):
    """Stage B: sequential decode-order merge/AMVP walk over per-block
    arrays — shared by the golden and device (b_jax) B pipelines."""
    nby, nbx = idc_a.shape
    h, w = nby * size, nbx * size
    uh, uw = h // 4, w // 4
    units = size // 4
    fld = BMotionField(uh, uw)
    cbf_y_unit = np.zeros((uh, uw), bool)
    plans = []
    rec_y, rec_u, rec_v = recon
    for r in range(nby):
        for c in range(nbx):
            y0, x0 = r * size, c * size
            idc = int(idc_a[r, c])
            mv0 = (int(mv0_a[r, c, 0]), int(mv0_a[r, c, 1]))
            mv1 = (int(mv1_a[r, c, 0]), int(mv1_a[r, c, 1]))
            motion = BMotion(idc != 1, idc != 0, mv0, mv1)
            lev_y = np.asarray(lev_y_a[r, c])
            lev_u = np.asarray(lev_u_a[r, c])
            lev_v = np.asarray(lev_v_a[r, c])
            has_resid = bool(np.any(lev_y) or np.any(lev_u) or np.any(lev_v))

            # decisions against decoder-exact candidate lists
            mcands = merge_candidates_b(fld, x0, y0, size, max_merge_cand)
            mi = next((i for i, cd in enumerate(mcands)
                       if cd.key() == motion.key()), -1)
            merge = mi >= 0
            skip = merge and not has_resid
            mvd0 = mvd1 = (0, 0)
            mvp0 = mvp1 = 0
            if not merge:
                if motion.pf0:
                    am = amvp_candidates_b(fld, x0, y0, size, 0, poc, poc_refs)
                    b0 = mv_bits_fx(motion.mv0[0] - am[0][0],
                                    motion.mv0[1] - am[0][1])
                    b1 = mv_bits_fx(motion.mv0[0] - am[1][0],
                                    motion.mv0[1] - am[1][1])
                    mvp0 = 0 if b0 <= b1 else 1
                    mvd0 = (motion.mv0[0] - am[mvp0][0],
                            motion.mv0[1] - am[mvp0][1])
                if motion.pf1:
                    am = amvp_candidates_b(fld, x0, y0, size, 1, poc, poc_refs)
                    b0 = mv_bits_fx(motion.mv1[0] - am[0][0],
                                    motion.mv1[1] - am[0][1])
                    b1 = mv_bits_fx(motion.mv1[0] - am[1][0],
                                    motion.mv1[1] - am[1][1])
                    mvp1 = 0 if b0 <= b1 else 1
                    mvd1 = (motion.mv1[0] - am[mvp1][0],
                            motion.mv1[1] - am[mvp1][1])

            if merge:
                # decoder uses the merge candidate's full motion
                motion = mcands[mi]
            fld.set_cu(x0, y0, size, motion)
            cbf_y_unit[y0 // 4:(y0 + size) // 4,
                       x0 // 4:(x0 + size) // 4] = bool(np.any(lev_y))

            full = lambda val, dt: np.full((units, units), val, dt)
            plans.append(CtuPlan(
                x0=x0, y0=y0,
                depth_map=full(0, np.int8),
                luma_mode=full(1, np.int8), chroma_mode=full(1, np.int8),
                part_nxn=full(False, bool), tr_depth_map=full(0, np.int8),
                coeff_y=lev_y, coeff_cb=lev_u, coeff_cr=lev_v,
                pred_intra=full(False, bool),
                skip=full(skip, bool),
                merge_flag=full(merge, bool),
                merge_idx=full(max(mi, 0), np.int8),
                mvd=np.broadcast_to(np.array(mvd0, np.int32),
                                    (units, units, 2)).copy(),
                mvp_idx=full(mvp0, np.int8),
                inter_dir=full(idc, np.int8),
                mvd_l1=np.broadcast_to(np.array(mvd1, np.int32),
                                       (units, units, 2)).copy(),
                mvp_idx_l1=full(mvp1, np.int8),
            ))

    return BFramePlan(plans, (rec_y, rec_u, rec_v), fld, cbf_y_unit)
