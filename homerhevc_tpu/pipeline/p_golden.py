"""Sequential numpy P-frame encoder — the deterministic inter oracle.

Role of the reference's motion_inter path (hmr_motion_inter.c:1404-1779 ME,
:2471 per-CU estimation, :3493 merge check) reduced to the v1 operating
point: CU = PU = TU = CTU (2Nx2N), one L0 reference, full-window integer
search + half/quarter refinement, merge/skip by MV match.

Structured exactly like the TPU pipeline (p_jax.py): stage A — per-block ME
+ MC + transform with NO intra-frame dependency (frame-batched on device);
stage B — the shared sequential host walk (ops.inter_golden.
derive_block_decisions). Both pipelines must produce identical streams.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import tables
from ..entropy.syntax import CtuPlan
from ..ops import golden, interp
from ..ops.inter_golden import (MotionField, derive_block_decisions,
                                mv_bits_fx)

PAD = 72            # max hierarchical search range (64) + 8-tap support


@dataclass
class PFramePlan:
    ctu_plans: list
    recon: tuple
    field: MotionField
    cbf_y_unit: np.ndarray      # (uh, uw) bool, for deblock BS
    sad: np.ndarray = None      # (nby, nbx) best integer ME cost


def lambda_me_fx(qp: int) -> int:
    """sqrt(P-slice lambda) in x256 fixed point (SAD-domain, HM convention
    with the inter lambda scale — see tables.P_LAMBDA_SCALE)."""
    return int(tables.LAMBDA_ME_FX_P[min(max(qp, 0), 51)])


HIER_THRESHOLD = 24     # keep equal to p_jax.HIER_THRESHOLD


def _pool(a: np.ndarray, f: int) -> np.ndarray:
    h, w = a.shape
    return (a.astype(np.int64).reshape(h // f, f, w // f, f)
            .sum(axis=(1, 3)))


def _bits(v: int) -> int:
    return 1 + 2 * abs(int(v)).bit_length()


def integer_search_hier(blk: np.ndarray, ref_pad: np.ndarray, x0: int,
                        y0: int, search: int, lam_fx: int,
                        ref4: np.ndarray = None, ref2=None, seed=None):
    """Golden twin of p_jax._me_hier for one block: L2 coarse sweep over
    4:1 box-summed planes, then L0 full-res +-3 over a zero anchor + the
    pyramid pick. First-minimum in (candidate, dy, dx) raster order at
    every level — bit-identical to the device pipeline. (ref2 kept for
    call-site compatibility; unused.)

    seed=(cy, cx): skip L2 and refine around the given integer MV — the
    8x8-CU level, which the device seeds from its parent 16-block's pick
    clipped to +-search."""
    size = blk.shape[0]
    if seed is not None:
        cy = int(np.clip(seed[0], -search, search))
        cx = int(np.clip(seed[1], -search, search))
    else:
        R4 = search // 4
        n4 = 2 * R4 + 1
        P4 = PAD // 4
        if ref4 is None:
            ref4 = _pool(ref_pad, 4)
        b4 = _pool(blk, 4)
        s4 = size // 4
        region4 = ref4[y0 // 4 + P4 - R4:y0 // 4 + P4 + R4 + s4,
                       x0 // 4 + P4 - R4:x0 // 4 + P4 + R4 + s4]
        wins = np.lib.stride_tricks.sliding_window_view(region4, (s4, s4))
        sads = np.abs(wins - b4).sum(axis=(-1, -2))             # (n4, n4)
        d4 = np.arange(-R4, R4 + 1)
        bits = np.array([_bits(16 * int(c)) for c in d4])
        cost4 = sads + ((lam_fx * (bits[:, None] + bits[None, :])) >> 8)
        k = int(np.argmin(cost4))           # first min: smallest dy4, dx4
        cy, cx = 4 * int(d4[k // n4]), 4 * int(d4[k % n4])

    # L0: full-res +-3 over [zero anchor, pyramid pick] in that order
    best = None
    for ay, ax in ((0, 0), (cy, cx)):
        region = ref_pad[y0 + PAD + ay - 3:y0 + PAD + ay + 3 + size,
                         x0 + PAD + ax - 3:x0 + PAD + ax + 3 + size]
        wins = np.lib.stride_tricks.sliding_window_view(region, (size, size))
        sads = np.abs(wins.astype(np.int32) - blk).sum(axis=(-1, -2))
        dd = np.arange(-3, 4)
        bity = np.array([_bits(4 * (ay + int(d))) for d in dd])
        bitx = np.array([_bits(4 * (ax + int(d))) for d in dd])
        cost = sads + ((lam_fx * (bity[:, None] + bitx[None, :])) >> 8)
        j = int(np.argmin(cost))
        cand = (int(cost.reshape(-1)[j]), ax + int(dd[j % 7]),
                ay + int(dd[j // 7]))
        if best is None or cand[0] < best[0]:       # strict: zero-anchor ties win
            best = cand
    return best[1], best[2], best[0]


def integer_search(blk: np.ndarray, ref_pad: np.ndarray, x0: int, y0: int,
                   search: int, lam_fx: int, ref4: np.ndarray = None,
                   ref2: np.ndarray = None) -> tuple[int, int]:
    """Full-window integer-pel search, cost = SAD + lam*bits(4*mv).

    Window scanned in (dy, dx) raster order from -search; ties keep the
    first minimum — matched exactly by the JAX pipeline's ordered scan.
    Ranges above HIER_THRESHOLD dispatch to the hierarchical search.
    """
    if search > HIER_THRESHOLD:
        return integer_search_hier(blk, ref_pad, x0, y0, search, lam_fx,
                                   ref4=ref4, ref2=ref2)
    size = blk.shape[0]
    n = 2 * search + 1
    region = ref_pad[y0 + PAD - search:y0 + PAD + search + size,
                     x0 + PAD - search:x0 + PAD + search + size]
    wins = np.lib.stride_tricks.sliding_window_view(region, (size, size))
    sads = np.abs(wins.astype(np.int32) - blk).sum(axis=(-1, -2))   # (n, n)
    d = np.arange(-search, search + 1)
    bits = np.array([1 + 2 * abs(4 * int(c)).bit_length() for c in d])
    mvcost = (lam_fx * (bits[:, None] + bits[None, :])) >> 8        # (dy, dx)
    cost = sads + mvcost
    k = int(np.argmin(cost))            # first min: smallest dy, then dx
    return int(d[k % n]), int(d[k // n]), int(cost.reshape(-1)[k])


def subpel_refine(blk: np.ndarray, ref_pad: np.ndarray, x0: int, y0: int,
                  mv_int: tuple[int, int], lam_fx: int, precision: int):
    """Half then quarter refinement (precision 0/1/2 = pel/half/quarter).

    Candidates per stage: [center, 8 neighbors in (dy, dx) raster order],
    strict-less to replace — first minimum wins on ties.
    """
    mvx, mvy = 4 * mv_int[0], 4 * mv_int[1]
    size = blk.shape[0]

    def cost_at(qx, qy):
        pred = interp.mc_luma(ref_pad, PAD, x0, y0, size, size, qx, qy)
        sad = int(np.abs(blk - pred).sum())
        return sad + ((lam_fx * mv_bits_fx(qx, qy)) >> 8)

    best = (cost_at(mvx, mvy), mvx, mvy)
    for step in ([2] if precision >= 1 else []) + ([1] if precision >= 2 else []):
        cx, cy = best[1], best[2]
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                c = cost_at(cx + dx, cy + dy)
                if c < best[0]:
                    best = (c, cx + dx, cy + dy)
    return best[1], best[2]


def encode_p_frame(y, u, v, ref_planes, *, qp: int, ctu_log2: int = 5,
                   search: int = 16, me_precision: int = 2,
                   max_merge_cand: int = 5,
                   sign_hiding: bool = False) -> PFramePlan:
    """Encode one P frame, CU = TU = CTU grid, one reference."""
    size = 1 << ctu_log2
    h, w = y.shape
    assert h % size == 0 and w % size == 0
    uh, uw = h // 4, w // 4
    units = size // 4
    nby, nbx = h // size, w // size
    qp_c = int(tables.chroma_qp_from_luma(qp))
    lam_fx = lambda_me_fx(qp)
    log2 = ctu_log2

    ry = interp.pad_plane(ref_planes[0].astype(np.int32), PAD)
    ru = interp.pad_plane(ref_planes[1].astype(np.int32), PAD // 2)
    rv = interp.pad_plane(ref_planes[2].astype(np.int32), PAD // 2)
    ry4 = _pool(ry, 4) if search > HIER_THRESHOLD else None

    # ---- stage A: per-block ME + MC + transform (order-independent) ----
    mvs = np.zeros((nby, nbx, 2), np.int32)
    lev_y = np.zeros((nby, nbx, size, size), np.int32)
    lev_u = np.zeros((nby, nbx, size // 2, size // 2), np.int32)
    lev_v = np.zeros_like(lev_u)
    rec_y = np.zeros((h, w), np.uint8)
    rec_u = np.zeros((h // 2, w // 2), np.uint8)
    rec_v = np.zeros((h // 2, w // 2), np.uint8)

    def code_block(orig, pred, qpq, lg2, max_tb=5):
        """Residual-code one inter block. Above max_tb the TU implicitly
        splits into four half-size TBs (spec 7.3.8.8); a 64 luma CU's
        chroma follows the luma split (max_tb 4 -> 16x16 chroma TBs)."""
        resid = orig.astype(np.int32) - pred
        if lg2 > max_tb:
            h = 1 << (lg2 - 1)
            lev = np.zeros_like(resid)
            rec = np.zeros_like(resid)
            for (qy, qx) in ((0, 0), (0, h), (h, 0), (h, h)):
                lq, rq = code_block(orig[qy:qy + h, qx:qx + h],
                                    pred[qy:qy + h, qx:qx + h], qpq,
                                    lg2 - 1, max_tb)
                lev[qy:qy + h, qx:qx + h] = lq
                rec[qy:qy + h, qx:qx + h] = rq
            return lev, rec.astype(np.uint8)
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
        # skip-vs-code RD (hmr_motion_inter.c:106): identical ints to p_jax
        lamf = int(tables.LAMBDA_FX_P[qpq])
        o32 = orig.astype(np.int32)
        ssd_c = int(((o32 - rec) ** 2).sum())
        ssd_s = int(((o32 - pred) ** 2).sum())
        bits = min(int(tables.level_bits_est(lev)), 16383)
        if not (ssd_c + (((lamf >> 4) * bits) >> 4) < ssd_s):
            lev = np.zeros_like(lev)
            rec = pred
        return lev, rec.astype(np.uint8)

    # ---- loop 1: integer + subpel MV per block (order-independent) ----
    sad = np.zeros((nby, nbx), np.int32)
    ivs = np.zeros((nby, nbx, 2), np.int32)
    for r in range(nby):
        for c in range(nbx):
            y0, x0 = r * size, c * size
            blk = y[y0:y0 + size, x0:x0 + size].astype(np.int32)
            ix, iy, cost = integer_search(blk, ry, x0, y0, search, lam_fx,
                                          ref4=ry4)
            sad[r, c] = cost
            ivs[r, c] = (ix, iy)
            mvs[r, c] = subpel_refine(blk, ry, x0, y0, (ix, iy), lam_fx,
                                      me_precision)

    # ---- loop 2: merge/skip RD twin of p_jax._level_encode ----
    from .p_jax import MB_LEFT, MB_TOP, MB_ZERO
    mvs_pre = mvs.copy()               # pre-merge field (candidate source)
    for r in range(nby):
        for c in range(nbx):
            y0, x0 = r * size, c * size
            blk = y[y0:y0 + size, x0:x0 + size].astype(np.int32)
            mvx, mvy = int(mvs_pre[r, c, 0]), int(mvs_pre[r, c, 1])
            vx, vy = int(ivs[r, c, 0]), int(ivs[r, c, 1])

            def sad_at(qx_, qy_):
                p = interp.mc_luma(ry, PAD, x0, y0, size, size, qx_, qy_)
                return int(np.abs(blk - p).sum())

            best = (sad_at(mvx, mvy)
                    + ((lam_fx * (mv_bits_fx(mvx, mvy))) >> 8))
            cands = []
            if c > 0:
                cands.append((int(mvs_pre[r, c - 1, 0]),
                              int(mvs_pre[r, c - 1, 1]), MB_LEFT))
            else:
                cands.append(None)
            if r > 0:
                cands.append((int(mvs_pre[r - 1, c, 0]),
                              int(mvs_pre[r - 1, c, 1]), MB_TOP))
            else:
                cands.append(None)
            cands.append((0, 0, MB_ZERO))
            for cd in cands:
                if cd is None:
                    continue
                cmx, cmy, mb = cd
                if mb != MB_ZERO and (abs(cmx - 4 * vx) > 3
                                      or abs(cmy - 4 * vy) > 3):
                    continue
                cost_c = sad_at(cmx, cmy) + ((lam_fx * mb) >> 8)
                if cost_c < best:
                    best = cost_c
                    mvx, mvy = cmx, cmy
            mvs[r, c] = (mvx, mvy)

            pred_y = interp.mc_luma(ry, PAD, x0, y0, size, size, mvx, mvy)
            cs = size // 2
            cx0, cy0 = x0 // 2, y0 // 2
            pred_u = interp.mc_chroma(ru, PAD // 2, cx0, cy0, cs, cs, mvx, mvy)
            pred_v = interp.mc_chroma(rv, PAD // 2, cx0, cy0, cs, cs, mvx, mvy)

            cmax_tb = 4 if log2 == 6 else 5
            lev_y[r, c], rc_y = code_block(blk, pred_y, qp, log2)
            lev_u[r, c], rc_u = code_block(u[cy0:cy0 + cs, cx0:cx0 + cs],
                                           pred_u, qp_c, log2 - 1, cmax_tb)
            lev_v[r, c], rc_v = code_block(v[cy0:cy0 + cs, cx0:cx0 + cs],
                                           pred_v, qp_c, log2 - 1, cmax_tb)
            rec_y[y0:y0 + size, x0:x0 + size] = rc_y
            rec_u[cy0:cy0 + cs, cx0:cx0 + cs] = rc_u
            rec_v[cy0:cy0 + cs, cx0:cx0 + cs] = rc_v

    # ---- stage B: shared sequential decision walk ----
    plan = build_p_plans(mvs, lev_y, lev_u, lev_v,
                         (rec_y, rec_u, rec_v), size=size,
                         max_merge_cand=max_merge_cand)
    plan.sad = sad
    return plan


def build_p_plans(mvs, lev_y, lev_u, lev_v, recon, *, size: int,
                  max_merge_cand: int = 5) -> PFramePlan:
    """Stage B: decisions + CtuPlan assembly from per-block arrays (used by
    both the golden and the JAX pipelines)."""
    nby, nbx = mvs.shape[:2]
    units = size // 4
    cbf_blk = (np.any(lev_y, axis=(-1, -2)))
    has_resid = (cbf_blk | np.any(lev_u, axis=(-1, -2))
                 | np.any(lev_v, axis=(-1, -2)))
    dec, fld = derive_block_decisions(mvs, has_resid, size, max_merge_cand)

    # cbf at TU granularity (TU = min(size, 32): a 64 CU implicitly splits)
    tu = min(size, 32)
    tpb = size // tu
    cbf_tb = np.any(
        np.asarray(lev_y).reshape(nby, nbx, tpb, tu, tpb, tu), axis=(3, 5))
    cbf_y_unit = (np.repeat(np.repeat(
        cbf_tb.transpose(0, 2, 1, 3).reshape(nby * tpb, nbx * tpb),
        tu // 4, 0), tu // 4, 1))
    plans = []
    for r in range(nby):
        for c in range(nbx):
            full = lambda val, dt: np.full((units, units), val, dt)
            plans.append(CtuPlan(
                x0=c * size, y0=r * size,
                depth_map=full(0, np.int8),
                luma_mode=full(1, np.int8), chroma_mode=full(1, np.int8),
                part_nxn=full(False, bool), tr_depth_map=full(0, np.int8),
                coeff_y=lev_y[r, c], coeff_cb=lev_u[r, c],
                coeff_cr=lev_v[r, c],
                pred_intra=full(False, bool),
                skip=full(bool(dec["skip"][r, c]), bool),
                merge_flag=full(bool(dec["merge"][r, c]), bool),
                merge_idx=full(int(dec["merge_idx"][r, c]), np.int8),
                mvd=np.broadcast_to(dec["mvd"][r, c],
                                    (units, units, 2)).copy(),
                mvp_idx=full(int(dec["mvp_idx"][r, c]), np.int8),
            ))
    return PFramePlan(plans, recon, fld, cbf_y_unit)
