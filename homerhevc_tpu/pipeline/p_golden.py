"""Sequential numpy P-frame encoder — the deterministic inter oracle.

Role of the reference's motion_inter path (hmr_motion_inter.c:1404-1779 ME,
:2471 per-CU estimation, :3493 merge check) reduced to the v1 operating
point: CU = PU = TU = CTU (2Nx2N), one L0 reference, full-window integer
search + half/quarter refinement, merge/skip by MV match.

The decision rule is deliberately expressible as (a) a frame-batched device
stage (ME + MC + transform per block, no intra-frame dependency) plus (b) a
cheap sequential host walk (merge/AMVP index derivation) — the JAX pipeline
(p_jax.py) implements the identical rule so both produce the same stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import tables
from ..entropy.syntax import CtuPlan
from ..ops import golden, interp
from ..ops.inter_golden import MotionField, amvp_candidates, merge_candidates

PAD = 32            # reference padding: search range + 8-tap support


@dataclass
class PFramePlan:
    ctu_plans: list
    recon: tuple
    field: MotionField
    cbf_y_unit: np.ndarray      # (uh, uw) bool, for deblock BS


def mv_bits_fx(mvx: int, mvy: int) -> int:
    """Deterministic MV bit proxy: 2*bitlen(|c|) + 1 per component."""
    def comp(c):
        a = abs(int(c))
        return 1 + 2 * a.bit_length()
    return comp(mvx) + comp(mvy)


def lambda_me_fx(qp: int) -> int:
    """sqrt(lambda) in x256 fixed point (SAD-domain lambda, HM convention)."""
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    return int(round(lam ** 0.5 * 256))


def integer_search(blk: np.ndarray, ref_pad: np.ndarray, x0: int, y0: int,
                   search: int, lam_fx: int) -> tuple[int, int]:
    """Full-window integer-pel search, cost = SAD + lam*bits(4*mv).

    Window order (dy, dx) raster from -search so ties pick smallest dy, dx —
    matched exactly by the JAX pipeline's argmin.
    """
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
    return int(d[k % n]), int(d[k // n])


def subpel_refine(blk: np.ndarray, ref_pad: np.ndarray, x0: int, y0: int,
                  mv_int: tuple[int, int], lam_fx: int, precision: int):
    """Half then quarter refinement (precision 0/1/2 = pel/half/quarter)."""
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
                   max_merge_cand: int = 5) -> PFramePlan:
    """Encode one P frame, CU = TU = CTU grid, one reference."""
    size = 1 << ctu_log2
    h, w = y.shape
    assert h % size == 0 and w % size == 0
    uh, uw = h // 4, w // 4
    units = size // 4
    qp_c = int(tables.chroma_qp_from_luma(qp))
    lam_fx = lambda_me_fx(qp)
    log2 = ctu_log2

    ry = interp.pad_plane(ref_planes[0].astype(np.int32), PAD)
    ru = interp.pad_plane(ref_planes[1].astype(np.int32), PAD // 2)
    rv = interp.pad_plane(ref_planes[2].astype(np.int32), PAD // 2)

    rec_y = np.zeros((h, w), np.uint8)
    rec_u = np.zeros((h // 2, w // 2), np.uint8)
    rec_v = np.zeros((h // 2, w // 2), np.uint8)
    fld = MotionField(uh, uw)
    cbf_y_unit = np.zeros((uh, uw), bool)
    plans = []

    for y0 in range(0, h, size):
        for x0 in range(0, w, size):
            blk = y[y0:y0 + size, x0:x0 + size].astype(np.int32)
            mvi = integer_search(blk, ry, x0, y0, search, lam_fx)
            mvx, mvy = subpel_refine(blk, ry, x0, y0, mvi, lam_fx, me_precision)

            # Prediction + residual for the chosen MV.
            pred_y = interp.mc_luma(ry, PAD, x0, y0, size, size, mvx, mvy)
            cs = size // 2
            cx0, cy0 = x0 // 2, y0 // 2
            pred_u = interp.mc_chroma(ru, PAD // 2, cx0, cy0, cs, cs, mvx, mvy)
            pred_v = interp.mc_chroma(rv, PAD // 2, cx0, cy0, cs, cs, mvx, mvy)

            def code_block(orig, pred, qpq, lg2):
                resid = orig.astype(np.int32) - pred
                coeff = golden.forward_transform(resid)
                lev = golden.quantize(coeff, qpq, lg2, is_intra=False)
                if np.any(lev):
                    r = golden.inverse_transform(golden.dequantize(lev, qpq, lg2))
                else:
                    r = np.zeros_like(resid)
                return lev, np.clip(pred + r, 0, 255).astype(np.uint8)

            lev_y, rc_y = code_block(blk, pred_y, qp, log2)
            lev_u, rc_u = code_block(u[cy0:cy0 + cs, cx0:cx0 + cs], pred_u,
                                     qp_c, log2 - 1)
            lev_v, rc_v = code_block(v[cy0:cy0 + cs, cx0:cx0 + cs], pred_v,
                                     qp_c, log2 - 1)
            has_resid = bool(np.any(lev_y) or np.any(lev_u) or np.any(lev_v))

            # merge / AMVP decision (decoder-exact candidate lists).
            mcands = merge_candidates(fld, x0, y0, size, max_merge_cand)
            merge_idx = next((i for i, c in enumerate(mcands)
                              if c == (mvx, mvy, 0)), -1)
            merge = merge_idx >= 0
            skip = merge and not has_resid
            if merge and not has_resid:
                pass
            if not merge:
                amvp = amvp_candidates(fld, x0, y0, size)
                b0 = mv_bits_fx(mvx - amvp[0][0], mvy - amvp[0][1])
                b1 = mv_bits_fx(mvx - amvp[1][0], mvy - amvp[1][1])
                mvp_idx = 0 if b0 <= b1 else 1
                mvd = (mvx - amvp[mvp_idx][0], mvy - amvp[mvp_idx][1])
            else:
                mvp_idx, mvd = 0, (0, 0)

            rec_y[y0:y0 + size, x0:x0 + size] = rc_y
            rec_u[cy0:cy0 + cs, cx0:cx0 + cs] = rc_u
            rec_v[cy0:cy0 + cs, cx0:cx0 + cs] = rc_v
            fld.set_cu(x0, y0, size, (mvx, mvy), 0)
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
                merge_idx=full(max(merge_idx, 0), np.int8),
                mvd=np.broadcast_to(np.array(mvd, np.int32),
                                    (units, units, 2)).copy(),
                mvp_idx=full(mvp_idx, np.int8),
            ))

    return PFramePlan(plans, (rec_y, rec_u, rec_v), fld, cbf_y_unit)
