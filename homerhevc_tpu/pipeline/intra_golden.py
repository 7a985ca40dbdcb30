"""Sequential numpy intra-frame encoder — the deterministic oracle.

This is the single-device "deterministic mode" of SURVEY.md §4: a slow,
bit-exact closed-loop encoder used to validate the stream pipeline and to
cross-check the batched JAX device pipeline. Fixed CU=TU size (no quadtree
RDO yet); all 35 luma modes searched with SSD+bit cost; chroma uses the
derived (DM) mode.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import tables
from ..entropy.syntax import CtuPlan
from ..ops import golden


@dataclass
class FramePlan:
    ctu_plans: list
    recon: tuple          # (y, u, v) uint8 reconstructed planes


def _block_avail(x0, y0, size, pic_w, pic_h):
    """Availability masks for CU==CTU raster order (top row fully coded,
    left column coded, below-left never)."""
    avail_top = np.zeros(2 * size, bool)
    avail_left = np.zeros(2 * size, bool)
    if y0 > 0:
        xs = x0 + np.arange(2 * size)
        avail_top = xs < pic_w
    if x0 > 0:
        ys = y0 + np.arange(2 * size)
        avail_left = (ys < pic_h) & (np.arange(2 * size) < size)
    avail_corner = x0 > 0 and y0 > 0
    return avail_top, avail_left, avail_corner


def _gather_refs(rec, x0, y0, size):
    """Fetch raw (unsubstituted) neighbor samples from the recon plane."""
    h, w = rec.shape
    top = np.zeros(2 * size, np.int32)
    left = np.zeros(2 * size, np.int32)
    corner = 0
    if y0 > 0:
        xs = np.minimum(x0 + np.arange(2 * size), w - 1)
        top = rec[y0 - 1, xs].astype(np.int32)
    if x0 > 0:
        ys = np.minimum(y0 + np.arange(2 * size), h - 1)
        left = rec[ys, x0 - 1].astype(np.int32)
    if x0 > 0 and y0 > 0:
        corner = int(rec[y0 - 1, x0 - 1])
    return top, left, corner


def _apply_sbh(levels, coeff, qp, log2, is_intra, scan_idx=0):
    """SBH fix-up on one spatial TB in its ACTUAL scan order."""
    scan = tables.coeff_scan(log2, scan_idx)
    ls = levels.reshape(-1)[scan]
    cssc = coeff.reshape(-1)[scan]
    adj = golden.sign_bit_hiding(ls, cssc, qp, log2, is_intra=is_intra)
    out = np.zeros_like(levels).reshape(-1)
    out[scan] = adj
    return out.reshape(levels.shape)


def _encode_block(orig, rec, x0, y0, size, qp, mode, c_idx, *,
                  strong_smoothing=True, force_mode=None, sign_hiding=False):
    """Closed-loop encode of one TB: returns (levels, recon_block, ssd)."""
    log2 = size.bit_length() - 1
    pic_h, pic_w = rec.shape
    top, left, corner = _gather_refs(rec, x0, y0, size)
    at, al, ac = _block_avail(x0, y0, size, pic_w, pic_h)
    top, left, corner = golden.fill_reference_samples(
        size, top, left, corner, at, al, ac)
    ft, fl, fc = golden.filter_reference_samples(
        size, top, left, corner, mode, c_idx, strong_smoothing)
    pred = golden.predict_intra(size, mode, ft, fl, fc, c_idx)
    blk = orig[y0:y0 + size, x0:x0 + size].astype(np.int32)
    resid = blk - pred
    is_dst = (c_idx == 0 and size == 4)
    coeff = golden.forward_transform(resid, is_dst=is_dst)
    levels = golden.quantize(coeff, qp, log2, is_intra=True)
    if sign_hiding:
        levels = _apply_sbh(levels, coeff, qp, log2, True)
    if np.any(levels):
        deq = golden.dequantize(levels, qp, log2)
        r = golden.inverse_transform(deq, is_dst=is_dst)
    else:
        r = np.zeros_like(resid)
    recon = np.clip(pred + r, 0, 255)
    ssd = int(((blk - recon).astype(np.int64) ** 2).sum())
    return levels, recon.astype(np.uint8), ssd


def _mode_bits_estimate(mode, mpm_approx):
    # crude: MPM ~2 bits, non-MPM ~6 bits (used only for mode decision)
    return 2 if mode in mpm_approx else 6


def encode_intra_frame(y, u, v, *, qp: int, ctu_log2: int = 5,
                       strong_smoothing: bool = True,
                       sign_hiding: bool = False) -> FramePlan:
    """Encode one frame all-intra with CU = TU = CTU. Returns plans + recon.

    Picture dims must be multiples of the CTU size (caller pads; the SPS
    conformance window crops).
    """
    size = 1 << ctu_log2
    h, w = y.shape
    assert h % size == 0 and w % size == 0
    rec_y = np.zeros((h, w), np.uint8)
    rec_u = np.zeros((h // 2, w // 2), np.uint8)
    rec_v = np.zeros((h // 2, w // 2), np.uint8)
    qp_c = int(tables.chroma_qp_from_luma(qp))

    lam_fx = int(round(0.57 * 2.0 ** ((qp - 12) / 3.0) * 256))
    units = size // 4
    plans = []
    for y0 in range(0, h, size):
        for x0 in range(0, w, size):
            # luma mode decision: full closed-loop SSD + lambda*bits.
            # Integer fixed-point cost, identical to intra_jax for bit-exact
            # cross-validation of the two pipelines.
            best = None
            for mode in range(35):
                levels, recon, ssd = _encode_block(
                    y, rec_y, x0, y0, size, qp, mode, 0,
                    strong_smoothing=strong_smoothing,
                    sign_hiding=sign_hiding)
                bits = min(int(tables.level_bits_est(levels)), 16383)
                cost = ssd + (((lam_fx >> 4) * bits) >> 4)
                if best is None or cost < best[0]:
                    best = (cost, mode, levels, recon)
            _, mode, levels, recon = best
            rec_y[y0:y0 + size, x0:x0 + size] = recon

            # chroma: derived mode
            cx, cy = x0 // 2, y0 // 2
            csize = size // 2
            lev_cb, rec_cb, _ = _encode_block(u, rec_u, cx, cy, csize, qp_c,
                                              mode, 1, sign_hiding=sign_hiding)
            lev_cr, rec_cr, _ = _encode_block(v, rec_v, cx, cy, csize, qp_c,
                                              mode, 2, sign_hiding=sign_hiding)
            rec_u[cy:cy + csize, cx:cx + csize] = rec_cb
            rec_v[cy:cy + csize, cx:cx + csize] = rec_cr

            plans.append(CtuPlan(
                x0=x0, y0=y0,
                depth_map=np.zeros((units, units), np.int8),
                luma_mode=np.full((units, units), mode, np.int8),
                chroma_mode=np.full((units, units), mode, np.int8),
                part_nxn=np.zeros((units, units), bool),
                tr_depth_map=np.zeros((units, units), np.int8),
                coeff_y=levels,
                coeff_cb=lev_cb,
                coeff_cr=lev_cr,
            ))
    return FramePlan(plans, (rec_y, rec_u, rec_v))
