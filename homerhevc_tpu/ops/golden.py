"""Bit-exact numpy reference ops: intra prediction, transforms, quant.

These implement the normative decoder-side processes of ITU-T H.265 (8.4
intra, 8.6 transform/dequant) plus the HM-convention forward transform and
quantiser. They are the correctness oracle for the JAX/Pallas device kernels
(ops/intra.py, ops/transforms.py, ops/quant.py) and are used directly by the
slow-but-exact encoder path in tests.

Reference-encoder parity: roles of hmr_motion_intra.c:189-530 (adi filter +
prediction generators), hmr_transform.c, hmr_quant.c.
"""

from __future__ import annotations

import numpy as np

from .. import tables

# --------------------------------------------------------------------------
# Intra reference sample handling (spec 8.4.4.2.2 / .3)
# --------------------------------------------------------------------------


def fill_reference_samples(size: int, top: np.ndarray, left: np.ndarray,
                           corner: int, avail_top: np.ndarray,
                           avail_left: np.ndarray, avail_corner: bool,
                           bit_depth: int = 8):
    """Substitution process (8.4.4.2.2).

    top:  (2*size,) samples p[x][-1], x = 0..2N-1
    left: (2*size,) samples p[-1][y], y = 0..2N-1
    avail_*: per-sample availability masks.
    Returns substituted (top, left, corner).
    """
    n2 = 2 * size
    if not avail_corner and not avail_top.any() and not avail_left.any():
        fill = 1 << (bit_depth - 1)
        return (np.full(n2, fill, np.int32), np.full(n2, fill, np.int32), fill)
    # Scan order: left bottom -> top, corner, top left -> right.
    vals = np.concatenate([left[::-1], [corner], top]).astype(np.int32)
    avail = np.concatenate([avail_left[::-1], [avail_corner], avail_top])
    # First sample: if unavailable, take the next available in order.
    if not avail[0]:
        first = np.argmax(avail)
        vals[0] = vals[first]
        avail = avail.copy()
        avail[0] = True
    for i in range(1, len(vals)):
        if not avail[i]:
            vals[i] = vals[i - 1]
    left_f = vals[:n2][::-1].copy()
    corner_f = int(vals[n2])
    top_f = vals[n2 + 1:].copy()
    return top_f, left_f, corner_f


def filter_reference_samples(size: int, top: np.ndarray, left: np.ndarray,
                             corner: int, mode: int, c_idx: int,
                             strong_intra_smoothing: bool,
                             bit_depth: int = 8):
    """Filtering process (8.4.4.2.3). Returns (top, left, corner) to use."""
    if c_idx != 0 or mode == tables.INTRA_PRED_ANGLE.size:  # chroma: never
        return top, left, corner
    if mode == 1 or size == 4:          # DC or 4x4: unfiltered
        return top, left, corner
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}.get(size, 10)
    if mode != 0 and min_dist <= thres:  # planar (0) always filtered
        return top, left, corner
    n2 = 2 * size
    if size == 32 and strong_intra_smoothing:
        b = 1 << (bit_depth - 5)
        cond_t = abs(corner + int(top[n2 - 1]) - 2 * int(top[size - 1])) < b
        cond_l = abs(corner + int(left[n2 - 1]) - 2 * int(left[size - 1])) < b
        if cond_t and cond_l:
            # spec: pF[x][-1] = ((63-x)*p[-1][-1] + (x+1)*p[63][-1] + 32) >> 6
            xs = np.arange(n2, dtype=np.int64)
            top_f = ((63 - xs) * corner + (xs + 1) * int(top[n2 - 1]) + 32) >> 6
            left_f = ((63 - xs) * corner + (xs + 1) * int(left[n2 - 1]) + 32) >> 6
            top_f[n2 - 1] = int(top[n2 - 1])
            left_f[n2 - 1] = int(left[n2 - 1])
            return top_f.astype(np.int32), left_f.astype(np.int32), corner
    # 3-tap [1 2 1] filter.
    vals = np.concatenate([left[::-1], [corner], top]).astype(np.int64)
    out = vals.copy()
    out[1:-1] = (vals[:-2] + 2 * vals[1:-1] + vals[2:] + 2) >> 2
    left_f = out[:n2][::-1].astype(np.int32)
    corner_f = int(out[n2])
    top_f = out[n2 + 1:].astype(np.int32)
    return top_f, left_f, corner_f


def predict_intra(size: int, mode: int, top: np.ndarray, left: np.ndarray,
                  corner: int, c_idx: int, bit_depth: int = 8) -> np.ndarray:
    """Intra sample prediction (spec 8.4.4.2.4-.6) for one (filtered) ref set.

    Returns (size, size) int32 prediction.
    """
    n = size
    top = top.astype(np.int64)
    left = left.astype(np.int64)
    x = np.arange(n)
    y = np.arange(n)
    xx, yy = np.meshgrid(x, y)          # [y][x]

    if mode == 0:  # PLANAR (8.4.4.2.4)
        log2 = n.bit_length() - 1
        pred = ((n - 1 - xx) * left[yy] + (xx + 1) * top[n]
                + (n - 1 - yy) * top[xx] + (yy + 1) * left[n] + n) >> (log2 + 1)
        return pred.astype(np.int32)

    if mode == 1:  # DC (8.4.4.2.5)
        dc = (int(top[:n].sum() + left[:n].sum()) + n) >> (n.bit_length())
        pred = np.full((n, n), dc, np.int64)
        if c_idx == 0 and n < 32:
            pred[0, :] = (top[:n] + 3 * dc + 2) >> 2
            pred[:, 0] = (left[:n] + 3 * dc + 2) >> 2
            pred[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
        return pred.astype(np.int32)

    # Angular (8.4.4.2.6).
    angle = int(tables.INTRA_PRED_ANGLE[mode])
    inv_angle = int(tables.INV_ANGLE[mode])
    if mode >= 18:
        main, side = top, left
    else:
        main, side = left, top
    # ref[] indexed -n..2n -> array offset n; one extra slot because the
    # p1 gather at fact==0 reads ref[x+idx+2] with weight 0.
    ref = np.zeros(3 * n + 2, np.int64)
    ref[n:3 * n + 1] = np.concatenate([[corner], main[:2 * n]])
    if angle < 0:
        if (n * angle) >> 5 < -1:
            lo = (n * angle) >> 5
            for i in range(-1, lo - 1, -1):
                ref[n + i] = side[((i * inv_angle + 128) >> 8) - 1] \
                    if ((i * inv_angle + 128) >> 8) - 1 >= 0 else corner
    # pred for the "vertical" orientation; transpose at the end if mode < 18.
    pos = (yy + 1) * angle
    idx = pos >> 5
    fact = pos & 31
    gather = xx + idx + 1 + n
    p0 = ref[gather]
    p1 = ref[gather + 1]
    pred = ((32 - fact) * p0 + fact * p1 + 16) >> 5

    if angle == 0 and c_idx == 0 and n < 32:
        # pure vertical/horizontal edge filter (spec 8.4.4.2.6 step filtering)
        col = np.clip(main[0] + ((side[:n] - corner) >> 1), 0,
                      (1 << bit_depth) - 1)
        pred[:, 0] = col
    if mode < 18:
        pred = pred.T
    return pred.astype(np.int32)


# --------------------------------------------------------------------------
# Transforms (HM forward schedule; spec 8.6.4 inverse)
# --------------------------------------------------------------------------

def _round_shift(v: np.ndarray, s: int) -> np.ndarray:
    return (v + (1 << (s - 1))) >> s


def forward_transform(residual: np.ndarray, is_dst: bool = False,
                      bit_depth: int = 8) -> np.ndarray:
    """HM two-stage integer forward transform. residual: (N, N) int."""
    n = residual.shape[-1]
    log2 = n.bit_length() - 1
    t = (tables.DST4 if is_dst else tables.dct_matrix(n)).astype(np.int64)
    s1, s2 = tables.fwd_transform_shifts(log2, bit_depth)
    x = residual.astype(np.int64)
    tmp = _round_shift(t @ x.T, s1)          # rows transformed; [hfreq][row]
    out = _round_shift(t @ tmp.T, s2)        # [vfreq][hfreq]
    return out.astype(np.int32)


def inverse_transform(coeff: np.ndarray, is_dst: bool = False,
                      bit_depth: int = 8) -> np.ndarray:
    """Spec 8.6.4 inverse with 16-bit intermediate clipping."""
    n = coeff.shape[-1]
    t = (tables.DST4 if is_dst else tables.dct_matrix(n)).astype(np.int64)
    s1, s2 = tables.inv_transform_shifts(bit_depth)
    c = coeff.astype(np.int64)
    tmp = np.clip(_round_shift(t.T @ c, s1), -32768, 32767)
    out = np.clip(_round_shift(tmp @ t, s2), -32768, 32767)
    return out.astype(np.int32)


# --------------------------------------------------------------------------
# Quantisation (HM forward; spec 8.6.3 dequant)
# --------------------------------------------------------------------------

def quantize(coeff: np.ndarray, qp: int, log2_size: int, *, is_intra: bool,
             bit_depth: int = 8) -> np.ndarray:
    tshift = tables.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = tables.QUANT_SHIFT + qp // 6 + tshift
    scale = int(tables.QUANT_SCALES[qp % 6])
    add = (171 if is_intra else 85) << (qbits - 9)
    c = coeff.astype(np.int64)
    level = (np.abs(c) * scale + add) >> qbits
    level = np.clip(level, 0, 32767)
    return (np.sign(c) * level).astype(np.int32)


def dequantize(level: np.ndarray, qp: int, log2_size: int,
               bit_depth: int = 8) -> np.ndarray:
    bd_shift = bit_depth + log2_size - 5
    scale = int(tables.INV_QUANT_SCALES[qp % 6]) << (qp // 6)
    c = level.astype(np.int64) * scale * 16
    c = (c + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(c, -32768, 32767).astype(np.int32)


def sign_bit_hiding(levels_in_scan: np.ndarray,
                    coeffs_in_scan: np.ndarray, qp: int, log2_size: int, *,
                    is_intra: bool, bit_depth: int = 8) -> np.ndarray:
    """Sign-data-hiding parity fix-up per 4x4 coefficient group.

    When SBH is on, the decoder infers the sign of the DC-most (first in
    scan order) significant coefficient of each group with gap > 3 from the
    parity of the absolute-level sum; the encoder must force that parity
    (role of hmr_quant.c:61-169). We change the MAGNITUDE of the level whose
    +/-1 change has the smallest quantisation-error increase, with
    constraints that keep the hidden-sign coefficient identity stable:
      * the first significant coeff must stay nonzero,
      * zero coeffs before `first` are never raised (would change `first`),
      * raising a zero past `last` is allowed but heavily penalised.
    Any parity-correct adjustment yields a conformant stream; the choice
    only affects distortion. Candidate order (j asc, +1 before -1) and
    strict-less selection are mirrored exactly by the JAX twin.

    levels_in_scan / coeffs_in_scan: flat arrays in scan order.
    Returns the adjusted levels.
    """
    tshift = tables.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = tables.QUANT_SHIFT + qp // 6 + tshift
    scale = int(tables.QUANT_SCALES[qp % 6])
    out = levels_in_scan.copy()
    for g in range(len(out) // 16):
        seg = out[g * 16:(g + 1) * 16]
        nz = np.nonzero(seg)[0]
        if len(nz) == 0:
            continue
        first, last = int(nz[0]), int(nz[-1])
        if last - first <= 3:
            continue
        sign = 1 if seg[first] < 0 else 0   # hidden sign = DC-most coeff
        if (int(np.abs(seg).sum()) & 1) == sign:
            continue
        cseg = coeffs_in_scan[g * 16:(g + 1) * 16].astype(np.int64)
        # Unrounded quantised magnitude, rescaled to 9-bit fixed point so the
        # error metric fits int32 (the JAX twin computes the identical value
        # without 64-bit support).
        exact9 = (np.abs(cseg) * scale) >> (qbits - 9)
        best_j, best_d, best_err = -1, 0, None
        for j in range(16):
            mag = abs(int(seg[j]))
            for d in (1, -1):
                new_mag = mag + d
                if new_mag < 0 or new_mag > 32767:
                    continue
                if j == first and new_mag == 0:
                    continue          # keep hidden-sign coeff nonzero
                if mag == 0:
                    if d < 0 or j < first:
                        continue
                    penalty = (1 << 26) if j > last else 0
                else:
                    penalty = 0
                err = abs((new_mag << 9) - int(exact9[j])) + penalty
                if best_err is None or err < best_err:
                    best_j, best_d, best_err = j, d, err
        if best_j >= 0:
            mag = abs(int(seg[best_j])) + best_d
            if seg[best_j] != 0:
                s = -1 if seg[best_j] < 0 else 1
            else:
                s = -1 if cseg[best_j] < 0 else 1
            out[g * 16 + best_j] = s * mag
    return out
