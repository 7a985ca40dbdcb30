"""JAX quantisation / dequantisation (HM forward; spec 8.6.3 inverse).

Equivalent of hmr_quant.c:172-258 — elementwise integer ops that XLA fuses
into the surrounding transform matmuls. `qp` may be a python int or a
traced scalar: all QP-dependent factors are gathers/shifts, so rate control
can vary QP per frame without recompiling the device step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import tables


def _bc(qp, x):
    """Broadcast a scalar or per-block qp against x (leading block axis)."""
    q = jnp.asarray(qp)
    if q.ndim == 0:
        return q
    return q.reshape(q.shape + (1,) * (x.ndim - q.ndim))


def quantize(coeff: jax.Array, qp, log2_size: int, *, is_intra: bool,
             bit_depth: int = 8) -> jax.Array:
    """qp may be a python int, a traced scalar, or a per-block array whose
    shape is a prefix of coeff's (per-CTU-row rate control)."""
    qp = _bc(qp, coeff)
    tshift = tables.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = tables.QUANT_SHIFT + qp // 6 + tshift
    scale = jnp.asarray(tables.QUANT_SCALES)[qp % 6]
    add = (171 if is_intra else 85) << (qbits - 9)
    # int32-exact: |coeff| <= 32767 and scale <= 26214 so the product plus
    # the deadzone add stays below 2^31 (int64 would silently truncate to
    # int32 under jax's default x64-off anyway)
    c = coeff.astype(jnp.int32)
    level = (jnp.abs(c) * scale + add) >> qbits
    level = jnp.clip(level, 0, 32767)
    return (jnp.sign(c) * level).astype(jnp.int32)


def sign_bit_hiding(levels: jax.Array, coeffs: jax.Array, qp,
                    log2_size: int, bit_depth: int = 8,
                    scan_idx: int = 0) -> jax.Array:
    """Batched JAX twin of golden.sign_bit_hiding for (..., N, N) blocks.

    scan_idx selects the coefficient scan (0 diag / 1 hor / 2 ver) — the
    sign-hiding groups and first/last positions are defined in the TB's
    ACTUAL scan order (4x4 and 8x8-luma intra TBs use mode-dependent scans).
    Same candidate order (j asc, +1 before -1) and strict-less selection as
    the golden loop, so both pick identical adjustments.
    """
    import numpy as np

    from .. import tables as t

    n = levels.shape[-1]
    log2 = n.bit_length() - 1
    assert log2 == log2_size
    scan = np.asarray(t.coeff_scan(log2_size, scan_idx))
    inv = np.zeros_like(scan)
    inv[scan] = np.arange(scan.size)

    tshift = t.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qp_a = jnp.asarray(qp)
    qbits = t.QUANT_SHIFT + qp_a // 6 + tshift
    scale = jnp.asarray(t.QUANT_SCALES)[qp_a % 6]

    lead = levels.shape[:-2]
    import math
    L = int(math.prod(lead)) if lead else 1
    G = (n * n) // 16

    # (pos, L) lane-major layout: the batch axis rides the 128 lanes; a
    # (..., G, 16) layout would pad the 16-wide trailing axis to 128 lanes
    # and inflate every elementwise op by 8x (measured 10 GB/frame -> this
    # form is what makes whole-frame SBH affordable on TPU).
    lv = levels.reshape(L, n * n).T                              # (nn, L)
    cv = coeffs.reshape(L, n * n).T
    ls = lv[scan, :].reshape(G, 16, L)
    cs = cv[scan, :].reshape(G, 16, L)
    # Pure elementwise + axis-1 reductions throughout: take_along_axis /
    # argmin / stack on the 16-wide middle axis lower to cross-sublane
    # gathers on TPU (measured 3.7 ms per call at 720p — ~60x the VPU
    # cost of the same math); one-hot selects and two-pass tie-break mins
    # express identical semantics as reductions (0.1 ms).
    mag = jnp.abs(ls)
    nz = ls != 0
    idx = jnp.arange(16, dtype=jnp.int32)[None, :, None]         # (1, 16, 1)
    BIGI = jnp.int32(99)
    first = jnp.min(jnp.where(nz, idx, BIGI), axis=1)            # (G, L)
    last = jnp.max(jnp.where(nz, idx, -1), axis=1)
    has = jnp.any(nz, axis=1)
    first_oh = idx == jnp.clip(first, 0, 15)[:, None, :]         # one-hot
    sign_flag = jnp.sum(jnp.where(first_oh, ls, 0), axis=1) < 0
    parity = (jnp.sum(mag, axis=1) & 1).astype(jnp.int32)
    need = has & (last - first > 3) & (parity != sign_flag.astype(jnp.int32))

    if qp_a.ndim:              # per-block qp: lanes are the flattened lead
        qL = jnp.broadcast_to(
            qp_a.reshape(qp_a.shape + (1,) * (len(lead) - qp_a.ndim)),
            lead).reshape(L)
        qbits = t.QUANT_SHIFT + qL // 6 + tshift          # (L,)
        scale = jnp.asarray(t.QUANT_SCALES)[qL % 6]
    exact9 = (jnp.abs(cs) * scale) >> (qbits - 9)                # (G, 16, L)
    BIG = jnp.int32(1 << 30)
    errs = []                                   # [+1, -1] candidate planes
    for d in (1, -1):
        new_mag = mag + d
        invalid = (new_mag < 0) | (new_mag > 32767)
        invalid |= (idx == first[:, None, :]) & (new_mag == 0)
        is_zero = mag == 0
        if d < 0:
            invalid |= is_zero
        else:
            invalid |= is_zero & (idx < first[:, None, :])
        penalty = jnp.where(is_zero & (idx > last[:, None, :]) & (d > 0),
                            1 << 26, 0)
        err = jnp.abs((new_mag << 9) - exact9) + penalty
        errs.append(jnp.where(invalid, BIG, err))
    err_p, err_m = errs
    # first minimum in (j asc, +1 before -1) candidate order: min err, then
    # min order among the ties (order = 2j for +1, 2j+1 for -1)
    m = jnp.minimum(jnp.min(err_p, axis=1), jnp.min(err_m, axis=1))
    BIGO = jnp.int32(99)
    ord_p = jnp.where(err_p == m[:, None, :], 2 * idx, BIGO)
    ord_m = jnp.where(err_m == m[:, None, :], 2 * idx + 1, BIGO)
    k_ord = jnp.minimum(jnp.min(ord_p, axis=1), jnp.min(ord_m, axis=1))
    bj = k_ord >> 1                                              # (G, L)
    valid = m < BIG
    bj_oh = idx == bj[:, None, :]
    sel_p = bj_oh & ((k_ord & 1) == 0)[:, None, :]
    sel_m = bj_oh & ((k_ord & 1) == 1)[:, None, :]
    new_mag_sel = (jnp.sum(jnp.where(sel_p, mag + 1, 0), axis=1)
                   + jnp.sum(jnp.where(sel_m, mag - 1, 0), axis=1))
    orig_sel = jnp.sum(jnp.where(bj_oh, ls, 0), axis=1)
    csel = jnp.sum(jnp.where(bj_oh, cs, 0), axis=1)
    s = jnp.where(orig_sel != 0, jnp.where(orig_sel < 0, -1, 1),
                  jnp.where(csel < 0, -1, 1))
    newval = s * new_mag_sel
    apply = ((need & valid)[:, None, :]) & bj_oh
    out_scan = jnp.where(apply, newval[:, None, :], ls)
    flat = out_scan.reshape(n * n, L)[inv, :]
    return flat.T.reshape(levels.shape)


def dequantize(level: jax.Array, qp, log2_size: int,
               bit_depth: int = 8) -> jax.Array:
    """Exact in int32: jnp int64 silently truncates to int32 with x64 off,
    and level*scale<<(qp//6) can exceed 2^31 — so the 2^(qp//6) factor is
    folded into the final shift instead ((t<<k)+R)>>S == (t + R>>k)>>(S-k)
    for k < S, == t<<(k-S) for k >= S; t = level*scale16 <= 32767*1152
    always fits int32."""
    qp = _bc(qp, level)
    bd_shift = bit_depth + log2_size - 5
    k = qp // 6
    t = level.astype(jnp.int32) * (jnp.asarray(tables.INV_QUANT_SCALES)[qp % 6] * 16)
    k_c = jnp.minimum(k, bd_shift - 1)
    lo = (t + (1 << (bd_shift - 1 - k_c))) >> (bd_shift - k_c)
    hi = t << jnp.maximum(k - bd_shift, 0)
    c = jnp.where(k < bd_shift, lo, hi)
    return jnp.clip(c, -32768, 32767).astype(jnp.int32)