"""TPU-native all-intra frame pipeline.

Replaces the reference's WPP thread wavefront (hmr_encoder_lib.c:2849-2987)
with a `lax.fori_loop` over block anti-diagonals: every block on a diagonal
(skew 2, exactly the WPP dependency pattern) is processed in parallel via
`vmap` across block rows, and each block evaluates all 35 intra modes as one
batched tensor op (prediction gathers + transform matmuls on the MXU).

The loop is closed (predictions come from reconstructed neighbors), so the
output levels/recon are exactly what a conformant decoder reproduces; the
stream equals the sequential golden encoder's bit-for-bit (tested).

Mode decision cost = SSD + lambda * (rough bit proxy), in integer fixed
point so the JAX and numpy paths tie-break identically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..ops import intra as intra_ops
from ..ops import quant as quant_ops
from ..ops import transforms as tx_ops

I32 = jnp.int32


def lambda_fx(qp: int) -> int:
    """Integer (x256) RD lambda, HM-style: 0.57 * 2^((qp-12)/3)."""
    return int(round(0.57 * 2.0 ** ((qp - 12) / 3.0) * 256))


def _encode_block_all_modes(orig, top, left, corner, has_left, has_top, *,
                            size, c_idx, qp, lam_fx, strong_smoothing,
                            sign_hiding=False, mode_set=None):
    """All-35-mode closed-loop encode of one block.

    Returns (levels (M,N,N), recon (M,N,N), cost (M,) int64) where M is 35,
    or len(mode_set) when a static candidate subset is given (rd_mode FAST:
    the T/Q/IQ/IT battery only runs over the subset; role of the
    reference's coarse loop1 candidate list, hmr_motion_intra.c:1076-1180).
    """
    log2 = size.bit_length() - 1
    refs = intra_ops.prepare_refs(top, left, corner, has_left, has_top,
                                  size=size, c_idx=c_idx,
                                  strong_smoothing=strong_smoothing)
    preds = intra_ops.predict_all_modes(*refs, size=size, c_idx=c_idx)
    md = np.arange(35)
    if mode_set is not None:
        md = np.asarray(mode_set)
        preds = preds[jnp.asarray(md)]
    resid = orig[None].astype(I32) - preds
    is_dst = (c_idx == 0 and size == 4)
    coeff = tx_ops.forward_transform(resid, is_dst=is_dst)
    levels = quant_ops.quantize(coeff, qp, log2, is_intra=True)
    if sign_hiding:
        if log2 == 2 or (log2 == 3 and c_idx == 0):
            # mode-dependent scan (7.4.9.11): SBH parity groups live in the
            # TB's actual scan order — compute all three, select per mode.
            lv_d = quant_ops.sign_bit_hiding(levels, coeff, qp, log2, scan_idx=0)
            lv_h = quant_ops.sign_bit_hiding(levels, coeff, qp, log2, scan_idx=1)
            lv_v = quant_ops.sign_bit_hiding(levels, coeff, qp, log2, scan_idx=2)
            ver = jnp.asarray((md >= 6) & (md <= 14))[:, None, None]
            hor = jnp.asarray((md >= 22) & (md <= 30))[:, None, None]
            levels = jnp.where(ver, lv_v, jnp.where(hor, lv_h, lv_d))
        else:
            levels = quant_ops.sign_bit_hiding(levels, coeff, qp, log2)
    deq = quant_ops.dequantize(levels, qp, log2)
    r = tx_ops.inverse_transform(deq, is_dst=is_dst)
    any_nz = jnp.any(levels != 0, axis=(-1, -2))
    r = jnp.where(any_nz[:, None, None], r, 0)
    recon = jnp.clip(preds + r, 0, 255)
    diff = orig[None].astype(I32) - recon
    ssd = jnp.sum(diff * diff, axis=(-1, -2))          # <= 64*64*255^2 < 2^31
    bits = jnp.minimum(tables.level_bits_est(levels, xp=jnp), 16383)
    # int32-safe fixed-point cost (lam_fx = 256*lambda; split shift so the
    # product fits int32 even at QP51)
    cost = ssd + (((lam_fx >> 4) * bits) >> 4)
    return levels, recon.astype(I32), cost


def _child_refs(trow_vec, lcol, corner_p, rec, cx, cy, n, has_left, has_top,
                x0, W, top_limit=None):
    """Reference samples for a child block at CTU-local (cx, cy) of size n.

    trow_vec: (W,) bottom row of the CTU row above (full width);
    lcol: (parent,) right column of the left CTU; rec: accumulated child
    reconstructions (parent, parent). Suffix-unavailable regions replicate
    the last available sample via clipped gathers — identical to the spec
    8.4.4.2.2 substitution result.
    """
    ar = jnp.arange(2 * n)
    if cy == 0:
        lim = (W - 1) if top_limit is None else top_limit
        top = trow_vec[jnp.clip(x0 + cx + ar, 0, lim)]
        h_top = has_top
    else:
        top = rec[cy - 1, jnp.clip(cx + ar, 0, rec.shape[1] - 1)]
        h_top = True
    if cx == 0:
        left = lcol[jnp.clip(cy + ar, 0, lcol.shape[0] - 1)]
        h_left = has_left
    else:
        left = rec[jnp.clip(cy + ar, 0, cy + n - 1), cx - 1]
        h_left = True
    if cx == 0 and cy == 0:
        corner = corner_p
    elif cy == 0:
        corner = trow_vec[jnp.clip(x0 + cx - 1, 0, W - 1)]
    elif cx == 0:
        corner = lcol[cy - 1]
    else:
        corner = rec[cy - 1, cx - 1]
    return (top.astype(I32), left.astype(I32), jnp.asarray(corner, I32),
            h_left, h_top)


# z-order child offsets within a split CU.
_Z_CHILDREN = ((0, 0), (1, 0), (0, 1), (1, 1))    # (cx_half, cy_half)


def _child_aux(trow_vec, lcol_vec, rec, cx, cy, h, x0, top_limit, n_parent):
    """(trow_c, lcol_c, x0_c, lim_c) ref materials for a child's own
    descendants (same construction as the CTU-64 lane, incl. the band
    clip that replicates rows belonging to later z-order siblings)."""
    if cy == 0:
        trow_c, x0_c, lim_c = trow_vec, x0 + cx, top_limit
    else:
        trow_c, x0_c, lim_c = rec[cy - 1], cx, None
    ar = jnp.arange(n_parent)
    if cx == 0:
        lcol_c = lcol_vec[jnp.clip(cy + ar, 0, lcol_vec.shape[0] - 1)]
    else:
        lcol_c = rec[jnp.clip(cy + ar, 0, cy + h - 1), cx - 1]
    return trow_c, lcol_c, x0_c, lim_c


def _search_unit(o, refs, aux, *, size, min_size, c_idx, qp, lam_fx,
                 strong_smoothing, sign_hiding, mode_set=None):
    """RD-search one luma CU: whole (all 35 modes, or the rd_mode FAST
    subset) vs the 4 half-size children (recursively), by integer cost.
    Returns (lev, rec, mode_units, depth_units, cost)."""
    top, left, corner, hl, ht = refs
    trow_vec, lcol_vec, x0, top_limit, W = aux
    lv35, rc35, cost = _encode_block_all_modes(
        o, top, left, corner, hl, ht, size=size, c_idx=c_idx, qp=qp,
        lam_fx=lam_fx, strong_smoothing=strong_smoothing and size == 32,
        sign_hiding=sign_hiding, mode_set=mode_set)
    mi = jnp.argmin(cost).astype(I32)
    m = (mi if mode_set is None
         else jnp.asarray(np.asarray(mode_set, np.int32))[mi])
    lev, rec, cost_w = lv35[mi], rc35[mi], cost[mi]
    un = size // 4
    mode_u = jnp.full((un, un), m, I32)
    depth_u = jnp.zeros((un, un), I32)
    if size <= min_size:
        return lev, rec, mode_u, depth_u, cost_w

    h = size // 2
    lev_s = jnp.zeros((size, size), I32)
    rec_s = jnp.zeros((size, size), I32)
    mode_s = jnp.zeros((un, un), I32)
    depth_s = jnp.zeros((un, un), I32)
    total = jnp.asarray(0, I32)        # costs < 2^28; 4x sum fits int32
    for (hx, hy) in _Z_CHILDREN:
        cx, cy = hx * h, hy * h
        refs_c = _child_refs(trow_vec, lcol_vec, corner, rec_s, cx, cy, h,
                             hl, ht, x0, W, top_limit)
        aux_c = _child_aux(trow_vec, lcol_vec, rec_s, cx, cy, h, x0,
                           top_limit, size)
        oc = jax.lax.dynamic_slice(o, (cy, cx), (h, h))
        lv_c, rc_c, mu_c, du_c, cost_c = _search_unit(
            oc, refs_c, aux_c + (W,), size=h, min_size=min_size,
            c_idx=c_idx, qp=qp, lam_fx=lam_fx,
            strong_smoothing=strong_smoothing, sign_hiding=sign_hiding,
            mode_set=mode_set)
        lev_s = jax.lax.dynamic_update_slice(lev_s, lv_c, (cy, cx))
        rec_s = jax.lax.dynamic_update_slice(rec_s, rc_c, (cy, cx))
        uy, ux = cy // 4, cx // 4
        mode_s = jax.lax.dynamic_update_slice(mode_s, mu_c, (uy, ux))
        depth_s = jax.lax.dynamic_update_slice(depth_s, du_c + 1, (uy, ux))
        total = total + cost_c
    total = total + (((lam_fx >> 4) * 14) >> 4)     # split overhead proxy
    split = total < cost_w
    return (jnp.where(split, lev_s, lev), jnp.where(split, rec_s, rec),
            jnp.where(split, mode_s, mode_u),
            jnp.where(split, depth_s, depth_u),
            jnp.where(split, total, cost_w))


def _encode_block_one_mode(orig, top, left, corner, has_left, has_top, m, *,
                           size, c_idx, qp, lam_fx, strong_smoothing,
                           sign_hiding):
    """Closed-loop encode of one block with a DECIDED (traced) mode m.

    The apply pass of the two-pass intra design: prediction still builds
    all 35 mode planes (cheap gathers) and picks m, but the transform /
    quant / SBH battery runs ONCE — 35x less work and HLO than the search
    battery, which lives in the batched open-loop pass (_open_loop_maps).
    Returns (levels (N,N), recon (N,N))."""
    log2 = size.bit_length() - 1
    refs = intra_ops.prepare_refs(top, left, corner, has_left, has_top,
                                  size=size, c_idx=c_idx,
                                  strong_smoothing=strong_smoothing)
    pred = intra_ops.predict_one_mode(*refs, m, size=size, c_idx=c_idx)
    resid = (orig.astype(I32) - pred)[None]
    is_dst = (c_idx == 0 and size == 4)
    coeff = tx_ops.forward_transform(resid, is_dst=is_dst)
    levels = quant_ops.quantize(coeff, qp, log2, is_intra=True)
    if sign_hiding:
        if log2 == 2 or (log2 == 3 and c_idx == 0):
            lv_d = quant_ops.sign_bit_hiding(levels, coeff, qp, log2,
                                             scan_idx=0)
            lv_h = quant_ops.sign_bit_hiding(levels, coeff, qp, log2,
                                             scan_idx=1)
            lv_v = quant_ops.sign_bit_hiding(levels, coeff, qp, log2,
                                             scan_idx=2)
            ver = (m >= 6) & (m <= 14)
            hor = (m >= 22) & (m <= 30)
            levels = jnp.where(ver, lv_v, jnp.where(hor, lv_h, lv_d))
        else:
            levels = quant_ops.sign_bit_hiding(levels, coeff, qp, log2)
    deq = quant_ops.dequantize(levels, qp, log2)
    r = tx_ops.inverse_transform(deq, is_dst=is_dst)
    any_nz = jnp.any(levels != 0, axis=(-1, -2))
    r = jnp.where(any_nz[:, None, None], r, 0)
    recon = jnp.clip(pred[None] + r, 0, 255)
    return levels[0], recon[0].astype(I32)


def _follow_unit(o, refs, aux, f_mode, f_depth, *, size, depth, min_size,
                 c_idx, qp, lam_fx, sign_hiding, strong_smoothing=False,
                 f_part=None, f_trd=None):
    """CU following a DECIDED quadtree: split iff the co-located map depth
    exceeds `depth`; mode from the co-located map. Used for chroma (DM from
    luma) and, in the two-pass design, for luma applying the open-loop
    maps. f_mode/f_depth are unit-granular for this component; f_part
    (luma only) marks 8x8 leaves coded as PART_NxN — four z-order 4x4 PUs
    with per-PU modes and 4x4 DST luma TBs.

    f_trd marks leaf CUs whose TRANSFORM splits one level
    (split_transform_flag) while keeping the single PU/mode: the 4
    half-size TBs re-predict from in-CU recon at TB granularity — which is
    computationally IDENTICAL to a depth split whose children inherit the
    parent's mode, so it is applied by rewriting the followed maps (mode
    broadcast + forced child leaves) instead of a second encode battery
    (zero extra compile/runtime cost)."""
    top, left, corner, hl, ht = refs
    trow_vec, lcol_vec, x0, top_limit, W = aux
    m = f_mode[0, 0]
    lev, rec = _encode_block_one_mode(
        o, top, left, corner, hl, ht, m, size=size, c_idx=c_idx, qp=qp,
        lam_fx=lam_fx, strong_smoothing=strong_smoothing and size == 32,
        sign_hiding=sign_hiding)
    if size <= min_size:
        if f_part is not None and c_idx == 0 and size == 8:
            lev_n = jnp.zeros((8, 8), I32)
            rec_n = jnp.zeros((8, 8), I32)
            for (hx, hy) in _Z_CHILDREN:
                cx, cy = hx * 4, hy * 4
                t_c, l_c, co_c, hl_c, ht_c = _child_refs(
                    trow_vec, lcol_vec, corner, rec_n, cx, cy, 4, hl, ht,
                    x0, W, top_limit)
                oc = jax.lax.dynamic_slice(o, (cy, cx), (4, 4))
                lv_c, rc_c = _encode_block_one_mode(
                    oc, t_c, l_c, co_c, hl_c, ht_c, f_mode[hy, hx], size=4,
                    c_idx=0, qp=qp, lam_fx=lam_fx, strong_smoothing=False,
                    sign_hiding=sign_hiding)
                lev_n = jax.lax.dynamic_update_slice(lev_n, lv_c, (cy, cx))
                rec_n = jax.lax.dynamic_update_slice(rec_n, rc_c, (cy, cx))
            part = f_part[0, 0]
            if f_trd is not None:
                # TU-split of an 8x8 2Nx2N CU: same 4x4 z-order coding as
                # NxN but with the CU's single mode (f_mode is uniform)
                part = part | (f_trd[0, 0] > 0)
            lev = jnp.where(part, lev_n, lev)
            rec = jnp.where(part, rec_n, rec)
        return lev, rec

    h = size // 2
    split = f_depth[0, 0] > depth
    if f_trd is not None:
        # TU-split == depth split with the parent's mode inherited: rewrite
        # the followed maps (mode broadcast, children forced to leaves with
        # no NxN / further TU split) and reuse the child recursion below.
        tr_here = jnp.logical_and(jnp.logical_not(split), f_trd[0, 0] > 0)
        f_mode = jnp.where(tr_here, m, f_mode)
        f_depth = jnp.where(tr_here, depth + 1, f_depth)
        if f_part is not None:
            f_part = jnp.logical_and(f_part, jnp.logical_not(tr_here))
        f_trd = jnp.where(tr_here, 0, f_trd)
        split = jnp.logical_or(split, tr_here)
    lev_s = jnp.zeros((size, size), I32)
    rec_s = jnp.zeros((size, size), I32)
    for (hx, hy) in _Z_CHILDREN:
        cx, cy = hx * h, hy * h
        refs_c = _child_refs(trow_vec, lcol_vec, corner, rec_s, cx, cy, h,
                             hl, ht, x0, W, top_limit)
        aux_c = _child_aux(trow_vec, lcol_vec, rec_s, cx, cy, h, x0,
                           top_limit, size)
        oc = jax.lax.dynamic_slice(o, (cy, cx), (h, h))
        hu = h // 4
        fm_c = jax.lax.dynamic_slice(f_mode, (cy // 4, cx // 4), (hu, hu))
        fd_c = jax.lax.dynamic_slice(f_depth, (cy // 4, cx // 4), (hu, hu))
        fp_c = (None if f_part is None else
                jax.lax.dynamic_slice(f_part, (cy // 4, cx // 4), (hu, hu)))
        ft_c = (None if f_trd is None else
                jax.lax.dynamic_slice(f_trd, (cy // 4, cx // 4), (hu, hu)))
        lv_c, rc_c = _follow_unit(
            oc, refs_c, aux_c + (W,), fm_c, fd_c, size=h, depth=depth + 1,
            min_size=min_size, c_idx=c_idx, qp=qp, lam_fx=lam_fx,
            sign_hiding=sign_hiding, strong_smoothing=strong_smoothing,
            f_part=fp_c, f_trd=ft_c)
        lev_s = jax.lax.dynamic_update_slice(lev_s, lv_c, (cy, cx))
        rec_s = jax.lax.dynamic_update_slice(rec_s, rc_c, (cy, cx))
    return jnp.where(split, lev_s, lev), jnp.where(split, rec_s, rec)


# rd_mode FAST coarse candidate list: planar, DC, angular every 4th — the
# role of the reference's loop1 search rounds (hmr_motion_intra.c:1076-1080);
# a +-1/+-2 refinement around the angular winner follows.
_FAST_MODES = (0, 1, 2, 6, 10, 14, 18, 22, 26, 30, 34)


def _cost_one_mode(o, top, left, corner, hl, ht, m, *, size, qp, lam_fx,
                   strong_smoothing):
    """Open-loop RD cost of ONE traced luma mode (FAST refinement stage)."""
    lev, rec = _encode_block_one_mode(
        o, top, left, corner, hl, ht, m, size=size, c_idx=0, qp=qp,
        lam_fx=lam_fx, strong_smoothing=strong_smoothing,
        sign_hiding=False)
    diff = o.astype(I32) - rec
    ssd = jnp.sum(diff * diff)
    bits = jnp.minimum(tables.level_bits_est(lev, xp=jnp), 16383)
    return ssd + (((lam_fx >> 4) * bits) >> 4)


def _open_loop_maps(y_pad, *, B, qp, lam_fx, strong_smoothing, rd_mode=1,
                    tu_split=True):
    """Pass A of the two-pass intra quadtree: batched OPEN-LOOP 35-mode
    search + split decision over the whole frame, one dense pass per depth.

    References come from the ORIGINAL plane (HM-style rough mode decision),
    so every block of a depth is independent and the whole depth runs as
    one batched tensor op — no wavefront, no per-node recursion, and the
    compile cost is 3 batteries instead of 21 per lane (the round-1
    recursive unroll took tens of minutes of XLA time; this compiles in
    seconds). Pass B (_follow_unit over the wavefront) then applies the
    decided modes closed-loop, so the coded stream remains decoder-exact.

    rd_mode (reference enum HOMER_RD_MODES, homer_hevc_enc_api.h:60-64):
    1=RD_FULL all 35 modes; 2=RD_FAST coarse 11-mode battery + +-1/+-2
    angular refinement (hmr_motion_intra.c:1084-1180); 0=RD_DIST_ONLY
    decisions by distortion alone (lambda forced to 0 in the search).
    Returns (mode_u, depth_u) unit maps (uh, uw), depth 0 == B."""
    H, W = y_pad.shape
    orig = y_pad.astype(I32)
    if rd_mode == 0:
        lam_fx = jnp.zeros_like(jnp.asarray(lam_fx))
    sizes = [s for s in (4, 8, 16, 32) if s <= B]
    ov = ((lam_fx >> 4) * 14) >> 4
    best = {}
    for S in sizes:
        nby, nbx = H // S, W // S
        ar = jnp.arange(2 * S)
        rr = jnp.arange(nby, dtype=I32)
        cc = jnp.arange(nbx, dtype=I32)
        blocks = (orig.reshape(nby, S, nbx, S).transpose(0, 2, 1, 3))
        top = orig[jnp.maximum(rr * S - 1, 0)[:, None, None],
                   jnp.clip(cc[None, :, None] * S + ar[None, None], 0, W - 1)]
        left = orig[jnp.clip(rr[:, None, None] * S + ar[None, None], 0,
                             H - 1),
                    jnp.maximum(cc[None, :, None] * S - 1, 0)]
        corner = orig[jnp.maximum(rr * S - 1, 0)[:, None],
                      jnp.maximum(cc[None] * S - 1, 0)]
        hl = jnp.broadcast_to(cc[None] > 0, (nby, nbx))
        ht = jnp.broadcast_to(rr[:, None] > 0, (nby, nbx))

        def one(o, t, l, co, h_l, h_t, S=S):
            subset = _FAST_MODES if rd_mode == 2 else None
            _, _, cost = _encode_block_all_modes(
                o, t, l, co, h_l, h_t, size=S, c_idx=0, qp=qp,
                lam_fx=lam_fx,
                strong_smoothing=strong_smoothing and S == 32,
                sign_hiding=False, mode_set=subset)
            mi = jnp.argmin(cost).astype(I32)
            if subset is None:
                return mi, cost[mi].astype(I32), cost.astype(I32)
            m = jnp.asarray(np.asarray(subset, np.int32))[mi]
            bc = cost[mi].astype(I32)
            # refine the angular winner +-1/+-2 (planar/DC winners re-eval
            # clipped duplicates — wasted work but branch-free)
            for dm in (-2, -1, 1, 2):
                mm = jnp.clip(m + dm, 2, 34)
                mm = jnp.where(m >= 2, mm, m)
                c1 = _cost_one_mode(
                    o, t, l, co, h_l, h_t, mm, size=S, qp=qp, lam_fx=lam_fx,
                    strong_smoothing=strong_smoothing and S == 32).astype(I32)
                take = c1 < bc
                m = jnp.where(take, mm, m)
                bc = jnp.where(take, c1, bc)
            return m, bc, cost.astype(I32)

        # one block row per map step bounds the 35-mode battery's live set
        modes, cost, costv = jax.lax.map(
            lambda args: jax.vmap(one)(*args),
            (blocks, top, left, corner, hl, ht))
        best[S] = (modes, cost, costv)     # (nby, nbx)[, (nby, nbx, M)]

    def sum4(a):
        py, px = a.shape
        return a.reshape(py // 2, 2, px // 2, 2).sum(axis=(1, 3))

    def upu(a, S):
        k = S // 4
        return jnp.repeat(jnp.repeat(a, k, 0), k, 1)

    # Intra transform-depth RDO (role of the reference's residual-quadtree
    # loop in encode_intra_luma, hmr_motion_intra.c:1229-1632): a CU may
    # keep its single PU/mode but split the TRANSFORM to four half-size
    # TBs (split_transform_flag). Pass-A cost of "CU at S, mode m, TU
    # split" = the sum of its four S/2 child batteries at that SAME mode —
    # the per-mode cost vectors are already computed per depth.
    mlist = jnp.asarray(np.asarray(
        _FAST_MODES if rd_mode == 2 else np.arange(35), np.int32))
    tsov = ((lam_fx >> 4) * 8) >> 4     # split flag + extra cbf bins proxy

    def sum4v(a):
        py, px, M = a.shape
        return a.reshape(py // 2, 2, px // 2, 2, M).sum(axis=(1, 3))

    def tu_opt(vchild):
        """Best same-mode TU-split cost per parent: (cost, mode)."""
        s = sum4v(vchild)
        i = jnp.argmin(s, axis=-1)
        c = jnp.take_along_axis(s, i[..., None], -1)[..., 0] + tsov
        return c, mlist[i]

    m8, c8, v8 = best[8]
    m16, c16, v16 = best[16]
    m4, c4, v4 = best[4]
    if tu_split:
        ts8c, ts8m = tu_opt(v4)         # 8x8 CU -> four DST 4x4 TBs
        trd8 = ts8c < c8
        c8 = jnp.where(trd8, ts8c, c8)
        m8 = jnp.where(trd8, ts8m, m8)
        ts16c, ts16m = tu_opt(v8)       # 16x16 CU -> four 8x8 TBs
        trd16 = ts16c < c16
        c16 = jnp.where(trd16, ts16c, c16)
        m16 = jnp.where(trd16, ts16m, m16)
    else:
        trd8 = jnp.zeros_like(c8, bool)
        trd16 = jnp.zeros_like(c16, bool)
    # NxN at the 8x8 leaf: four 4x4 PUs (extra part bin + 3 mode signals)
    # vs one 2Nx2N — role of the reference's PART_SIZE_NxN intra search
    # (hmr_motion_intra.c:1759-1990). 4x4 luma TBs bring the DST into play.
    c4s = sum4(c4) + (((lam_fx >> 4) * 20) >> 4)
    part8 = c4s < c8
    c8e = jnp.where(part8, c4s, c8)
    c8s = sum4(c8e) + ov
    split16 = c8s < c16
    c16e = jnp.where(split16, c8s, c16)
    if 32 in best:
        m32, c32, _ = best[32]
        if tu_split:
            ts32c, ts32m = tu_opt(v16)  # 32x32 CU -> four 16x16 TBs
            trd32 = ts32c < c32
            c32 = jnp.where(trd32, ts32c, c32)
            m32 = jnp.where(trd32, ts32m, m32)
        else:
            trd32 = jnp.zeros_like(c32, bool)
        c16s = sum4(c16e) + ov
        split32 = c16s < c32
        mm32, mm16 = upu(split32, 32), upu(split16, 16)
        depth_u = jnp.where(~mm32, 0, jnp.where(~mm16, 1, 2))
        mode_u = jnp.where(~mm32, upu(m32, 32),
                           jnp.where(~mm16, upu(m16, 16), upu(m8, 8)))
        part_u = mm32 & mm16 & upu(part8, 8)
        trd_u = jnp.where(~mm32, upu(trd32, 32),
                          jnp.where(~mm16, upu(trd16, 16),
                                    upu(trd8 & ~part8, 8)))
    else:
        mm16 = upu(split16, 16)
        depth_u = jnp.where(mm16, 1, 0).astype(I32)
        mode_u = jnp.where(mm16, upu(m8, 8), upu(m16, 16))
        part_u = mm16 & upu(part8, 8)
        trd_u = jnp.where(mm16, upu(trd8 & ~part8, 8), upu(trd16, 16))
    mode_u = jnp.where(part_u, m4, mode_u)          # per-4x4-PU modes
    return (mode_u.astype(I32), depth_u.astype(I32), part_u,
            trd_u.astype(I32))


def intra_wire_cap(H: int, W: int) -> int:
    """Compacted I-frame coefficient capacity: intra codes far more 4x4
    sub-blocks than inter — budget half of all of them (overflow falls
    back to the dense fetch, counted by the caller)."""
    return ((H // 4) * (W // 4) * 3 // 2) // 2


def pack_intra_wire(lev_yp, lev_up, lev_vp, mode_u, depth_u, part_u, trd_u):
    """Compact I-frame wire: packed unit maps + nonzero 4x4 coefficient
    sub-blocks in int16 (intra levels overflow int8 too often for the P
    wire's escape trick to pay). Cuts the per-I-frame fetch ~6x — the
    tunnel's bandwidth dips make the dense (H, W) int32 planes the
    dominant all-intra cost. Layout: [cnt, units16 (2/int32), idx, vals]."""
    from .p_chunk import _to4
    H, W = lev_yp.shape
    L4 = (H // 4) * (W // 4) * 3 // 2
    cap = intra_wire_cap(H, W)
    lv4 = jnp.concatenate([_to4(lev_yp), _to4(lev_up), _to4(lev_vp)])
    nzm = jnp.any(lv4 != 0, axis=1)
    cnt = jnp.sum(nzm.astype(I32))
    (idx,) = jnp.nonzero(nzm, size=cap, fill_value=L4)
    vals = jnp.take(lv4, jnp.minimum(idx, L4 - 1), axis=0)
    vals = jnp.where((idx < L4)[:, None], vals, 0)
    vals32 = jax.lax.bitcast_convert_type(
        vals.reshape(cap, 8, 2), I32).reshape(cap, 8)
    units = (mode_u.astype(I32) & 63) | (depth_u.astype(I32) << 6) \
        | (part_u.astype(I32) << 8) | (trd_u.astype(I32) << 9)
    u16 = units.reshape(-1).astype(jnp.int16)
    u32 = jax.lax.bitcast_convert_type(u16.reshape(-1, 2), I32)
    return jnp.concatenate([cnt.reshape(1), u32.reshape(-1),
                            idx.astype(I32), vals32.reshape(-1)])


def unpack_intra_wire(wire, H: int, W: int):
    """Host inverse of pack_intra_wire. Returns (cnt, mode_u, depth_u,
    part_u, trd_u, idx, vals) — vals (cap, 16) int16."""
    import numpy as np
    cap = intra_wire_cap(H, W)
    nu = (H // 4) * (W // 4)
    o = 0
    cnt = int(wire[0]); o = 1
    u16 = np.ascontiguousarray(wire[o:o + nu // 2]).view(np.int16)
    o += nu // 2
    units = u16.astype(np.int32).reshape(H // 4, W // 4)
    idx = wire[o:o + cap]; o += cap
    vals = np.ascontiguousarray(wire[o:o + cap * 8]).view(
        np.int16).reshape(cap, 16)
    return (cnt, (units & 63), (units >> 6) & 3,
            ((units >> 8) & 1), ((units >> 9) & 1), idx, vals)


def _lane_fn(r, d, planes, state, *, B, nbx, W, qp, qp_c, lam, lam_c,
             strong_smoothing, sign_hiding=False, split_rdo=False,
             ctu64=False, maps=None, rd_mode=1, tu_split=False):
    """Process block (r, c=d-2r) of the diagonal (one vmap lane): one
    B-sized container. With split_rdo, `maps` carries the open-loop
    (mode_u, depth_u) frame maps and the lane APPLIES them closed-loop
    (_follow_unit); without, the closed-loop 35-mode search runs at CU=B
    (golden-twinned)."""
    y_pad, u_pad, v_pad = planes
    bot_y, right_y, bot_u, right_u, bot_v, right_v = state
    B2 = B // 2
    W2 = W // 2

    c = d - 2 * r
    valid = (c >= 0) & (c < nbx)
    cc = jnp.clip(c, 0, nbx - 1)
    has_top = r > 0
    has_left = cc > 0
    # CTU-64 container: the decoder walks 64-CTUs with 32-CUs in z-order, so
    # the bottom-right 32-block of each 64-CTU has NO top-right neighbor
    # (spec 6.4.1 z-scan availability); clip-replication == substitution.
    if ctu64:
        tr_ok = jnp.logical_or(r % 2 == 0, cc % 2 == 0)
    else:
        tr_ok = jnp.asarray(True)
    rm1 = jnp.maximum(r - 1, 0)

    def refs_for(bot, right, x0, n, w):
        trow = bot[rm1]                       # (w,)
        lim = jnp.where(tr_ok, w - 1, x0 + n - 1)
        xs = jnp.clip(x0 + jnp.arange(2 * n), 0, lim)
        top = trow[xs]
        lcol = right[r]                       # (n,)
        left = jnp.concatenate([lcol, jnp.full((n,), 1, lcol.dtype) * lcol[n - 1]])
        corner = trow[jnp.clip(x0 - 1, 0, w - 1)]
        return (top.astype(I32), left.astype(I32), corner.astype(I32),
                trow, lcol.astype(I32), lim)

    # ---- luma CU quadtree ----
    x0 = cc * B
    orig = jax.lax.dynamic_slice(y_pad, (r * B, x0), (B, B))
    top, left, corner, trow_y, lcol_y, lim_y = refs_for(bot_y, right_y, x0,
                                                        B, W)
    if split_rdo:
        Bu = B // 4
        mode_u = jax.lax.dynamic_slice(maps[0], (r * Bu, cc * Bu), (Bu, Bu))
        depth_u = jax.lax.dynamic_slice(maps[1], (r * Bu, cc * Bu), (Bu, Bu))
        part_u = jax.lax.dynamic_slice(maps[2], (r * Bu, cc * Bu), (Bu, Bu))
        trd_u = jax.lax.dynamic_slice(maps[3], (r * Bu, cc * Bu), (Bu, Bu))
        lev_y, rec_y = _follow_unit(
            orig.astype(I32), (top, left, corner, has_left, has_top),
            (trow_y, lcol_y, x0, lim_y, W), mode_u, depth_u, size=B,
            depth=0, min_size=8, c_idx=0, qp=qp, lam_fx=lam,
            sign_hiding=sign_hiding, strong_smoothing=strong_smoothing,
            f_part=part_u, f_trd=(trd_u if tu_split else None))
    else:
        lev_y, rec_y, mode_u, depth_u, _ = _search_unit(
            orig.astype(I32), (top, left, corner, has_left, has_top),
            (trow_y, lcol_y, x0, lim_y, W), size=B, min_size=B,
            c_idx=0, qp=qp,
            lam_fx=(jnp.zeros_like(lam) if rd_mode == 0 else lam),
            strong_smoothing=strong_smoothing,
            sign_hiding=sign_hiding,
            mode_set=(_FAST_MODES if rd_mode == 2 else None))
        part_u = jnp.zeros_like(depth_u, dtype=bool)
        trd_u = jnp.zeros_like(depth_u)

    # ---- chroma: follows the luma quadtree with derived modes ----
    cx0 = cc * B2
    f_mode = mode_u[::2, ::2]
    f_depth = depth_u[::2, ::2]
    f_trd_c = (trd_u[::2, ::2] if (split_rdo and tu_split) else None)

    def chroma(plane, bot, right, c_idx, qpc):
        o = jax.lax.dynamic_slice(plane, (r * B2, cx0), (B2, B2)).astype(I32)
        t, l, co, trow_c, lcol_c, lim_c = refs_for(bot, right, cx0, B2, W2)
        return _follow_unit(
            o, (t, l, co, has_left, has_top),
            (trow_c, lcol_c, cx0, lim_c, W2), f_mode, f_depth, size=B2,
            depth=0, min_size=(4 if split_rdo else B2), c_idx=c_idx, qp=qpc,
            lam_fx=lam_c, sign_hiding=sign_hiding, f_trd=f_trd_c)

    lev_u, rec_u = chroma(u_pad, bot_u, right_u, 1, qp_c)
    lev_v, rec_v = chroma(v_pad, bot_v, right_v, 2, qp_c)

    return dict(valid=valid, cc=cc, mode=mode_u[0, 0],
                mode_u=mode_u, depth_u=depth_u, part_u=part_u, trd_u=trd_u,
                lev_y=lev_y, rec_y=rec_y, lev_u=lev_u, rec_u=rec_u,
                lev_v=lev_v, rec_v=rec_v)


def _lane_fn64(r, d, planes, state, *, nbx, W, qp, qp_c, lam, lam_c,
               strong_smoothing, sign_hiding=False, split_rdo=False,
               maps=None, rd_mode=1, tu_split=False):
    """CTU-64 lane: one 64-CTU per step; its four 32-blocks run z-order
    sequentially (exact decoder availability, including the left CTU's BR
    samples feeding the TL block's below-left references). Each 32-block is
    a full CU quadtree search (32/16/8); chroma follows with derived
    modes."""
    y_pad, u_pad, v_pad = planes
    bot_y, right_y, bot_u, right_u, bot_v, right_v = state
    B, B2 = 64, 32

    c = d - 2 * r
    valid = (c >= 0) & (c < nbx)
    cc = jnp.clip(c, 0, nbx - 1)
    has_top = r > 0
    has_left = cc > 0
    rm1 = jnp.maximum(r - 1, 0)

    # ---- luma: 4 z-order 32-CU quadtrees ----
    trow = bot_y[rm1]
    lcol = right_y[r]                    # (64,)
    x064 = cc * B
    corner64 = trow[jnp.clip(x064 - 1, 0, W - 1)]
    orig = jax.lax.dynamic_slice(y_pad, (r * B, x064), (B, B)).astype(I32)
    rec = jnp.zeros((B, B), I32)
    lev = jnp.zeros((B, B), I32)
    mode_u = jnp.zeros((16, 16), I32)
    depth_u = jnp.zeros((16, 16), I32)
    part_u = jnp.zeros((16, 16), bool)
    trd_u64 = jnp.zeros((16, 16), I32)
    for (hx, hy) in _Z_CHILDREN:
        cx, cy = hx * 32, hy * 32
        refs_c = _child_refs(trow, lcol, corner64, rec, cx, cy, 32,
                             has_left, has_top, x064, W)
        aux_c = _child_aux(trow, lcol, rec, cx, cy, 32, x064, None, B)
        oc = jax.lax.dynamic_slice(orig, (cy, cx), (32, 32))
        if split_rdo:
            mu = jax.lax.dynamic_slice(maps[0], (r * 16 + cy // 4,
                                                 cc * 16 + cx // 4), (8, 8))
            du = jax.lax.dynamic_slice(maps[1], (r * 16 + cy // 4,
                                                 cc * 16 + cx // 4), (8, 8))
            pu = jax.lax.dynamic_slice(maps[2], (r * 16 + cy // 4,
                                                 cc * 16 + cx // 4), (8, 8))
            tu = jax.lax.dynamic_slice(maps[3], (r * 16 + cy // 4,
                                                 cc * 16 + cx // 4), (8, 8))
            lv, rc = _follow_unit(
                oc, refs_c, aux_c + (W,), mu, du, size=32, depth=0,
                min_size=8, c_idx=0, qp=qp, lam_fx=lam,
                sign_hiding=sign_hiding, strong_smoothing=strong_smoothing,
                f_part=pu, f_trd=(tu if tu_split else None))
            part_u = jax.lax.dynamic_update_slice(part_u, pu,
                                                  (cy // 4, cx // 4))
            trd_u64 = jax.lax.dynamic_update_slice(trd_u64, tu,
                                                   (cy // 4, cx // 4))
        else:
            lv, rc, mu, du, _ = _search_unit(
                oc, refs_c, aux_c + (W,), size=32, min_size=32, c_idx=0,
                qp=qp, lam_fx=(jnp.zeros_like(lam) if rd_mode == 0
                               else lam),
                strong_smoothing=strong_smoothing,
                sign_hiding=sign_hiding,
                mode_set=(_FAST_MODES if rd_mode == 2 else None))
        lev = jax.lax.dynamic_update_slice(lev, lv, (cy, cx))
        rec = jax.lax.dynamic_update_slice(rec, rc, (cy, cx))
        mode_u = jax.lax.dynamic_update_slice(mode_u, mu, (cy // 4, cx // 4))
        depth_u = jax.lax.dynamic_update_slice(depth_u, du, (cy // 4, cx // 4))
    lev_y, rec_y = lev, rec

    # ---- chroma: 4 z-order 16-containers following luma ----
    def chroma(plane, bot, right, c_idx, qpc):
        trow_c = bot[rm1]
        lcol_c = right[r]                # (32,)
        cx064 = cc * B2
        corner_c = trow_c[jnp.clip(cx064 - 1, 0, W // 2 - 1)]
        o64 = jax.lax.dynamic_slice(plane, (r * B2, cx064),
                                    (B2, B2)).astype(I32)
        recc = jnp.zeros((B2, B2), I32)
        levc = jnp.zeros((B2, B2), I32)
        for (hx, hy) in _Z_CHILDREN:
            cx, cy = hx * 16, hy * 16
            refs_c = _child_refs(trow_c, lcol_c, corner_c, recc, cx, cy, 16,
                                 has_left, has_top, cx064, W // 2)
            aux_c = _child_aux(trow_c, lcol_c, recc, cx, cy, 16, cx064,
                               None, B2)
            oc = jax.lax.dynamic_slice(o64, (cy, cx), (16, 16))
            fm = jax.lax.dynamic_slice(mode_u[::2, ::2], (cy // 4, cx // 4),
                                       (4, 4))
            fd = jax.lax.dynamic_slice(depth_u[::2, ::2], (cy // 4, cx // 4),
                                       (4, 4))
            ft = (jax.lax.dynamic_slice(trd_u64[::2, ::2],
                                        (cy // 4, cx // 4), (4, 4))
                  if (split_rdo and tu_split) else None)
            lv, rc = _follow_unit(
                oc, refs_c, aux_c + (W // 2,), fm, fd, size=16, depth=0,
                min_size=(4 if split_rdo else 16), c_idx=c_idx, qp=qpc,
                lam_fx=lam_c, sign_hiding=sign_hiding, f_trd=ft)
            levc = jax.lax.dynamic_update_slice(levc, lv, (cy, cx))
            recc = jax.lax.dynamic_update_slice(recc, rc, (cy, cx))
        return levc, recc

    lev_u, rec_u = chroma(u_pad, bot_u, right_u, 1, qp_c)
    lev_v, rec_v = chroma(v_pad, bot_v, right_v, 2, qp_c)

    return dict(valid=valid, cc=cc, mode_u=mode_u, depth_u=depth_u,
                part_u=part_u, trd_u=trd_u64,
                lev_y=lev_y, rec_y=rec_y, lev_u=lev_u, rec_u=rec_u,
                lev_v=lev_v, rec_v=rec_v)


@functools.partial(jax.jit, static_argnames=("B", "strong_smoothing",
                                             "sign_hiding", "split_rdo",
                                             "ctu64", "rd_mode", "tu_depth"))
def encode_frame_intra(y_pad, u_pad, v_pad, *, B: int, qp,
                       strong_smoothing: bool = True,
                       sign_hiding: bool = False,
                       split_rdo: bool = False,
                       ctu64: bool = False,
                       rd_mode: int = 1,
                       tu_depth: int = 0):
    """Encode one padded frame all-intra with CU = TU = B.

    qp may be a python int or traced scalar (rate control varies it per
    frame without recompiling). split_rdo enables the recursive CU quadtree
    down to 8x8 luma (4x4 chroma): every level evaluates all 35 modes
    closed-loop and splits when cheaper — the dense-per-depth evaluation +
    masked-select form of the reference's recursive mode decision
    (hmr_motion_intra.c:1759-1990). Returns dict of: modes (nby,nbx),
    frame-level mode/depth unit maps, levels + chroma, recon
    planes.
    """
    H, W = y_pad.shape
    nby, nbx = H // B, W // B
    B2 = B // 2
    qp = jnp.asarray(qp, I32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam_t = jnp.asarray(tables.LAMBDA_FX)
    lam = lam_t[qp]
    lam_c = lam_t[qp_c]

    planes = (y_pad.astype(I32), u_pad.astype(I32), v_pad.astype(I32))

    state0 = dict(
        bot_y=jnp.zeros((nby, W), I32), right_y=jnp.zeros((nby, B), I32),
        bot_u=jnp.zeros((nby, W // 2), I32), right_u=jnp.zeros((nby, B2), I32),
        bot_v=jnp.zeros((nby, W // 2), I32), right_v=jnp.zeros((nby, B2), I32),
        mode_u=jnp.zeros((nby, nbx, B // 4, B // 4), I32),
        depth_u=jnp.zeros((nby, nbx, B // 4, B // 4), I32),
        part_u=jnp.zeros((nby, nbx, B // 4, B // 4), bool),
        trd_u=jnp.zeros((nby, nbx, B // 4, B // 4), I32),
        lev_y=jnp.zeros((nby, nbx, B, B), I32),
        lev_u=jnp.zeros((nby, nbx, B2, B2), I32),
        lev_v=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_y=jnp.zeros((nby, nbx, B, B), I32),
        rec_u=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_v=jnp.zeros((nby, nbx, B2, B2), I32),
    )

    tu_on = bool(tu_depth) and split_rdo
    maps = (_open_loop_maps(y_pad, B=B, qp=qp, lam_fx=lam,
                            strong_smoothing=strong_smoothing,
                            rd_mode=rd_mode, tu_split=tu_on)
            if split_rdo else None)
    lane = functools.partial(
        _lane_fn, B=B, nbx=nbx, W=W, qp=qp, qp_c=qp_c, lam=lam, lam_c=lam_c,
        strong_smoothing=strong_smoothing, sign_hiding=sign_hiding,
        split_rdo=split_rdo, ctu64=ctu64, maps=maps, rd_mode=rd_mode,
        tu_split=tu_on)
    rs = jnp.arange(nby)

    def body(d, st):
        outs = jax.vmap(
            lambda r: lane(r, d,
                           planes,
                           (st["bot_y"], st["right_y"], st["bot_u"],
                            st["right_u"], st["bot_v"], st["right_v"])))(rs)
        v = outs["valid"]
        cc = outs["cc"]

        def scatter_blocks(arr, new):
            old = arr[rs, cc]
            return arr.at[rs, cc].set(jnp.where(v[:, None, None], new, old))

        def scatter_row(bot, new_bottom, x0s, n):
            cols = x0s[:, None] + jnp.arange(n)[None, :]
            old = bot[rs[:, None], cols]
            return bot.at[rs[:, None], cols].set(
                jnp.where(v[:, None], new_bottom, old))

        x0s = cc * B
        cx0s = cc * B2
        st = dict(st)
        for key in ("mode_u", "depth_u", "part_u", "trd_u", "lev_y", "rec_y",
                    "lev_u", "rec_u", "lev_v", "rec_v"):
            st[key] = scatter_blocks(st[key], outs[key])
        st["bot_y"] = scatter_row(st["bot_y"], outs["rec_y"][:, -1, :], x0s, B)
        st["bot_u"] = scatter_row(st["bot_u"], outs["rec_u"][:, -1, :], cx0s, B2)
        st["bot_v"] = scatter_row(st["bot_v"], outs["rec_v"][:, -1, :], cx0s, B2)
        st["right_y"] = jnp.where(v[:, None], outs["rec_y"][:, :, -1], st["right_y"])
        st["right_u"] = jnp.where(v[:, None], outs["rec_u"][:, :, -1], st["right_u"])
        st["right_v"] = jnp.where(v[:, None], outs["rec_v"][:, :, -1], st["right_v"])
        return st

    ndiag = nbx + 2 * (nby - 1)
    st = jax.lax.fori_loop(0, ndiag, body, state0)

    def blocks_to_plane(blocks, n):
        return blocks.transpose(0, 2, 1, 3).reshape(nby * n, nbx * n)

    out = dict(
        modes=st["mode_u"][:, :, 0, 0],
        mode_units=blocks_to_plane(st["mode_u"], B // 4),
        depth_units=blocks_to_plane(st["depth_u"], B // 4),
        part_units=blocks_to_plane(st["part_u"], B // 4),
        trd_units=blocks_to_plane(st["trd_u"], B // 4),
        lev_y=st["lev_y"], lev_u=st["lev_u"], lev_v=st["lev_v"],
        recon_y=blocks_to_plane(st["rec_y"], B).astype(jnp.uint8),
        recon_u=blocks_to_plane(st["rec_u"], B2).astype(jnp.uint8),
        recon_v=blocks_to_plane(st["rec_v"], B2).astype(jnp.uint8),
    )
    out["wire"] = pack_intra_wire(
        blocks_to_plane(st["lev_y"], B), blocks_to_plane(st["lev_u"], B2),
        blocks_to_plane(st["lev_v"], B2), out["mode_units"],
        out["depth_units"], out["part_units"], out["trd_units"])
    return out


@functools.partial(jax.jit, static_argnames=("strong_smoothing",
                                             "sign_hiding", "split_rdo",
                                             "rd_mode", "tu_depth"))
def encode_frame_intra_ctu64(y_pad, u_pad, v_pad, *, qp,
                             strong_smoothing: bool = True,
                             sign_hiding: bool = False,
                             split_rdo: bool = False,
                             rd_mode: int = 1,
                             tu_depth: int = 0):
    """All-intra frame with 64-CTUs: wavefront over 64-CTU anti-diagonals,
    z-order 32-blocks inside each lane, each RD-searched as a CU quadtree
    down to 8 (split_rdo). Returns frame-level mode/depth unit maps."""
    H, W = y_pad.shape
    B, B2 = 64, 32
    nby, nbx = H // B, W // B
    qp = jnp.asarray(qp, I32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam_t = jnp.asarray(tables.LAMBDA_FX)
    lam = lam_t[qp]
    lam_c = lam_t[qp_c]

    planes = (y_pad.astype(I32), u_pad.astype(I32), v_pad.astype(I32))
    state0 = dict(
        bot_y=jnp.zeros((nby, W), I32), right_y=jnp.zeros((nby, B), I32),
        bot_u=jnp.zeros((nby, W // 2), I32), right_u=jnp.zeros((nby, B2), I32),
        bot_v=jnp.zeros((nby, W // 2), I32), right_v=jnp.zeros((nby, B2), I32),
        mode_u=jnp.zeros((nby, nbx, 16, 16), I32),
        depth_u=jnp.zeros((nby, nbx, 16, 16), I32),
        part_u=jnp.zeros((nby, nbx, 16, 16), bool),
        trd_u=jnp.zeros((nby, nbx, 16, 16), I32),
        lev_y=jnp.zeros((nby, nbx, B, B), I32),
        lev_u=jnp.zeros((nby, nbx, B2, B2), I32),
        lev_v=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_y=jnp.zeros((nby, nbx, B, B), I32),
        rec_u=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_v=jnp.zeros((nby, nbx, B2, B2), I32),
    )
    tu_on = bool(tu_depth) and split_rdo
    maps = (_open_loop_maps(y_pad, B=32, qp=qp, lam_fx=lam,
                            strong_smoothing=strong_smoothing,
                            rd_mode=rd_mode, tu_split=tu_on)
            if split_rdo else None)
    lane = functools.partial(
        _lane_fn64, nbx=nbx, W=W, qp=qp, qp_c=qp_c, lam=lam, lam_c=lam_c,
        strong_smoothing=strong_smoothing, sign_hiding=sign_hiding,
        split_rdo=split_rdo, maps=maps, rd_mode=rd_mode, tu_split=tu_on)
    rs = jnp.arange(nby)

    def body(d, st):
        outs = jax.vmap(
            lambda r: lane(r, d, planes,
                           (st["bot_y"], st["right_y"], st["bot_u"],
                            st["right_u"], st["bot_v"], st["right_v"])))(rs)
        v = outs["valid"]
        cc = outs["cc"]

        def scatter_blocks(arr, new):
            old = arr[rs, cc]
            return arr.at[rs, cc].set(jnp.where(v[:, None, None], new, old))

        def scatter_row(bot, new_bottom, x0s, n):
            cols = x0s[:, None] + jnp.arange(n)[None, :]
            old = bot[rs[:, None], cols]
            return bot.at[rs[:, None], cols].set(
                jnp.where(v[:, None], new_bottom, old))

        st = dict(st)
        for key in ("mode_u", "depth_u", "part_u", "trd_u", "lev_y", "rec_y",
                    "lev_u", "rec_u", "lev_v", "rec_v"):
            st[key] = scatter_blocks(st[key], outs[key])
        st["bot_y"] = scatter_row(st["bot_y"], outs["rec_y"][:, -1, :],
                                  cc * B, B)
        st["bot_u"] = scatter_row(st["bot_u"], outs["rec_u"][:, -1, :],
                                  cc * B2, B2)
        st["bot_v"] = scatter_row(st["bot_v"], outs["rec_v"][:, -1, :],
                                  cc * B2, B2)
        st["right_y"] = jnp.where(v[:, None], outs["rec_y"][:, :, -1],
                                  st["right_y"])
        st["right_u"] = jnp.where(v[:, None], outs["rec_u"][:, :, -1],
                                  st["right_u"])
        st["right_v"] = jnp.where(v[:, None], outs["rec_v"][:, :, -1],
                                  st["right_v"])
        return st

    ndiag = nbx + 2 * (nby - 1)
    st = jax.lax.fori_loop(0, ndiag, body, state0)

    def blocks_to_plane(blocks, n):
        return blocks.transpose(0, 2, 1, 3).reshape(nby * n, nbx * n)

    out = dict(
        mode_units=blocks_to_plane(st["mode_u"], 16),
        depth_units=blocks_to_plane(st["depth_u"], 16),
        part_units=blocks_to_plane(st["part_u"], 16),
        trd_units=blocks_to_plane(st["trd_u"], 16),
        lev_y=st["lev_y"], lev_u=st["lev_u"], lev_v=st["lev_v"],
        recon_y=blocks_to_plane(st["rec_y"], B).astype(jnp.uint8),
        recon_u=blocks_to_plane(st["rec_u"], B2).astype(jnp.uint8),
        recon_v=blocks_to_plane(st["rec_v"], B2).astype(jnp.uint8),
    )
    out["wire"] = pack_intra_wire(
        blocks_to_plane(st["lev_y"], B), blocks_to_plane(st["lev_u"], B2),
        blocks_to_plane(st["lev_v"], B2), out["mode_units"],
        out["depth_units"], out["part_units"], out["trd_units"])
    return out
