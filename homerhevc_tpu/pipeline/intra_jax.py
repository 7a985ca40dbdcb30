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
                            sign_hiding=False):
    """All-35-mode closed-loop encode of one block.

    Returns (levels (35,N,N), recon (35,N,N), cost (35,) int64).
    """
    log2 = size.bit_length() - 1
    refs = intra_ops.prepare_refs(top, left, corner, has_left, has_top,
                                  size=size, c_idx=c_idx,
                                  strong_smoothing=strong_smoothing)
    preds = intra_ops.predict_all_modes(*refs, size=size, c_idx=c_idx)
    resid = orig[None].astype(I32) - preds
    is_dst = (c_idx == 0 and size == 4)
    coeff = tx_ops.forward_transform(resid, is_dst=is_dst)
    levels = quant_ops.quantize(coeff, qp, log2, is_intra=True)
    if sign_hiding:
        levels = quant_ops.sign_bit_hiding(levels, coeff, qp, log2)
    deq = quant_ops.dequantize(levels, qp, log2)
    r = tx_ops.inverse_transform(deq, is_dst=is_dst)
    any_nz = jnp.any(levels != 0, axis=(-1, -2))
    r = jnp.where(any_nz[:, None, None], r, 0)
    recon = jnp.clip(preds + r, 0, 255)
    diff = orig[None].astype(I32) - recon
    ssd = jnp.sum(diff * diff, axis=(-1, -2))          # <= 64*64*255^2 < 2^31
    nz = jnp.sum((levels != 0).astype(I32), axis=(-1, -2))
    bits = 6 + 4 * nz
    # int32-safe fixed-point cost (lam_fx = 256*lambda; split shift so the
    # product fits int32 even at QP51 with all coeffs nonzero)
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


def _encode_split(orig, trow_vec, lcol, corner_p, x0, W, *, B, c_idx, qp,
                  lam_fx, has_left, has_top, sign_hiding,
                  child_modes=None, top_limit=None):
    """Closed-loop z-order encode of the 4 half-size children of one block.

    child_modes: None -> each child searches all 35 modes; else (4,) fixed
    modes (chroma derived-mode case). Returns (modes(4,), lev (B,B),
    rec (B,B), total_cost).
    """
    h = B // 2
    lev = jnp.zeros((B, B), I32)
    rec = jnp.zeros((B, B), I32)
    modes = []
    total = jnp.asarray(0, jnp.int64)
    for k, (hx, hy) in enumerate(_Z_CHILDREN):
        cx, cy = hx * h, hy * h
        top, left, corner, hl, ht = _child_refs(
            trow_vec, lcol, corner_p, rec, cx, cy, h, has_left, has_top,
            x0, W, top_limit)
        o = jax.lax.dynamic_slice(orig, (cy, cx), (h, h))
        lv35, rc35, cost = _encode_block_all_modes(
            o, top, left, corner, hl, ht, size=h, c_idx=c_idx, qp=qp,
            lam_fx=lam_fx, strong_smoothing=False, sign_hiding=sign_hiding)
        if child_modes is None:
            m = jnp.argmin(cost).astype(I32)
        else:
            m = child_modes[k]
        modes.append(m)
        lev = jax.lax.dynamic_update_slice(lev, lv35[m], (cy, cx))
        rec = jax.lax.dynamic_update_slice(rec, rc35[m], (cy, cx))
        total = total + cost[m]
    return jnp.stack(modes), lev, rec, total


def _lane_fn(r, d, planes, state, *, B, nbx, W, qp, qp_c, lam, lam_c,
             strong_smoothing, sign_hiding=False, split_rdo=False,
             ctu64=False):
    """Process block (r, c=d-2r) of the diagonal (one vmap lane)."""
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

    def refs_for(bot, right, x0, n, w):
        rm1 = jnp.maximum(r - 1, 0)
        trow = bot[rm1]                       # (w,)
        lim = jnp.where(tr_ok, w - 1, x0 + n - 1)
        xs = jnp.clip(x0 + jnp.arange(2 * n), 0, lim)
        top = trow[xs]
        lcol = right[r]                       # (n,)
        left = jnp.concatenate([lcol, jnp.full((n,), 1, lcol.dtype) * lcol[n - 1]])
        corner = trow[jnp.clip(x0 - 1, 0, w - 1)]
        return top.astype(I32), left.astype(I32), corner.astype(I32)

    # ---- luma, CU = B (no split) ----
    x0 = cc * B
    orig = jax.lax.dynamic_slice(y_pad, (r * B, x0), (B, B))
    top, left, corner = refs_for(bot_y, right_y, x0, B, W)
    levels35, recon35, cost = _encode_block_all_modes(
        orig, top, left, corner, has_left, has_top,
        size=B, c_idx=0, qp=qp, lam_fx=lam,
        strong_smoothing=strong_smoothing, sign_hiding=sign_hiding)
    mode = jnp.argmin(cost).astype(I32)
    lev_y = levels35[mode]
    rec_y = recon35[mode]
    cost_whole = cost[mode]

    cx0 = cc * B2
    split = jnp.asarray(False)
    child_modes = jnp.full((4,), mode, I32)
    if split_rdo:
        # ---- luma split into 4 half-size CUs (z-order, closed loop) ----
        rm1 = jnp.maximum(r - 1, 0)
        trow_y = bot_y[rm1]
        lcol_y = right_y[r]
        lim_y = jnp.where(tr_ok, W - 1, x0 + B - 1)
        cmodes, lev_s, rec_s, cost_split = _encode_split(
            orig, trow_y, lcol_y, corner, x0, W, B=B, c_idx=0, qp=qp,
            lam_fx=lam, has_left=has_left, has_top=has_top,
            sign_hiding=sign_hiding, top_limit=lim_y)
        # split flag + 3 extra mode signalings, rough proxy
        cost_split = cost_split + (((lam >> 4) * 14) >> 4)
        split = cost_split < cost_whole
        lev_y = jnp.where(split, lev_s, lev_y)
        rec_y = jnp.where(split, rec_s, rec_y)
        child_modes = jnp.where(split, cmodes, child_modes)

    # ---- chroma (derived mode; split follows luma) ----
    def chroma(plane, bot, right, c_idx, qpc):
        o = jax.lax.dynamic_slice(plane, (r * B2, cx0), (B2, B2))
        t, l, co = refs_for(bot, right, cx0, B2, W2)
        lv35, rc35, _ = _encode_block_all_modes(
            o, t, l, co, has_left, has_top, size=B2, c_idx=c_idx, qp=qpc,
            lam_fx=lam_c, strong_smoothing=False, sign_hiding=sign_hiding)
        lv, rc = lv35[mode], rc35[mode]
        if split_rdo:
            rm1 = jnp.maximum(r - 1, 0)
            lim_c = jnp.where(tr_ok, W2 - 1, cx0 + B2 - 1)
            _, lv_s, rc_s, _ = _encode_split(
                o, bot[rm1], right[r], co, cx0, W2, B=B2, c_idx=c_idx,
                qp=qpc, lam_fx=lam_c, has_left=has_left, has_top=has_top,
                sign_hiding=sign_hiding, child_modes=child_modes,
                top_limit=lim_c)
            lv = jnp.where(split, lv_s, lv)
            rc = jnp.where(split, rc_s, rc)
        return lv, rc

    lev_u, rec_u = chroma(u_pad, bot_u, right_u, 1, qp_c)
    lev_v, rec_v = chroma(v_pad, bot_v, right_v, 2, qp_c)

    return dict(valid=valid, cc=cc, mode=mode, split=split,
                child_modes=child_modes,
                lev_y=lev_y, rec_y=rec_y, lev_u=lev_u, rec_u=rec_u,
                lev_v=lev_v, rec_v=rec_v)


def _lane_fn64(r, d, planes, state, *, nbx, W, qp, qp_c, lam, lam_c,
               strong_smoothing, sign_hiding=False, split_rdo=False):
    """CTU-64 lane: one 64-CTU per step; its four 32-blocks run z-order
    sequentially (exact decoder availability, including the left CTU's BR
    samples feeding the TL block's below-left references)."""
    y_pad, u_pad, v_pad = planes
    bot_y, right_y, bot_u, right_u, bot_v, right_v = state
    B, B2 = 64, 32

    c = d - 2 * r
    valid = (c >= 0) & (c < nbx)
    cc = jnp.clip(c, 0, nbx - 1)
    has_top = r > 0
    has_left = cc > 0
    x064 = cc * B
    cx064 = cc * B2
    rm1 = jnp.maximum(r - 1, 0)

    def encode_comp(plane, bot, right, csize, c_idx, qpq, lamq):
        """One component's 64-CTU (luma csize 32 children; chroma 16)."""
        n64 = 2 * csize                  # container size (64 luma, 32 chroma)
        trow = bot[rm1]
        lcol = right[r]                  # (n64,)
        x0 = (cc * n64)
        w = W if c_idx == 0 else W // 2
        corner64 = trow[jnp.clip(x0 - 1, 0, w - 1)]
        orig = jax.lax.dynamic_slice(plane, (r * n64, x0), (n64, n64))
        rec = jnp.zeros((n64, n64), I32)
        lev = jnp.zeros((n64, n64), I32)
        modes = []
        splits = []
        cmodes_all = []
        for k, (hx, hy) in enumerate(_Z_CHILDREN):
            cx, cy = hx * csize, hy * csize
            top, left, corner, hl, ht = _child_refs(
                trow, lcol, corner64, rec, cx, cy, csize, has_left, has_top,
                x0, w)
            o = jax.lax.dynamic_slice(orig, (cy, cx), (csize, csize))
            lv35, rc35, cost = _encode_block_all_modes(
                o, top, left, corner, hl, ht, size=csize, c_idx=c_idx,
                qp=qpq, lam_fx=lamq,
                strong_smoothing=strong_smoothing and c_idx == 0,
                sign_hiding=sign_hiding)
            if c_idx == 0:
                m = jnp.argmin(cost).astype(I32)
            else:
                m = modes_luma[k]        # derived mode (closure)
            lv, rc = lv35[m], rc35[m]
            cost_whole = cost[m]
            split_k = jnp.asarray(False)
            cmodes_k = jnp.full((4,), m, I32)
            if split_rdo:
                # child-level refs for the half-size split
                if cy == 0:
                    trow_c, x0c = trow, x0 + cx
                else:
                    trow_c, x0c = rec[cy - 1], cx
                if cx == 0:
                    # left CTU column: fully coded, whole height valid
                    lcol_c = lcol[jnp.clip(cy + jnp.arange(n64), 0, n64 - 1)]
                else:
                    # internal column: rows below this child belong to a
                    # later z-order sibling -> replicate the last valid row
                    lcol_c = rec[jnp.clip(cy + jnp.arange(n64), 0,
                                          cy + csize - 1), cx - 1]
                lim_c = (w - 1) if cy == 0 else None
                if c_idx == 0:
                    cm, lv_s, rc_s, cost_s = _encode_split(
                        o, trow_c, lcol_c, corner, x0c, w, B=csize,
                        c_idx=0, qp=qpq, lam_fx=lamq, has_left=hl,
                        has_top=ht, sign_hiding=sign_hiding,
                        top_limit=lim_c)
                    cost_s = cost_s + (((lamq >> 4) * 14) >> 4)
                    split_k = cost_s < cost_whole
                    cmodes_k = jnp.where(split_k, cm, cmodes_k)
                else:
                    cm, lv_s, rc_s, _ = _encode_split(
                        o, trow_c, lcol_c, corner, x0c, w, B=csize,
                        c_idx=c_idx, qp=qpq, lam_fx=lamq, has_left=hl,
                        has_top=ht, sign_hiding=sign_hiding,
                        child_modes=cmodes_luma[k], top_limit=lim_c)
                    split_k = splits_luma[k]
                lv = jnp.where(split_k, lv_s, lv)
                rc = jnp.where(split_k, rc_s, rc)
            lev = jax.lax.dynamic_update_slice(lev, lv, (cy, cx))
            rec = jax.lax.dynamic_update_slice(rec, rc, (cy, cx))
            modes.append(m)
            splits.append(split_k)
            cmodes_all.append(cmodes_k)
        return (lev, rec, jnp.stack(modes), jnp.stack(splits),
                jnp.stack(cmodes_all))

    lev_y, rec_y, modes_luma, splits_luma, cmodes_luma = encode_comp(
        y_pad.astype(I32), bot_y, right_y, 32, 0, qp, lam)
    lev_u, rec_u, _, _, _ = encode_comp(u_pad.astype(I32), bot_u, right_u,
                                        16, 1, qp_c, lam_c)
    lev_v, rec_v, _, _, _ = encode_comp(v_pad.astype(I32), bot_v, right_v,
                                        16, 2, qp_c, lam_c)

    return dict(valid=valid, cc=cc, mode=modes_luma[0],
                modes4=modes_luma, split4=splits_luma,
                child_modes4=cmodes_luma,
                lev_y=lev_y, rec_y=rec_y, lev_u=lev_u, rec_u=rec_u,
                lev_v=lev_v, rec_v=rec_v)


@functools.partial(jax.jit, static_argnames=("B", "strong_smoothing",
                                             "sign_hiding", "split_rdo",
                                             "ctu64"))
def encode_frame_intra(y_pad, u_pad, v_pad, *, B: int, qp,
                       strong_smoothing: bool = True,
                       sign_hiding: bool = False,
                       split_rdo: bool = False,
                       ctu64: bool = False):
    """Encode one padded frame all-intra with CU = TU = B.

    qp may be a python int or traced scalar (rate control varies it per
    frame without recompiling). split_rdo adds a one-level CU quadtree:
    each B-block also evaluates 4 closed-loop half-size CUs (all 35 modes
    each) and splits when cheaper — the dense-per-depth evaluation +
    masked-select form of the reference's recursive mode decision
    (hmr_motion_intra.c:1759-1990). Returns dict of: modes (nby,nbx),
    split (nby,nbx), child_modes (nby,nbx,4), levels + chroma, recon
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
        modes=jnp.zeros((nby, nbx), I32),
        split=jnp.zeros((nby, nbx), bool),
        child_modes=jnp.zeros((nby, nbx, 4), I32),
        lev_y=jnp.zeros((nby, nbx, B, B), I32),
        lev_u=jnp.zeros((nby, nbx, B2, B2), I32),
        lev_v=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_y=jnp.zeros((nby, nbx, B, B), I32),
        rec_u=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_v=jnp.zeros((nby, nbx, B2, B2), I32),
    )

    lane = functools.partial(
        _lane_fn, B=B, nbx=nbx, W=W, qp=qp, qp_c=qp_c, lam=lam, lam_c=lam_c,
        strong_smoothing=strong_smoothing, sign_hiding=sign_hiding,
        split_rdo=split_rdo, ctu64=ctu64)
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
        st["modes"] = st["modes"].at[rs, cc].set(
            jnp.where(v, outs["mode"], st["modes"][rs, cc]))
        st["split"] = st["split"].at[rs, cc].set(
            jnp.where(v, outs["split"], st["split"][rs, cc]))
        st["child_modes"] = st["child_modes"].at[rs, cc].set(
            jnp.where(v[:, None], outs["child_modes"],
                      st["child_modes"][rs, cc]))
        for key in ("lev_y", "rec_y", "lev_u", "rec_u", "lev_v", "rec_v"):
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

    return dict(
        modes=st["modes"], split=st["split"], child_modes=st["child_modes"],
        lev_y=st["lev_y"], lev_u=st["lev_u"], lev_v=st["lev_v"],
        recon_y=blocks_to_plane(st["rec_y"], B).astype(jnp.uint8),
        recon_u=blocks_to_plane(st["rec_u"], B2).astype(jnp.uint8),
        recon_v=blocks_to_plane(st["rec_v"], B2).astype(jnp.uint8),
    )


@functools.partial(jax.jit, static_argnames=("strong_smoothing",
                                             "sign_hiding", "split_rdo"))
def encode_frame_intra_ctu64(y_pad, u_pad, v_pad, *, qp,
                             strong_smoothing: bool = True,
                             sign_hiding: bool = False,
                             split_rdo: bool = False):
    """All-intra frame with 64-CTUs: wavefront over 64-CTU anti-diagonals,
    z-order 32-blocks (optionally 16-split) inside each lane. Returns the
    per-CTU z-order arrays modes4/split4/child_modes4."""
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
        modes4=jnp.zeros((nby, nbx, 4), I32),
        split4=jnp.zeros((nby, nbx, 4), bool),
        child_modes4=jnp.zeros((nby, nbx, 4, 4), I32),
        lev_y=jnp.zeros((nby, nbx, B, B), I32),
        lev_u=jnp.zeros((nby, nbx, B2, B2), I32),
        lev_v=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_y=jnp.zeros((nby, nbx, B, B), I32),
        rec_u=jnp.zeros((nby, nbx, B2, B2), I32),
        rec_v=jnp.zeros((nby, nbx, B2, B2), I32),
    )
    lane = functools.partial(
        _lane_fn64, nbx=nbx, W=W, qp=qp, qp_c=qp_c, lam=lam, lam_c=lam_c,
        strong_smoothing=strong_smoothing, sign_hiding=sign_hiding,
        split_rdo=split_rdo)
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
        st["modes4"] = st["modes4"].at[rs, cc].set(
            jnp.where(v[:, None], outs["modes4"], st["modes4"][rs, cc]))
        st["split4"] = st["split4"].at[rs, cc].set(
            jnp.where(v[:, None], outs["split4"], st["split4"][rs, cc]))
        st["child_modes4"] = st["child_modes4"].at[rs, cc].set(
            jnp.where(v[:, None, None], outs["child_modes4"],
                      st["child_modes4"][rs, cc]))
        for key in ("lev_y", "rec_y", "lev_u", "rec_u", "lev_v", "rec_v"):
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

    return dict(
        modes4=st["modes4"], split4=st["split4"],
        child_modes4=st["child_modes4"],
        lev_y=st["lev_y"], lev_u=st["lev_u"], lev_v=st["lev_v"],
        recon_y=blocks_to_plane(st["rec_y"], B).astype(jnp.uint8),
        recon_u=blocks_to_plane(st["rec_u"], B2).astype(jnp.uint8),
        recon_v=blocks_to_plane(st["rec_v"], B2).astype(jnp.uint8),
    )
