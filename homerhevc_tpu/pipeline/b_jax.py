"""TPU-native B-frame stage: two-list ME + L0/L1/BI select + residual coding.

Device twin of pipeline/b_golden.py's stage A (per-block, order-independent
compute), whole-frame batched like p_jax: per-list hierarchical/dense
integer ME, 49-position quarter-pel refinement from 16 shared HP filter
grids, bi-prediction as the spec 8.5.4.2.3.1 average of the two 14-bit HP
predictions (the qpel grid values ARE predSampleLX — the generic two-stage
filter reproduces every frac==0 special case exactly), then DCT/quant/SBH.
The merge/AMVP decision walk stays sequential on the host
(b_golden stage B) — streams are byte-identical to the golden encoder.

Role of the reference's B-slice motion path (hmr_motion_inter.c L0/L1/BI
search + hmr_encoder_lib.c:782-821 GOP tables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..ops import interp
from ..ops import quant as quant_ops
from ..ops import transforms as tx_ops
from .p_golden import PAD
from . import p_jax

I32 = jnp.int32


def _subpel_list(cur, ryp, ivy, ivx, *, S, lam, search, me_precision):
    """Per-list subpel refine for every S-block: returns
    (mvx, mvy, hp (S,S,nb) int32 14-bit pred, pred8, sad8, cost)."""
    H, W = cur.shape
    nby, nbx = H // S, W // S
    nb = nby * nbx
    G = S + 2
    bits_q = jnp.asarray(p_jax._bits_tab(4 * search + 16), I32)
    qp_idx = [(qy, qx) for qy in range(-3, 4) for qx in range(-3, 4)]

    bi = jnp.arange(nb, dtype=I32)
    r = bi // nbx
    c = bi % nbx
    vy = ivy.reshape(-1).astype(I32)
    vx = ivx.reshape(-1).astype(I32)

    win = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(ryp, (yy, xx), (S + 9, S + 9)),
        out_axes=2)(r * S + vy - 4 + PAD, c * S + vx - 4 + PAD).astype(I32)

    def filt_h(b, taps, w_out):
        acc = taps[0] * b[:, 0:w_out, :]
        for i in range(1, len(taps)):
            acc = acc + int(taps[i]) * b[:, i:i + w_out, :]
        return acc

    def filt_v(b, taps, h_out):
        acc = taps[0] * b[0:h_out, :, :]
        for i in range(1, len(taps)):
            acc = acc + int(taps[i]) * b[i:i + h_out, :, :]
        return acc

    hraw = [filt_h(win, interp.LUMA_FILTERS[fx], G) for fx in range(4)]
    hps = []
    for fy in range(4):
        for fx in range(4):
            hps.append(filt_v(hraw[fx], interp.LUMA_FILTERS[fy], G) >> 6)
    hstack = jnp.stack(hps)                          # (16, G, G, nb) HP

    blk = (cur.reshape(nby, S, nbx, S).transpose(1, 3, 0, 2)
           .reshape(S, S, nb))
    costs = []
    for qy, qx in qp_idx:
        fy, fx = qy & 3, qx & 3
        iy, ix = qy >> 2, qx >> 2
        hp = hstack[fy * 4 + fx, 1 + iy:1 + iy + S, 1 + ix:1 + ix + S, :]
        pred = jnp.clip((hp + 32) >> 6, 0, 255)
        sad = jnp.abs(blk - pred).sum(axis=(0, 1))
        bb = bits_q[jnp.abs(4 * vx + qx)] + bits_q[jnp.abs(4 * vy + qy)]
        costs.append(sad + ((lam * bb) >> 8))
    cost49 = jnp.stack(costs)

    a49 = jnp.arange(49, dtype=I32)[:, None]

    def pick49(i):
        # one-hot masked reduction instead of take_along_axis (cross-
        # sublane gathers are ~60x slower on TPU)
        return jnp.sum(jnp.where(a49 == i[None, :], cost49, 0), axis=0)

    def strict_min(center_idx, offsets):
        best_i = center_idx
        best_c = pick49(center_idx)
        for off in offsets:
            i = center_idx + off
            ci = pick49(i)
            better = ci < best_c
            best_c = jnp.where(better, ci, best_c)
            best_i = jnp.where(better, i, best_i)
        return best_i

    center = jnp.full((nb,), 24, I32)
    if me_precision >= 1:
        center = strict_min(center, [dqy * 7 + dqx for dqy in (-2, 0, 2)
                                     for dqx in (-2, 0, 2)
                                     if not (dqy == 0 and dqx == 0)])
    if me_precision >= 2:
        center = strict_min(center, [dqy * 7 + dqx for dqy in (-1, 0, 1)
                                     for dqx in (-1, 0, 1)
                                     if not (dqy == 0 and dqx == 0)])
    qy = center // 7 - 3
    qx = center % 7 - 3
    mvx = 4 * vx + qx
    mvy = 4 * vy + qy

    pidx = (qy & 3) * 4 + (qx & 3)
    sel = jnp.zeros((G, G, nb), I32)
    for p in range(16):
        sel = sel + jnp.where(pidx == p, hstack[p], 0)
    sy = 1 + (qy >> 2)
    sx = 1 + (qx >> 2)
    hp_sel = jnp.zeros((S, S, nb), I32)
    for a in (0, 1):
        for b_ in (0, 1):
            m = (sy == a) & (sx == b_)
            hp_sel = hp_sel + jnp.where(m, sel[a:a + S, b_:b_ + S, :], 0)
    pred8 = jnp.clip((hp_sel + 32) >> 6, 0, 255)
    sad = jnp.abs(blk - pred8).sum(axis=(0, 1))
    mvb = bits_q[jnp.abs(mvx)] + bits_q[jnp.abs(mvy)]
    cost = sad + ((lam * mvb) >> 8)
    return mvx, mvy, hp_sel, pred8, cost, blk


def _chroma_hp(refp, mvx, mvy, r, c, *, S2):
    """Per-block chroma HP prediction (14-bit, spec 8.5.4.2.2.2)."""
    nb = mvx.shape[0]
    ctab = jnp.asarray(interp.CHROMA_FILTERS)
    coefx = ctab[mvx & 7].T
    coefy = ctab[mvy & 7].T
    by_c = r * S2 + (mvy >> 3) + PAD // 2 - 1
    bx_c = c * S2 + (mvx >> 3) + PAD // 2 - 1
    wc = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(refp, (yy, xx),
                                             (S2 + 3, S2 + 3)),
        out_axes=2)(by_c, bx_c).astype(I32)
    hs = sum(coefx[k][None, None, :] * wc[:, k:k + S2, :] for k in range(4))
    return sum(coefy[k][None, None, :] * hs[k:k + S2, :, :]
               for k in range(4)) >> 6                # HP (no round/clip)


def _code_cu(orig, pred, qpq, lg2, sign_hiding, lam_full_t):
    """Batched TU=CU residual coding + zero-cbf RD (twin of
    b_golden.code_block; identical integers to p_jax's code())."""
    resid = orig - pred
    coeff = tx_ops.forward_transform(resid)
    lev = quant_ops.quantize(coeff, qpq, lg2, is_intra=False)
    if sign_hiding:
        lev = quant_ops.sign_bit_hiding(lev, coeff, qpq, lg2)
    rr = tx_ops.inverse_transform(quant_ops.dequantize(lev, qpq, lg2))
    any_nz = jnp.any(lev != 0, axis=(-1, -2))
    rr = jnp.where(any_nz[..., None, None], rr, 0)
    rec = jnp.clip(pred + rr, 0, 255)
    lamf = lam_full_t[qpq]
    ssd_c = jnp.sum((orig - rec) * (orig - rec), axis=(-1, -2))
    ssd_s = jnp.sum((orig - pred) * (orig - pred), axis=(-1, -2))
    bits = jnp.minimum(tables.level_bits_est(lev, xp=jnp), 16383)
    keep = ssd_c + (((lamf >> 4) * bits) >> 4) < ssd_s
    kb = keep[..., None, None]
    return jnp.where(kb, lev, 0), jnp.where(kb, rec, pred)


@functools.partial(jax.jit,
                   static_argnames=("B", "search", "me_precision",
                                    "sign_hiding", "vis"))
def b_frame_device(y_pad, u_pad, v_pad, r0y, r0u, r0v, r1y, r1u, r1v, *,
                   B: int, qp, search: int, me_precision: int,
                   sign_hiding: bool = False, vis=None):
    """One B frame, CU = TU = B grid, refs (past, future). Returns per-block
    arrays: inter_dir idc (0 L0 / 1 L1 / 2 BI), mv0/mv1, levels, recon."""
    H, W = y_pad.shape
    nby, nbx = H // B, W // B
    nb = nby * nbx
    B2 = B // 2
    log2 = B.bit_length() - 1
    qp = jnp.asarray(qp, I32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam = jnp.asarray(tables.LAMBDA_ME_FX_P)[qp]
    lam_full_t = jnp.asarray(tables.LAMBDA_FX_P)
    cur = y_pad.astype(I32)

    pads = []
    for ry8, ru8, rv8 in ((r0y, r0u, r0v), (r1y, r1u, r1v)):
        pads.append((jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge"),
                     jnp.pad(ru8.astype(jnp.int16), PAD // 2, mode="edge"),
                     jnp.pad(rv8.astype(jnp.int16), PAD // 2, mode="edge")))

    bi_ = jnp.arange(nb, dtype=I32)
    r = bi_ // nbx
    c = bi_ % nbx

    lists = []
    for l in (0, 1):
        ryp = pads[l][0]
        if search > p_jax.HIER_THRESHOLD:
            ivy, ivx, _ = p_jax._me_hier(cur, ryp, sizes=(B,), search=search,
                                         lam=lam)[B]
        else:
            n = 2 * search + 1
            bits1 = p_jax._bits_tab(4 * search)[
                np.abs(4 * np.arange(-search, search + 1))]
            bits2 = jnp.asarray(bits1[:, None] + bits1[None, :], I32)
            mvcost = ((lam * bits2) >> 8).reshape(-1)
            g = p_jax._sad_grids(cur.astype(jnp.int16), ryp, S=16,
                                 search=search)
            S_ = 32
            while S_ <= B:
                nn, py, px = g.shape
                g = g.reshape(nn, py // 2, 2, px // 2, 2).sum(axis=(2, 4))
                S_ *= 2
            k = jnp.argmin(g + mvcost[:, None, None], axis=0).astype(I32)
            ivy = k // n - search
            ivx = k % n - search
        lists.append(_subpel_list(cur, ryp, ivy, ivx, S=B, lam=lam,
                                  search=search, me_precision=me_precision))

    (mvx0, mvy0, hp0, p80, cost0, blk) = lists[0]
    (mvx1, mvy1, hp1, p81, cost1, _) = lists[1]

    pred_bi = jnp.clip((hp0 + hp1 + 64) >> 7, 0, 255)
    sad_bi = jnp.abs(blk - pred_bi).sum(axis=(0, 1))
    bits_q = jnp.asarray(p_jax._bits_tab(4 * search + 16), I32)
    bb_bi = (bits_q[jnp.abs(mvx0)] + bits_q[jnp.abs(mvy0)]
             + bits_q[jnp.abs(mvx1)] + bits_q[jnp.abs(mvy1)])
    cost_bi = sad_bi + ((lam * bb_bi) >> 8)
    all_c = jnp.stack([cost0, cost1, cost_bi])       # tie: L0, L1, BI
    idc = jnp.argmin(all_c, axis=0).astype(I32)

    pred_y = jnp.where(idc == 0, p80, jnp.where(idc == 1, p81, pred_bi))

    # chroma per selected mode
    hpc0u = _chroma_hp(pads[0][1], mvx0, mvy0, r, c, S2=B2)
    hpc0v = _chroma_hp(pads[0][2], mvx0, mvy0, r, c, S2=B2)
    hpc1u = _chroma_hp(pads[1][1], mvx1, mvy1, r, c, S2=B2)
    hpc1v = _chroma_hp(pads[1][2], mvx1, mvy1, r, c, S2=B2)

    def uni(hp):
        return jnp.clip((hp + 32) >> 6, 0, 255)

    pred_u = jnp.where(idc == 0, uni(hpc0u),
                       jnp.where(idc == 1, uni(hpc1u),
                                 jnp.clip((hpc0u + hpc1u + 64) >> 7, 0, 255)))
    pred_v = jnp.where(idc == 0, uni(hpc0v),
                       jnp.where(idc == 1, uni(hpc1v),
                                 jnp.clip((hpc0v + hpc1v + 64) >> 7, 0, 255)))

    def tob(x):
        return x.transpose(2, 0, 1)

    blk_u = (u_pad.astype(I32).reshape(nby, B2, nbx, B2)
             .transpose(1, 3, 0, 2).reshape(B2, B2, nb))
    blk_v = (v_pad.astype(I32).reshape(nby, B2, nbx, B2)
             .transpose(1, 3, 0, 2).reshape(B2, B2, nb))
    oy, ou, ov = tob(blk), tob(blk_u), tob(blk_v)
    py_, pu_, pv_ = tob(pred_y), tob(pred_u), tob(pred_v)
    if vis is not None and (vis[0] < H or vis[1] < W):
        ys = jnp.arange(B)
        vmy = ((bi_ // nbx)[:, None] * B + ys[None]) < vis[0]
        vmx = ((bi_ % nbx)[:, None] * B + ys[None]) < vis[1]
        m_l = vmy[:, :, None] & vmx[:, None, :]
        oy = jnp.where(m_l, oy, py_)
        ys2 = jnp.arange(B2)
        vmy2 = ((bi_ // nbx)[:, None] * B2 + ys2[None]) < vis[0] // 2
        vmx2 = ((bi_ % nbx)[:, None] * B2 + ys2[None]) < vis[1] // 2
        m_c = vmy2[:, :, None] & vmx2[:, None, :]
        ou = jnp.where(m_c, ou, pu_)
        ov = jnp.where(m_c, ov, pv_)
    lev_y, rec_y = _code_cu(oy, py_, qp, log2, sign_hiding, lam_full_t)
    lev_u, rec_u = _code_cu(ou, pu_, qp_c, log2 - 1, sign_hiding,
                            lam_full_t)
    lev_v, rec_v = _code_cu(ov, pv_, qp_c, log2 - 1, sign_hiding,
                            lam_full_t)

    out = dict(idc=idc.reshape(nby, nbx),
               mv0=jnp.stack([mvx0, mvy0], -1).reshape(nby, nbx, 2),
               mv1=jnp.stack([mvx1, mvy1], -1).reshape(nby, nbx, 2))
    out["lev_y"] = lev_y.reshape(nby, nbx, B, B)
    out["rec_y"] = rec_y.reshape(nby, nbx, B, B)
    for k, t in (("lev_u", lev_u), ("lev_v", lev_v),
                 ("rec_u", rec_u), ("rec_v", rec_v)):
        out[k] = t.reshape(nby, nbx, B2, B2)
    return out
