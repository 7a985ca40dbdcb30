"""TPU-native P-frame pipeline: frame-batched ME + MC + transform.

The key restructuring vs the reference (hmr_motion_inter.c, per-CU wavefront
with semaphores): inter prediction reads only the *previous* decoded frame,
so every block's ME/MC/transform is independent — the whole frame runs as
one batched device program:

  * integer ME: ordered lax.scan over the (2R+1)^2 offset grid, whole-frame
    abs-diff + per-block box reduction per offset (first-minimum semantics
    identical to the golden encoder's raster argmin);
  * subpel: per-block 49-position quarter-pel cost grid from 16 shared
    filter planes, then the same greedy half->quarter selection;
  * MC + DCT + quant + recon: dense batched tensor ops on the MXU.

Only the merge/AMVP decision walk stays sequential, on the host
(ops.inter_golden.derive_block_decisions) — it is O(blocks) scalar work.
Produces bit-identical streams to pipeline/p_golden.py (tested).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..ops import blocksum
from ..ops import interp
from ..ops import quant as quant_ops
from ..ops import transforms as tx_ops
from . import p_golden
from .p_golden import PAD, PFramePlan, build_p_plans, lambda_me_fx

I32 = jnp.int32

# Search ranges above this use the hierarchical coarse+refine ME
# (_me_hier / p_golden.integer_search_hier); at or below it, the dense
# full-window sweep (whose MC support fits the reference-style padding
# without a coarse stage) is used. Both are golden-twinned.
HIER_THRESHOLD = 24

# Merge-signalling bit proxies (merge_flag + unary idx) used by the
# merge/skip RD in _level_encode and its golden twin — must stay equal in
# both pipelines (tie-breaks are strict-less in candidate order).
MB_LEFT, MB_TOP, MB_ZERO = 3, 4, 5


def _bits_tab(max_abs: int) -> np.ndarray:
    """bits(c) = 1 + 2*bitlen(|c|) lookup for |c| in 0..max_abs."""
    return np.array([1 + 2 * int(a).bit_length() for a in range(max_abs + 1)],
                    dtype=np.int32)


_PALLAS_STATE = {"ok": None}


def _pallas_ok() -> bool:
    """One-time probe: can the Pallas ME kernel compile+run on this backend?
    Falls back to the XLA search if not (e.g. unsupported TPU gen)."""
    if _PALLAS_STATE["ok"] is None:
        if os.environ.get("HOMERHEVC_NO_PALLAS"):
            _PALLAS_STATE["ok"] = False
            return False
        try:
            from ..ops.me_pallas import integer_me_pallas
            c = jnp.zeros((32, 128), jnp.int16)
            r = jnp.zeros((32 + 64, 128 + 64), jnp.int16)
            mc = jnp.zeros((9 * 9,), jnp.int32)
            cost, _ = integer_me_pallas(c, r, mc, B=32, search=4, pad=32)
            np.asarray(cost)
            _PALLAS_STATE["ok"] = True
        except Exception:
            _PALLAS_STATE["ok"] = False
    return _PALLAS_STATE["ok"]


def _gather_win(plane, by, bx, *, nby, nbx, G, S_row, lo, band_h):
    """(G, G, nb) per-block windows from a padded plane at absolute
    top-left (by[b], bx[b]), with by[b] - (i*S_row + lo) in
    [0, band_h - G] for a block in block-row i (and the same bound for
    bx against column j — the ME search range).

    On TPU the natural vmap(dynamic_slice) lowers to a while loop of one
    tiny slice per block (~4.7 ms/frame per site at 720p, measured; a
    Pallas band kernel still pays ~0.8 us/block in loop+load overhead),
    so there it is computed as dense one-hot contractions on the MXU: a
    scan over block rows slices the row band, builds the nbx overlapping
    column strips with static phase slices, and two one-hot matmuls
    (row select, then column select) produce every block's window. The
    one-hot operands and the 8-bit pixel values are exact in bf16, and
    each output has exactly one nonzero product, so the result is exact
    integer arithmetic at MXU speed."""
    if (lo < 0 or jax.default_backend() != "tpu"
            or os.environ.get("HOMERHEVC_GATHER") == "xla"):
        return jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(plane, (yy, xx), (G, G)),
            out_axes=2)(by, bx)
    S = S_row
    L = band_h
    Hp, Wp = plane.shape
    P = -(-L // S)                                 # col strip phase count
    need = lo + (P - 1) * S + nbx * S
    if need > Wp:
        plane = jnp.pad(plane, ((0, 0), (0, need - Wp)))
    bf = jnp.bfloat16
    arG = jnp.arange(G, dtype=I32)
    arL = jnp.arange(L, dtype=I32)
    arPS = jnp.arange(P * S, dtype=I32)

    def row(carry, xs):
        i, by_r, bx_r = xs
        # clamp like dynamic_slice does, and offset the row one-hots
        # against the CLAMPED start (the bottom block row's band can run
        # past the plane when PAD < lo + L - S*(nby-1))
        start = jnp.minimum(i * S + lo, Hp - L)
        band = jax.lax.dynamic_slice(plane, (start, 0),
                                     (L, plane.shape[1]))
        strips = jnp.stack([
            band[:, lo + p * S: lo + p * S + nbx * S].reshape(L, nbx, S)
            for p in range(P)])                    # (P, L, nbx, S)
        strips = strips.transpose(2, 1, 0, 3).reshape(nbx, L, P * S)
        dxl = bx_r[:, None, None] + arG[None, :, None] - lo
        dxl = dxl - (jnp.arange(nbx, dtype=I32) * S)[:, None, None]
        ohy = ((by_r[:, None, None] - start + arG[None, :, None])
               == arL[None, None, :]).astype(bf)   # (nbx, G, L)
        ohx = (dxl == arPS[None, None, :]).astype(bf)  # (nbx, G, P*S)
        sel1 = jnp.einsum("bgh,bhw->bgw", ohy, strips.astype(bf),
                          preferred_element_type=jnp.float32)
        win = jnp.einsum("bgw,bxw->bgx", sel1.astype(bf), ohx,
                         preferred_element_type=jnp.float32)
        return carry, win.astype(jnp.int16)        # (nbx, G, G)

    _, wins = jax.lax.scan(
        row, None,
        (jnp.arange(nby, dtype=I32), by.reshape(nby, nbx),
         bx.reshape(nby, nbx)))
    return wins.reshape(nby * nbx, G, G).transpose(1, 2, 0)


def _p_stage(y_pad, u_pad, v_pad, ry, ru, rv, *, B: int, qp,
             search: int, me_precision: int, sign_hiding: bool = False):
    """Core frame-batched P stage over PAD-pre-padded reference planes.

    Shared by the single-device jit (p_frame_device pads globally) and the
    band-sharded shard_map path (pipeline/sharded.py builds the padding from
    ppermute halo exchange) — both produce identical block outputs.
    """
    H, W = y_pad.shape
    nby, nbx = H // B, W // B
    B2 = B // 2
    qp = jnp.asarray(qp, I32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam = jnp.asarray(tables.LAMBDA_ME_FX_P)[qp]
    log2 = B.bit_length() - 1

    cur = y_pad.astype(I32)

    # ---------------- integer search ----------------
    if search > HIER_THRESHOLD:
        ivy, ivx, best_cost = _me_hier(cur, ry, sizes=(B,), search=search,
                                       lam=lam)[B]
        return _p_stage_tail(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx,
                             best_cost, B=B, qp=qp, qp_c=qp_c, lam=lam,
                             search=search, me_precision=me_precision,
                             sign_hiding=sign_hiding)

    n = 2 * search + 1
    bits1 = _bits_tab(4 * search)[np.abs(4 * np.arange(-search, search + 1))]
    bits2 = jnp.asarray(bits1[:, None] + bits1[None, :], I32)
    mvcost_j = ((lam * bits2) >> 8).reshape(-1)

    if jax.default_backend() == "tpu" and _pallas_ok():
        # Pallas kernel: reference band resident in VMEM for the whole
        # window sweep (ops/me_pallas.py); bit-identical tie-breaks.
        from ..ops.me_pallas import integer_me_pallas
        best_cost, best_o = integer_me_pallas(
            cur, ry, mvcost_j, B=B, search=search, pad=PAD)
        ivy = best_o // n - search
        ivx = best_o % n - search
        return _p_stage_tail(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx,
                             best_cost, B=B, qp=qp, qp_c=qp_c, lam=lam,
                             search=search, me_precision=me_precision,
                             sign_hiding=sign_hiding)

    # XLA path: ONE 16-granular SAD grid sweep, parent block SADs by
    # sum-pooling (SAD additivity), then a single global argmin over the
    # flat dy-major offset axis — jnp.argmin takes the FIRST minimum, which
    # is exactly the golden encoder's raster tie-break.
    g16 = _sad_grids(cur.astype(jnp.int16), ry, S=16, search=search)
    g = g16
    S = 32
    while S <= B:
        nn, py, px = g.shape
        g = g.reshape(nn, py // 2, 2, px // 2, 2).sum(axis=(2, 4))
        S *= 2
    cost = g + mvcost_j[:, None, None]
    best_o = jnp.argmin(cost, axis=0).astype(I32)   # (nby, nbx)
    best_cost = jnp.min(cost, axis=0)               # == cost at best_o
    ivy = best_o // n - search                      # (nby, nbx)
    ivx = best_o % n - search
    return _p_stage_tail(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx, best_cost,
                         B=B, qp=qp, qp_c=qp_c, lam=lam, search=search,
                         me_precision=me_precision, sign_hiding=sign_hiding)


def _level_encode(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx, *, S, qp, qp_c,
                  lam, search, me_precision, sign_hiding, tr_split=False,
                  qp_rows=None, vis=None):
    """Subpel refinement + MC + residual coding for every S-sized block of
    the frame. Returns per-block arrays plus an integer RD cost (luma SSD +
    lambda*(level-bits-est + mv bits)) used by the quadtree split decision.
    Size-generic: S in {16, 32, 64}.

    TPU layout: per-block windows are gathered once, then ALL filtering /
    cost math runs in (wy, wx, nb) layout — the block axis rides the
    128-lane dimension at full utilisation instead of padding each small
    (S, S) tile out to (8, 128). Numerically identical to the per-lane
    formulation (the generic two-stage filter path below reproduces the
    frac==0 special cases exactly: x*64 >> 6 == x for all ints)."""
    H, W = cur.shape
    nby, nbx = H // S, W // S
    nb = nby * nbx
    S2 = S // 2
    G = S + 2                                       # qpel grid spatial extent
    log2 = S.bit_length() - 1

    bits_q = jnp.asarray(_bits_tab(4 * search + 16), I32)
    qp_idx = [(qy, qx) for qy in range(-3, 4) for qx in range(-3, 4)]
    lam_full_t = jnp.asarray(tables.LAMBDA_FX_P)

    bi = jnp.arange(nb, dtype=I32)
    r = bi // nbx
    c = bi % nbx
    if qp_rows is not None:
        # per-CTU-row rate control: quant/dequant/SBH and the RD lambdas
        # run with each block row's QP (the coded cu_qp_delta targets)
        ctu_rows = H // qp_rows.shape[0]
        qp = qp_rows[(r * S) // ctu_rows]           # (nb,)
        qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    vy = ivy.reshape(-1).astype(I32)
    vx = ivx.reshape(-1).astype(I32)

    # ---- per-block (S+9, S+9) luma support windows -> (S+9, S+9, nb) ----
    mo = search + 7                                 # |vy - 4| bound (+-3 qpel
    win = _gather_win(                              # refine over the int MV)
        ry, r * S + vy - 4 + PAD, c * S + vx - 4 + PAD,
        nby=nby, nbx=nbx, G=S + 9, S_row=S, lo=PAD - mo,
        band_h=2 * mo + S + 9).astype(I32)

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

    # ---- 16 qpel grids, generic two-stage 8-tap (exact for frac==0) ----
    hraw = [filt_h(win, interp.LUMA_FILTERS[fx], G) for fx in range(4)]
    grids = []
    for fy in range(4):
        for fx in range(4):
            vv = filt_v(hraw[fx], interp.LUMA_FILTERS[fy], G) >> 6
            grids.append(jnp.clip((vv + 32) >> 6, 0, 255))
    gstack = jnp.stack(grids)                       # (16, G, G, nb)

    # ---- current blocks in (S, S, nb) layout ----
    blk = (cur.reshape(nby, S, nbx, S).transpose(1, 3, 0, 2)
           .reshape(S, S, nb))

    # ---- 49 quarter-pel candidate costs (49, nb) ----
    sads = []
    costs = []
    for qy, qx in qp_idx:
        fy, fx = qy & 3, qx & 3
        iy, ix = qy >> 2, qx >> 2
        pred = gstack[fy * 4 + fx, 1 + iy:1 + iy + S, 1 + ix:1 + ix + S, :]
        sad = jnp.abs(blk - pred).sum(axis=(0, 1))
        bb = bits_q[jnp.abs(4 * vx + qx)] + bits_q[jnp.abs(4 * vy + qy)]
        sads.append(sad)
        costs.append(sad + ((lam * bb) >> 8))
    sad49 = jnp.stack(sads)                         # (49, nb)
    cost49 = jnp.stack(costs)                       # (49, nb)

    a49 = jnp.arange(49, dtype=I32)[:, None]        # (49, 1)

    def pick49(grid, i):
        """grid[i[b], b] without take_along_axis (cross-sublane gathers
        lower ~60x slower than a one-hot masked reduction on TPU)."""
        return jnp.sum(jnp.where(a49 == i[None, :], grid, 0), axis=0)

    def strict_min(center_idx, offsets):
        best_i = center_idx
        best_c = pick49(cost49, center_idx)
        for off in offsets:
            i = center_idx + off
            ci = pick49(cost49, i)
            better = ci < best_c
            best_c = jnp.where(better, ci, best_c)
            best_i = jnp.where(better, i, best_i)
        return best_i

    center = jnp.full((nb,), 24, I32)               # (0, 0) in the 7x7 grid
    if me_precision >= 1:
        offs = [dqy * 7 + dqx for dqy in (-2, 0, 2) for dqx in (-2, 0, 2)
                if not (dqy == 0 and dqx == 0)]
        center = strict_min(center, offs)
    if me_precision >= 2:
        offs = [dqy * 7 + dqx for dqy in (-1, 0, 1) for dqx in (-1, 0, 1)
                if not (dqy == 0 and dqx == 0)]
        center = strict_min(center, offs)
    qy = center // 7 - 3
    qx = center % 7 - 3
    mvx = 4 * vx + qx
    mvy = 4 * vy + qy

    # ---- merge/skip RD (role of check_rd_cost_merge_2nx2n,
    # hmr_motion_inter.c:3493): candidate MVs = left / top neighbor's
    # subpel pick (evaluated from the 49-grid SADs when within +-3 qpel of
    # this block's window — the coherent-motion case where merge wins) and
    # the zero MV (static-slice prediction, always evaluable). Costs use a
    # merge-signalling bit proxy instead of mvd bits; strict-less over the
    # ordered list [best-AMVP, left, top, zero], so ties keep AMVP — the
    # golden twin (p_golden) replicates the same order and constants. The
    # host walk then re-derives the exact spec merge list from the FINAL
    # field; a chosen candidate that survives there is coded merge/skip.
    base_cost = pick49(cost49, center)
    BIGC = jnp.int32(1 << 30)
    mvxg = mvx.reshape(nby, nbx)
    mvyg = mvy.reshape(nby, nbx)

    def shifted(a, dr, dc):
        return jnp.roll(jnp.roll(a, -dr, 0), -dc, 1).reshape(-1)

    best_c = base_cost
    sel_k = jnp.zeros((nb,), I32)                   # 0 = AMVP/base
    mvx_s, mvy_s = mvx, mvy
    r_g = r.reshape(-1)
    c_g = c.reshape(-1)
    cands = [(shifted(mvxg, 0, -1), shifted(mvyg, 0, -1), c_g > 0, MB_LEFT),
             (shifted(mvxg, -1, 0), shifted(mvyg, -1, 0), r_g > 0, MB_TOP)]
    zero_pred = (ry[PAD:PAD + H, PAD:PAD + W].astype(I32)
                 .reshape(nby, S, nbx, S).transpose(1, 3, 0, 2)
                 .reshape(S, S, nb))
    sad_z = jnp.abs(blk - zero_pred).sum(axis=(0, 1))
    cands.append((jnp.zeros((nb,), I32), jnp.zeros((nb,), I32),
                  jnp.ones((nb,), bool), MB_ZERO))
    for ki, (cmx, cmy, valid, mb) in enumerate(cands):
        dqx = cmx - 4 * vx
        dqy = cmy - 4 * vy
        ing = valid & (jnp.abs(dqx) <= 3) & (jnp.abs(dqy) <= 3)
        if mb == MB_ZERO:
            sad_c = sad_z
            ok = valid
        else:
            j = jnp.clip((dqy + 3) * 7 + (dqx + 3), 0, 48)
            sad_c = pick49(sad49, j)
            ok = ing
        cost_c = jnp.where(ok, sad_c + ((lam * mb) >> 8), BIGC)
        better = cost_c < best_c
        best_c = jnp.where(better, cost_c, best_c)
        sel_k = jnp.where(better, ki + 1, sel_k)
        mvx_s = jnp.where(better, cmx, mvx_s)
        mvy_s = jnp.where(better, cmy, mvy_s)
    is_zero_sel = (sel_k == 3) | ((mvx_s == 0) & (mvy_s == 0)
                                  & (sel_k > 0))
    # in-grid final deltas for the masked pred select (zero handled apart)
    qy = jnp.where(sel_k > 0, jnp.clip(mvy_s - 4 * vy, -3, 3), qy)
    qx = jnp.where(sel_k > 0, jnp.clip(mvx_s - 4 * vx, -3, 3), qx)
    mvx, mvy = mvx_s, mvy_s

    # ---- final luma pred: masked plane + shift select ----
    pidx = (qy & 3) * 4 + (qx & 3)                  # (nb,)
    sel = jnp.zeros((G, G, nb), I32)
    for p in range(16):
        sel = sel + jnp.where(pidx == p, gstack[p], 0)
    sy = 1 + (qy >> 2)                              # in {0, 1}
    sx = 1 + (qx >> 2)
    pred_y = jnp.zeros((S, S, nb), I32)
    for a in (0, 1):
        for b in (0, 1):
            m = (sy == a) & (sx == b)
            pred_y = pred_y + jnp.where(m, sel[a:a + S, b:b + S, :], 0)
    pred_y = jnp.where(is_zero_sel, zero_pred, pred_y)

    # ---- chroma MC with per-block 4-tap filter coefficients ----
    ctab = jnp.asarray(interp.CHROMA_FILTERS)
    coefx = ctab[mvx & 7].T                         # (4, nb)
    coefy = ctab[mvy & 7].T

    moc = search // 2 + 3                           # |mvy>>3| bound (+ the -1)

    def chroma_pred(refp, base_y, base_x):
        wc = _gather_win(refp, base_y, base_x, nby=nby, nbx=nbx,
                         G=S2 + 3, S_row=S2, lo=PAD // 2 - moc,
                         band_h=2 * moc + S2 + 3).astype(I32)
        hs = sum(coefx[k][None, None, :] * wc[:, k:k + S2, :]
                 for k in range(4))                 # (S2+3, S2, nb)
        vv = sum(coefy[k][None, None, :] * hs[k:k + S2, :, :]
                 for k in range(4)) >> 6
        return jnp.clip((vv + 32) >> 6, 0, 255)

    by_c = r * S2 + (mvy >> 3) + PAD // 2 - 1
    bx_c = c * S2 + (mvx >> 3) + PAD // 2 - 1
    pred_u = chroma_pred(ru, by_c, bx_c)
    pred_v = chroma_pred(rv, by_c, bx_c)
    blk_u = (u_pad.astype(I32).reshape(nby, S2, nbx, S2)
             .transpose(1, 3, 0, 2).reshape(S2, S2, nb))
    blk_v = (v_pad.astype(I32).reshape(nby, S2, nbx, S2)
             .transpose(1, 3, 0, 2).reshape(S2, S2, nb))

    # ---- residual coding on (nb, S, S) batches ----
    def tob(x):                                     # (s, s, nb) -> (nb, s, s)
        return x.transpose(2, 0, 1)

    def rd_zero(orig, pred, lev, rec, qpq):
        # skip-vs-code RD (role of the reference's zero-cbf-vs-coded SSD
        # decision, hmr_motion_inter.c:106/:209): drop the residual when
        # prediction-only costs less in D + lambda*R.
        lamf = lam_full_t[qpq]
        ssd_c = jnp.sum((orig - rec) * (orig - rec), axis=(-1, -2))
        ssd_s = jnp.sum((orig - pred) * (orig - pred), axis=(-1, -2))
        bits = jnp.minimum(tables.level_bits_est(lev, xp=jnp), 16383)
        if getattr(lamf, "ndim", 0):
            lamf = lamf.reshape(lamf.shape + (1,) * (bits.ndim - lamf.ndim))
        keep = ssd_c + (((lamf >> 4) * bits) >> 4) < ssd_s
        keep_b = keep[..., None, None]
        return (jnp.where(keep_b, lev, 0), jnp.where(keep_b, rec, pred))

    def code(orig, pred, qpq, lg2, max_tb=5):
        resid = orig - pred                         # (nb, n, n)
        n = 1 << lg2
        if lg2 > max_tb:
            # implicit TU quadtree (spec 7.3.8.8): four half-size TBs,
            # batched as one (nb, 4, n/2, n/2) tensor op.
            h2 = n // 2

            def tile(t):
                return (t.reshape(nb, 2, h2, 2, h2).transpose(0, 1, 3, 2, 4)
                        .reshape(nb, 4, h2, h2))

            q = tile(resid)
            coeff = tx_ops.forward_transform(q)
            lev = quant_ops.quantize(coeff, qpq, lg2 - 1, is_intra=False)
            if sign_hiding:
                lev = quant_ops.sign_bit_hiding(lev, coeff, qpq, lg2 - 1)
            rr = tx_ops.inverse_transform(
                quant_ops.dequantize(lev, qpq, lg2 - 1))
            any_nz = jnp.any(lev != 0, axis=(-1, -2))
            rr = jnp.where(any_nz[..., None, None], rr, 0)
            predq = tile(pred)
            origq = tile(orig)
            rec_q = jnp.clip(predq + rr, 0, 255)
            lev, rec_q = rd_zero(origq, predq, lev, rec_q, qpq)

            def untile(t):
                return (t.reshape(nb, 2, 2, h2, h2).transpose(0, 1, 3, 2, 4)
                        .reshape(nb, n, n))
            return untile(lev), untile(rec_q)
        coeff = tx_ops.forward_transform(resid)
        lev = quant_ops.quantize(coeff, qpq, lg2, is_intra=False)
        if sign_hiding:
            lev = quant_ops.sign_bit_hiding(lev, coeff, qpq, lg2)
        rr = tx_ops.inverse_transform(quant_ops.dequantize(lev, qpq, lg2))
        any_nz = jnp.any(lev != 0, axis=(-1, -2))
        rr = jnp.where(any_nz[..., None, None], rr, 0)
        rec = jnp.clip(pred + rr, 0, 255)
        lev, rec = rd_zero(orig, pred, lev, rec, qpq)
        return lev, rec

    cmax_tb = 4 if log2 == 6 else 5
    blk_b = tob(blk)
    blk_ub, blk_vb = tob(blk_u), tob(blk_v)
    pred_yb, pred_ub, pred_vb = tob(pred_y), tob(pred_u), tob(pred_v)
    if vis is not None and (vis[0] < H or vis[1] < W):
        # Conformance-window padding: rows/cols beyond the visible picture
        # are cropped by the decoder — spend no residual bits there
        # (orig := pred zeroes the padded region's residual; costs below
        # then also ignore invisible distortion).
        ys = jnp.arange(S)
        row0 = (bi // nbx) * S
        col0 = (bi % nbx) * S
        vmy = (row0[:, None] + ys[None]) < vis[0]   # (nb, S)
        vmx = (col0[:, None] + ys[None]) < vis[1]
        m_l = (vmy[:, :, None] & vmx[:, None, :])
        blk_b = jnp.where(m_l, blk_b, pred_yb)
        ys2 = jnp.arange(S2)
        vmy2 = ((bi // nbx)[:, None] * S2 + ys2[None]) < vis[0] // 2
        vmx2 = ((bi % nbx)[:, None] * S2 + ys2[None]) < vis[1] // 2
        m_c = (vmy2[:, :, None] & vmx2[:, None, :])
        blk_ub = jnp.where(m_c, blk_ub, pred_ub)
        blk_vb = jnp.where(m_c, blk_vb, pred_vb)
    lev_y, rec_y = code(blk_b, pred_yb, qp, log2)
    lev_u, rec_u = code(blk_ub, pred_ub, qp_c, log2 - 1, cmax_tb)
    lev_v, rec_v = code(blk_vb, pred_vb, qp_c, log2 - 1, cmax_tb)
    trd = jnp.zeros((nb,), I32)
    if tr_split and S == 32:
        # inter residual quadtree, depth 1 (role of the reference's
        # max_inter_tr_depth RDO): re-code the CU as four half-size TBs
        # (chroma follows the tree) via the implicit-split path, then a
        # per-CU RD select — split_transform_flag is coded by the entropy
        # layer from the tr_depth map.
        lamf0 = lam_full_t[qp]

        def rd_of(lv, rc, orig, extra_bits):
            b = jnp.minimum(
                tables.level_bits_est(lv, xp=jnp).reshape(nb, -1).sum(-1),
                16383)
            d = jnp.sum((orig - rc) * (orig - rc), axis=(-1, -2))
            d = d.reshape(nb, -1).sum(-1) if d.ndim > 1 else d
            return d + (((lamf0 >> 4) * (b + extra_bits)) >> 4)

        lev_ys, rec_ys = code(blk_b, pred_yb, qp, log2, max_tb=log2 - 1)
        lev_us, rec_us = code(blk_ub, pred_ub, qp_c, log2 - 1,
                              max_tb=log2 - 2)
        lev_vs, rec_vs = code(blk_vb, pred_vb, qp_c, log2 - 1,
                              max_tb=log2 - 2)
        cost_w = (rd_of(lev_y, rec_y, blk_b, 2)
                  + rd_of(lev_u, rec_u, blk_ub, 0)
                  + rd_of(lev_v, rec_v, blk_vb, 0))
        cost_s = (rd_of(lev_ys, rec_ys, blk_b, 2)
                  + rd_of(lev_us, rec_us, blk_ub, 0)
                  + rd_of(lev_vs, rec_vs, blk_vb, 0))
        sel_s = cost_s < cost_w
        trd = sel_s.astype(I32)
        sb = sel_s[:, None, None]
        lev_y = jnp.where(sb, lev_ys, lev_y)
        rec_y = jnp.where(sb, rec_ys, rec_y)
        lev_u = jnp.where(sb, lev_us, lev_u)
        rec_u = jnp.where(sb, rec_us, rec_u)
        lev_v = jnp.where(sb, lev_vs, lev_v)
        rec_v = jnp.where(sb, rec_vs, rec_v)

    # node RD cost for the quadtree split decision
    lamf = lam_full_t[qp]                            # scalar or (nb,)
    bits_lv = jnp.minimum(
        tables.level_bits_est(lev_y, xp=jnp).reshape(nb, -1).sum(axis=-1),
        16383)
    mvb = jnp.where(sel_k > 0,
                    jnp.asarray([0, MB_LEFT, MB_TOP, MB_ZERO], I32)[sel_k],
                    bits_q[jnp.abs(mvx)] + bits_q[jnp.abs(mvy)])
    ssd = jnp.sum((blk_b - rec_y) * (blk_b - rec_y), axis=(-1, -2))
    cost = ssd + (((lamf >> 4) * (bits_lv + mvb + 6)) >> 4)

    out = {}
    for k, t in (("lev_y", lev_y), ("rec_y", rec_y)):
        out[k] = t.reshape(nby, nbx, S, S)
    for k, t in (("lev_u", lev_u), ("lev_v", lev_v),
                 ("rec_u", rec_u), ("rec_v", rec_v)):
        out[k] = t.reshape(nby, nbx, S2, S2)
    for k, t in (("mvx", mvx), ("mvy", mvy), ("cost", cost),
                 ("trd", trd)):
        out[k] = t.reshape(nby, nbx)
    return out


def _p_stage_tail(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx, best_cost, *,
                  B, qp, qp_c, lam, search, me_precision, sign_hiding):
    """Subpel refinement + MC + residual coding, shared by the Pallas and
    XLA integer-search front ends (fixed CU = B grid)."""
    H, W = cur.shape
    nby, nbx = H // B, W // B
    B2 = B // 2
    e = _level_encode(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx, S=B, qp=qp,
                      qp_c=qp_c, lam=lam, search=search,
                      me_precision=me_precision, sign_hiding=sign_hiding)

    def to_plane(blocks):
        nb = blocks.shape[-1]
        return blocks.transpose(0, 2, 1, 3).reshape(nby * nb, nbx * nb)

    mvs = jnp.stack([e["mvx"], e["mvy"]], -1)
    lev_y = e["lev_y"]
    ly16 = lev_y.astype(jnp.int16)
    lu16 = e["lev_u"].astype(jnp.int16)
    lv16 = e["lev_v"].astype(jnp.int16)
    meta_packed = jnp.concatenate([mvs.reshape(-1), best_cost.reshape(-1)])
    lev_packed = jnp.concatenate([ly16.reshape(-1), lu16.reshape(-1),
                                  lv16.reshape(-1)])
    return dict(
        mvs=mvs,
        sad=best_cost,            # best integer ME cost (scene-change signal)
        lev_y=ly16, lev_u=lu16, lev_v=lv16,
        lev_packed=lev_packed,
        meta_packed=meta_packed,
        # ONE buffer for everything the host needs per P frame -> a single
        # fetch RPC (the tunnel's per-transfer latency dominates)
        wire=jnp.concatenate([
            lev_packed,
            jax.lax.bitcast_convert_type(meta_packed,
                                         jnp.int16).reshape(-1)]),
        recon_y=to_plane(e["rec_y"]).astype(jnp.uint8),
        recon_u=to_plane(e["rec_u"]).astype(jnp.uint8),
        recon_v=to_plane(e["rec_v"]).astype(jnp.uint8),
    )


def _me_hier(cur, ry, *, sizes, search, lam):
    """Hierarchical wide-window integer ME (search > HIER_THRESHOLD).

    TPU-native form of the reference's wide search window
    (hmr_private.h:76-77, +-128x+-64) without a dense (2R+1)^2 full-res
    sweep — a 3-level pyramid over box-summed planes (all pooling on the
    MXU via ops/blocksum):

      L2: dense sweep of +-R/4 offsets on 4:1-pooled planes;
      L0: full-res +-3 refine over BOTH the pyramid pick (per-block window
          gather — ONE gather per size; gathers cost per-slice overhead on
          TPU, so their count is minimised) and a zero-MV anchor whose 49
          costs come from static shifted-plane grids (no gather, shared
          across sizes by sum-pooling). 98 ordered candidates, zero-anchor
          first — the anchor keeps small true motion safe when pooled
          ranking misleads on high-frequency content.

    Every argmin takes the FIRST minimum in (candidate, dy, dx) raster
    order — bit-identical to p_golden.integer_search_hier. Returns
    {S: (ivy, ivx, icost)} with |mv| <= search + 3.
    """
    H, W = cur.shape
    R4 = search // 4
    n4 = 2 * R4 + 1
    P4 = PAD // 4
    H4, W4 = H // 4, W // 4

    # pooled pyramid planes as int16 (max cell sum 16*255 = 4080): the
    # sweeps below are HBM-bound, so plane width is the cost that matters
    cur4 = blocksum.block_sum(cur, 4, 4, xp=jnp).astype(jnp.int16)
    ry4 = blocksum.block_sum(ry, 4, 4, xp=jnp).astype(jnp.int16)
    cur16 = cur.astype(jnp.int16)

    def step(_, dyi):
        band = jax.lax.dynamic_slice(ry4, (P4 - R4 + dyi, 0),
                                     (H4, W4 + 2 * P4))

        def sad_dx(dxi):
            shifted = jax.lax.dynamic_slice(band, (0, P4 - R4 + dxi),
                                            (H4, W4))
            return jnp.abs(cur4 - shifted)            # int16, <= 4080

        diffs = jax.vmap(sad_dx)(jnp.arange(n4, dtype=I32))
        return None, blocksum.block_sum(diffs, 4, 4, xp=jnp)

    _, g = jax.lax.scan(step, None, jnp.arange(n4, dtype=I32))
    g16c = g.reshape(n4 * n4, H // 16, W // 16)     # coarse per-16 grids

    # zero-anchor grids: 49 full-res +-3 shifts, per-16-block sums (static
    # slices fuse into the surrounding jit — no per-block gather)
    z16 = _sad_grids(cur16, ry, S=16, search=3)     # (49, h16, w16)

    d4 = np.arange(-R4, R4 + 1)
    bits1 = _bits_tab(16 * R4)[np.abs(16 * d4)]
    bits2 = jnp.asarray(bits1[:, None] + bits1[None, :], I32)
    mvcost4 = ((lam * bits2) >> 8).reshape(-1)      # (n4*n4,) dy-major

    bits_f = jnp.asarray(_bits_tab(4 * search + 16), I32)

    def mvbits(vy, vx):
        return bits_f[jnp.abs(vy)] + bits_f[jnp.abs(vx)]

    zbits = jnp.asarray(
        [_bits_tab(28)[abs(4 * dy)] + _bits_tab(28)[abs(4 * dx)]
         for dy in range(-3, 4) for dx in range(-3, 4)], I32)
    zcost_off = ((lam * zbits) >> 8)                # (49,)

    def refine(size, vy, vx, zS, margin=3):
        """L0 +-3 refine over [zero anchor, (vy, vx) seed] at `size`.
        margin bounds |seed| beyond `search` (parent-seeded levels)."""
        nby, nbx = H // size, W // size
        nb = nby * nbx
        bi = jnp.arange(nb, dtype=I32)
        r = bi // nbx
        c = bi % nbx

        # zero-anchor candidate costs from the shared static grids
        zc = zS.reshape(49, nb) + zcost_off[:, None]

        # seed refine: ONE per-block window gather for this size
        blk = (cur16.reshape(nby, size, nbx, size).transpose(1, 3, 0, 2)
               .reshape(size, size, nb))
        win = _gather_win(
            ry, r * size + vy - 3 + PAD, c * size + vx - 3 + PAD,
            nby=nby, nbx=nbx, G=size + 6, S_row=size,
            lo=PAD - search - margin, band_h=2 * (search + margin) + size + 6)
        cost_l = [zc[di] for di in range(49)]       # zero anchor first
        for dy in range(-3, 4):
            for dx in range(-3, 4):
                pred = win[dy + 3:dy + 3 + size, dx + 3:dx + 3 + size, :]
                sad = jnp.abs(blk - pred).astype(I32).sum(axis=(0, 1))
                bb = mvbits(4 * (vy + dy), 4 * (vx + dx))
                cost_l.append(sad + ((lam * bb) >> 8))
        cost98 = jnp.stack(cost_l)                  # (98, nb), zero first
        j = jnp.argmin(cost98, axis=0).astype(I32)
        icost = jnp.min(cost98, axis=0)             # == cost at j
        # candidate geometry is arithmetic in j (zero anchor for j < 49,
        # seed + delta for j >= 49) — no gather needed
        jj = j % 49
        dy = jj // 7 - 3
        dx = jj % 7 - 3
        is_pyr = j >= 49
        ivy = jnp.where(is_pyr, vy + dy, dy).reshape(nby, nbx)
        ivx = jnp.where(is_pyr, vx + dx, dx).reshape(nby, nbx)
        return ivy, ivx, icost.reshape(nby, nbx)

    out = {}
    gS, zS = g16c, z16
    S = 16
    for size in sorted(s for s in sizes if s >= 16):
        while S < size:                             # pool coarse to size
            nn, py, px = gS.shape
            gS = gS.reshape(nn, py // 2, 2, px // 2, 2).sum(axis=(2, 4))
            zS = zS.reshape(49, py // 2, 2, px // 2, 2).sum(axis=(2, 4))
            S *= 2
        k = jnp.argmin(gS + mvcost4[:, None, None], axis=0).astype(I32)
        cy = 4 * (k // n4 - R4)                     # (nby, nbx) full-pel
        cx = 4 * (k % n4 - R4)
        out[size] = refine(size, cy.reshape(-1), cx.reshape(-1), zS)
    if 8 in sizes:
        # 8x8 CUs (depth below 16): seed each 8-block from its parent
        # 16-block's integer pick and refine +-3 against the zero anchor —
        # same candidate ordering as the coarser levels.
        ivy16, ivx16, _ = out[16]
        # clip the seed so the refined MV keeps the coarser levels' bound
        # (|mv| <= search + 3, inside the PAD'd plane + interp support)
        vy8 = jnp.clip(jnp.repeat(jnp.repeat(ivy16, 2, 0), 2, 1),
                       -search, search).reshape(-1)
        vx8 = jnp.clip(jnp.repeat(jnp.repeat(ivx16, 2, 0), 2, 1),
                       -search, search).reshape(-1)
        z8 = _sad_grids(cur16, ry, S=8, search=3)
        out[8] = refine(8, vy8, vx8, z8)
    return out


def _sad_grids(cur16, ry, *, S, search):
    """Full SAD grid per S-block: (n*n, H//S, W//S), dy-major offset order
    (identical raster semantics to the fixed-grid search)."""
    H, W = cur16.shape
    nby, nbx = H // S, W // S
    n = 2 * search + 1

    def step(_, dyi):
        row_band = jax.lax.dynamic_slice(ry, (PAD - search + dyi, 0),
                                         (H, W + 2 * PAD))

        def sad_dx(dxi):
            shifted = jax.lax.dynamic_slice(
                row_band, (0, PAD - search + dxi), (H, W)).astype(jnp.int16)
            return jnp.abs(cur16 - shifted)

        diffs = jax.vmap(sad_dx)(jnp.arange(n, dtype=I32))
        return None, blocksum.block_sum(diffs, S, S, xp=jnp)

    _, g = jax.lax.scan(step, None, jnp.arange(n, dtype=I32))
    return g.reshape(n * n, nby, nbx)               # (nn, nby, nbx)


def _p_stage_tree(y_pad, u_pad, v_pad, ry, ru, rv, *, ctu: int, qp,
                  search: int, me_precision: int, sign_hiding: bool,
                  tr_split: bool = False, intra_in_p: bool = False,
                  qp_rows=None, vis=None, wpp: bool = False,
                  cu8: bool = False):
    """Inter CU quadtree P stage (CTU -> ... -> 16, PU = TU = CU).

    TPU-first hierarchical ME: ONE 16-granular SAD grid sweep; parent
    levels are 2x2 sum-pools of the child grids (SAD additivity), so the
    64/32 searches are nearly free. Every level is then subpel-refined and
    residual-coded batched, and the split choice is a dense masked select —
    the whole-frame generalisation of the reference's per-CU recursive
    motion_inter decision (hmr_motion_inter.c:2471-2604)."""
    H, W = y_pad.shape
    qp = jnp.asarray(qp, I32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam = jnp.asarray(tables.LAMBDA_ME_FX_P)[qp]
    lamf = jnp.asarray(tables.LAMBDA_FX_P)[qp]
    cur = y_pad.astype(I32)
    sizes = ([8] if cu8 else []) + [16, 32] + ([64] if ctu == 64 else [])

    if search > HIER_THRESHOLD:
        me = _me_hier(cur, ry, sizes=sizes, search=search, lam=lam)
        ints = {S: me[S] for S in sizes}
    else:
        n = 2 * search + 1
        bits1 = _bits_tab(4 * search)[
            np.abs(4 * np.arange(-search, search + 1))]
        bits2 = jnp.asarray(bits1[:, None] + bits1[None, :], I32)
        mvcost = ((lam * bits2) >> 8).reshape(-1)   # (n*n,) dy-major

        grids = {16: _sad_grids(cur.astype(jnp.int16), ry, S=16,
                                search=search)}
        if cu8:
            grids[8] = _sad_grids(cur.astype(jnp.int16), ry, S=8,
                                  search=search)
        S = 32
        while S <= ctu:
            prev = grids[S // 2]
            nn, py, px = prev.shape
            grids[S] = prev.reshape(nn, py // 2, 2, px // 2,
                                    2).sum(axis=(2, 4))
            S *= 2
        ints = {}
        for S in grids:
            cost = grids[S] + mvcost[:, None, None]
            k = jnp.argmin(cost, axis=0).astype(I32)  # first min, dy-major
            icost = jnp.min(cost, axis=0)
            ints[S] = (k // n - search, k % n - search, icost)

    enc = {}
    for S in sizes:
        ivy, ivx, icost = ints[S]
        enc[S] = _level_encode(cur, u_pad, v_pad, ry, ru, rv, ivy, ivx,
                               S=S, qp=qp, qp_c=qp_c, lam=lam, search=search,
                               me_precision=me_precision,
                               sign_hiding=sign_hiding,
                               tr_split=tr_split, qp_rows=qp_rows, vis=vis)
        enc[S]["icost"] = icost

    def sum4(a):
        py, px = a.shape
        return a.reshape(py // 2, 2, px // 2, 2).sum(axis=(1, 3))

    ov = ((lamf >> 4) * 10) >> 4                    # split overhead proxy
    if cu8:
        # deepest level: four 8x8 CUs vs one 16 (role of the reference's
        # PART_NxN inter evaluation at max depth, hmr_motion_inter.c:2507
        # — with min_cu 8 in the SPS, spec 7.4.9.5 forbids inter PART_NxN,
        # so four 8x8 2Nx2N CUs carry the same 4-MVs-per-16x16 role)
        c8s = sum4(enc[8]["cost"]) + ov
        split16 = c8s < enc[16]["cost"]
        c16eff = jnp.where(split16, c8s, enc[16]["cost"])
    else:
        c16eff = enc[16]["cost"]
    c16s = sum4(c16eff) + ov
    split32 = c16s < enc[32]["cost"]
    c32eff = jnp.where(split32, c16s, enc[32]["cost"])
    if ctu == 64:
        c32s = sum4(c32eff) + ov
        split64 = c32s < enc[64]["cost"]

    def upu(a, S):                                  # block grid -> unit grid
        r = S // 4
        return jnp.repeat(jnp.repeat(a, r, axis=0), r, axis=1)

    if ctu == 64:
        m64 = upu(split64, 64)
        m32 = upu(split32, 32)
        depth_u = jnp.where(~m64, 0, jnp.where(~m32, 1, 2)).astype(I32)
    else:
        depth_u = jnp.where(upu(split32, 32), 1, 0).astype(I32)
    if cu8:
        deepest = depth_u == (2 if ctu == 64 else 1)
        depth_u = jnp.where(deepest & upu(split16, 16), depth_u + 1,
                            depth_u)

    def mv_units(e, S):
        return jnp.stack([upu(e["mvx"], S), upu(e["mvy"], S)], -1)

    def cbf_units(e, S):
        lv = e["lev_y"]
        if S == 64:                                 # TU = 32 inside a 64 CU
            nby, nbx = lv.shape[:2]
            c = jnp.any(lv.reshape(nby, nbx, 2, 32, 2, 32) != 0, axis=(3, 5))
            c = c.transpose(0, 2, 1, 3).reshape(nby * 2, nbx * 2)
            return upu(c, 32)
        return upu(jnp.any(lv != 0, axis=(-1, -2)), S)

    def sel_u(vals):                                # {S: unit arr} by depth
        d16 = 2 if ctu == 64 else 1                 # depth of the 16 level
        if ctu == 64:
            out = jnp.where((depth_u == 0) if vals[64].ndim == 2
                            else (depth_u == 0)[..., None], vals[64], vals[32])
            out = jnp.where((depth_u <= 1) if vals[16].ndim == 2
                            else (depth_u <= 1)[..., None], out, vals[16])
        else:
            out = jnp.where((depth_u == 0) if vals[32].ndim == 2
                            else (depth_u == 0)[..., None], vals[32], vals[16])
        if cu8:
            deep = depth_u > d16
            out = jnp.where(deep if vals[8].ndim == 2 else deep[..., None],
                            vals[8], out)
        return out

    mv_u = sel_u({S: mv_units(e, S) for S, e in enc.items()})
    cbf_u = sel_u({S: cbf_units(e, S) for S, e in enc.items()})
    # explicit inter TU split map: only 32-CUs carry a depth-1 residual
    # quadtree (trd from _level_encode's per-CU RD select)
    d32 = 0 if ctu == 32 else 1
    trd_u = (upu(enc[32]["trd"], 32) * (depth_u == d32)).astype(I32) \
        if tr_split else jnp.zeros_like(depth_u)

    def to_plane(blocks):
        nby, nbx, nb, _ = blocks.shape
        return blocks.transpose(0, 2, 1, 3).reshape(nby * nb, nbx * nb)

    def sel_plane(key, sub):                        # sub: 4 luma, 2 chroma
        d_px = jnp.repeat(jnp.repeat(depth_u, sub, axis=0), sub, axis=1)
        ps = {S: to_plane(e[key]) for S, e in enc.items()}
        d16 = 2 if ctu == 64 else 1
        if ctu == 64:
            out = jnp.where(d_px == 0, ps[64], ps[32])
            out = jnp.where(d_px <= 1, out, ps[16])
        else:
            out = jnp.where(d_px == 0, ps[32], ps[16])
        if cu8:
            out = jnp.where(d_px > d16, ps[8], out)
        return out

    lev_yp = sel_plane("lev_y", 4)
    lev_up = sel_plane("lev_u", 2)
    lev_vp = sel_plane("lev_v", 2)
    rec = (sel_plane("rec_y", 4), sel_plane("rec_u", 2),
           sel_plane("rec_v", 2))

    pred_intra_u = jnp.zeros_like(depth_u)
    if intra_in_p and ctu == 32:
        # ---- per-CU intra fallback (role of hmr_motion_inter.c:4005) ----
        # Candidates: whole CTUs whose best intra-32 encode (11-mode fast
        # battery, refs from the PRE-DEBLOCK inter reconstruction with the
        # decoder's exact z-scan availability clips) beats the tree's
        # chosen inter cost. Acceptance runs a 4-color cascade so that no
        # accepted CU's reference ring touches another accepted CU — every
        # neighbor an accepted intra CU predicts from therefore keeps its
        # inter reconstruction, and the batched (order-free) encode is
        # bit-exact with the decoder's sequential one.
        from ..ops import intra as intra_ops
        nby, nbx = H // 32, W // 32
        recy, recu, recv = rec
        MODES = (0, 1, 2, 6, 10, 14, 18, 22, 26, 30, 34)
        ar64 = jnp.arange(64)
        rr = jnp.arange(nby)
        cc = jnp.arange(nbx)
        topv = recy[jnp.maximum(rr * 32 - 1, 0)[:, None, None],
                    jnp.clip(cc[None, :, None] * 32 + ar64[None, None],
                             0, W - 1)]
        leftv = recy[jnp.clip(rr[:, None, None] * 32
                              + jnp.minimum(ar64, 31)[None, None], 0, H - 1),
                     jnp.maximum(cc[None, :, None] * 32 - 1, 0)]
        cornr = recy[jnp.maximum(rr * 32 - 1, 0)[:, None],
                     jnp.maximum(cc[None] * 32 - 1, 0)]
        hl = jnp.broadcast_to(cc[None] > 0, (nby, nbx))
        ht = jnp.broadcast_to(rr[:, None] > 0, (nby, nbx))
        blocks = cur.reshape(nby, 32, nbx, 32).transpose(0, 2, 1, 3)

        def one(o, t, l, co, h_l, h_t, qp_r):
            # Two-stage mode decision (role of the reference's loop1 SAD
            # search -> loop2 full RD, hmr_motion_intra.c:1084/:1229):
            # stage 1 ranks the 11-mode battery by SAD (prediction only —
            # no transform work), stage 2 full-codes ONLY the top 2, then
            # the winner is re-coded with SBH. Full-coding all 11 measured
            # ~16 ms/frame of the 720p chunk body; 2 candidates keep the
            # pick in practice (SAD ranking and RD ranking of intra modes
            # agree except between near-tied neighbors).
            refs = intra_ops.prepare_refs(t, l, co, h_l, h_t, size=32,
                                          c_idx=0, strong_smoothing=True)
            preds11 = intra_ops.predict_all_modes(*refs, size=32, c_idx=0)
            preds11 = preds11[jnp.asarray(MODES)]
            sad11 = jnp.abs(o[None] - preds11).sum(axis=(-1, -2))
            nm = len(MODES)
            am = jnp.arange(nm, dtype=I32)
            k1 = jnp.argmin(sad11).astype(I32)
            sad_2 = jnp.where(am == k1, jnp.int32(1 << 30), sad11)
            k2 = jnp.argmin(sad_2).astype(I32)

            def gath(k):
                oh = (am == k).reshape(nm, 1, 1)
                return jnp.sum(jnp.where(oh, preds11, 0), axis=0)

            preds = jnp.stack([gath(k1), gath(k2)])       # (2, 32, 32)
            mode_c = jnp.stack([k1, k2])
            resid = o[None] - preds
            coeff = tx_ops.forward_transform(resid)
            lev = quant_ops.quantize(coeff, qp_r, 5, is_intra=True)
            rr_ = tx_ops.inverse_transform(
                quant_ops.dequantize(lev, qp_r, 5))
            nz_ = jnp.any(lev != 0, axis=(-1, -2))
            rr_ = jnp.where(nz_[:, None, None], rr_, 0)
            rec_ = jnp.clip(preds + rr_, 0, 255)
            ssd = jnp.sum((o[None] - rec_) * (o[None] - rec_), axis=(-1, -2))
            bits = jnp.minimum(tables.level_bits_est(lev, xp=jnp), 16383)
            cost = ssd + (((lamf >> 4) * (bits + 8)) >> 4)
            k = jnp.argmin(cost)
            oh = jnp.arange(2, dtype=I32) == k            # one-hot select

            def sel(t):
                return jnp.sum(
                    jnp.where(oh.reshape((-1,) + (1,) * (t.ndim - 1)), t, 0),
                    axis=0)

            cost_k = jnp.min(cost)
            mode_k = jnp.asarray(MODES, I32)[
                jnp.sum(jnp.where(oh, mode_c, 0))]
            pred_k = sel(preds)
            lev_k = sel(lev)
            if sign_hiding:
                lev_k = quant_ops.sign_bit_hiding(lev_k, sel(coeff), qp_r, 5)
                rr_k = tx_ops.inverse_transform(
                    quant_ops.dequantize(lev_k, qp_r, 5))
                rr_k = jnp.where(jnp.any(lev_k != 0), rr_k, 0)
                rec_k = jnp.clip(pred_k + rr_k, 0, 255)
            else:
                rec_k = sel(rec_)
            return (mode_k, cost_k, lev_k, rec_k)

        qp_row_v = (qp_rows if qp_rows is not None
                    else jnp.broadcast_to(qp, (nby,)))
        # ONE flat vmap over all nby*nbx CUs (a lax.map over rows serializes
        # nby sequential device steps — measured 76 ms/frame at 720p; the
        # flat batch is ~2 ms)
        nb_all = nby * nbx
        qp_blk = jnp.broadcast_to(qp_row_v[:, None], (nby, nbx)).reshape(-1)
        # Worst-N gating (role of the reference's per-CU intra-test gating
        # by perf mode / CU size / SAD, hmr_motion_inter.c:4005-4034): run
        # the intra battery only on the N CTUs with the worst inter RD cost
        # — intra can only win where inter is poor. Full-frame batteries
        # measured ~11.5 ms/frame of the 720p chunk body; N=128 of 920
        # covers every occlusion/scene-content case seen in practice while
        # cutting the battery cost ~7x. lax.top_k is stable (ties keep the
        # lower index) so the stream stays deterministic.
        n_sel = min(nb_all, max(128, nb_all // 8))
        _, sel_idx = jax.lax.top_k(c32eff.reshape(-1), n_sel)
        gsel = lambda a: jnp.take(a, sel_idx, axis=0)
        im_s, icst_s, ilev_s, irec_s = jax.vmap(one)(
            gsel(blocks.reshape(nb_all, 32, 32)),
            gsel(topv.reshape(nb_all, -1)),
            gsel(leftv.reshape(nb_all, -1)), gsel(cornr.reshape(-1)),
            gsel(hl.reshape(-1)), gsel(ht.reshape(-1)), gsel(qp_blk))
        BIGI = jnp.int32(1 << 30)
        im = jnp.zeros((nb_all,), I32).at[sel_idx].set(im_s).reshape(
            nby, nbx)
        icst = jnp.full((nb_all,), BIGI, I32).at[sel_idx].set(
            icst_s).reshape(nby, nbx)
        ilev = jnp.zeros((nb_all, 32, 32), ilev_s.dtype).at[sel_idx].set(
            ilev_s).reshape(nby, nbx, 32, 32)
        irec = jnp.zeros((nb_all, 32, 32), irec_s.dtype).at[sel_idx].set(
            irec_s).reshape(nby, nbx, 32, 32)

        cand = icst < c32eff
        # 4-color cascade: color k accepts only if no earlier-color accept
        # touches its ring (left/top/diagonals); same-color CUs never share
        # a ring, so acceptance order inside a color is irrelevant.
        col = (rr[:, None] % 2) * 2 + (cc[None] % 2)
        acc = jnp.zeros((nby, nbx), bool)

        def ring(m):
            # symmetric 8-neighborhood: an accept must neither read another
            # accept's region nor sit inside an earlier accept's ref ring
            p = jnp.pad(m, 1)
            return (p[:-2, :-2] | p[:-2, 1:-1] | p[:-2, 2:]
                    | p[1:-1, :-2] | p[1:-1, 2:]
                    | p[2:, :-2] | p[2:, 1:-1] | p[2:, 2:])
        for k in range(4):
            acc = acc | (cand & (col == k) & ~ring(acc))

        # chroma DM encode for accepted CUs (one mode, 16x16)
        ar32 = jnp.arange(32)

        def chroma_one(o, t, l, co, h_l, h_t, m, qp_r):
            from .intra_jax import _encode_block_one_mode
            from .. import tables as _t
            return _encode_block_one_mode(
                o, t, l, co, h_l, h_t, m, size=16, c_idx=1,
                qp=_t.chroma_qp_from_luma(qp_r, xp=jnp),
                lam_fx=jnp.asarray(_t.LAMBDA_FX_P)[qp_r],
                strong_smoothing=False, sign_hiding=sign_hiding)

        outs_c = []
        for rc_c, plane_c in ((recu, u_pad), (recv, v_pad)):
            W2, H2 = W // 2, H // 2
            topc = rc_c[jnp.maximum(rr * 16 - 1, 0)[:, None, None],
                        jnp.clip(cc[None, :, None] * 16 + ar32[None, None],
                                 0, W2 - 1)]
            leftc = rc_c[jnp.clip(rr[:, None, None] * 16
                                  + jnp.minimum(ar32, 15)[None, None], 0,
                                  H2 - 1),
                         jnp.maximum(cc[None, :, None] * 16 - 1, 0)]
            corc = rc_c[jnp.maximum(rr * 16 - 1, 0)[:, None],
                        jnp.maximum(cc[None] * 16 - 1, 0)]
            blkc = (plane_c.astype(I32).reshape(nby, 16, nbx, 16)
                    .transpose(0, 2, 1, 3))
            lvc_s, rcc_s = jax.vmap(chroma_one)(
                gsel(blkc.reshape(nb_all, 16, 16)),
                gsel(topc.reshape(nb_all, -1)),
                gsel(leftc.reshape(nb_all, -1)), gsel(corc.reshape(-1)),
                gsel(hl.reshape(-1)), gsel(ht.reshape(-1)),
                gsel(im.reshape(-1)), gsel(qp_blk))
            lvc = jnp.zeros((nb_all, 16, 16), lvc_s.dtype).at[sel_idx].set(
                lvc_s).reshape(nby, nbx, 16, 16)
            rcc = jnp.zeros((nb_all, 16, 16), rcc_s.dtype).at[sel_idx].set(
                rcc_s).reshape(nby, nbx, 16, 16)
            outs_c.append((lvc, rcc))

        # ---- substitution of accepted CTUs ----
        def sub_plane(plane, blocks_new, S):
            bn = blocks_new.transpose(0, 2, 1, 3).reshape(H * S // 32,
                                                          W * S // 32)
            m = jnp.repeat(jnp.repeat(acc, S, 0), S, 1)
            return jnp.where(m, bn, plane)

        lev_yp = sub_plane(lev_yp, ilev, 32)
        recy = sub_plane(recy, irec, 32)
        lev_up = sub_plane(lev_up, outs_c[0][0], 16)
        recu = sub_plane(recu, outs_c[0][1], 16)
        lev_vp = sub_plane(lev_vp, outs_c[1][0], 16)
        recv = sub_plane(recv, outs_c[1][1], 16)
        rec = (recy, recu, recv)
        accu = upu(acc, 32)
        pred_intra_u = accu.astype(I32)
        depth_u = jnp.where(accu, 0, depth_u)
        trd_u = jnp.where(accu, 0, trd_u)
        # intra units carry the luma mode in the mv slot of the wire; the
        # motion field marks them intra (unavailable) for the host walk
        imode_u = upu(im, 32)
        mv_u = jnp.where(accu[..., None],
                         jnp.stack([imode_u, jnp.zeros_like(imode_u)], -1),
                         mv_u)
        cbf_u = jnp.where(accu, upu(jnp.any(ilev != 0, axis=(-1, -2)), 32),
                          cbf_u)

    if tr_split:
        # TB-granular luma cbf for deblocking: split CUs deblock their
        # interior TU edges from per-16 coefficient presence
        h16, w16 = H // 16, W // 16
        nz16 = jnp.any(lev_yp.reshape(h16, 16, w16, 16) != 0, axis=(1, 3))
        nz16_u = upu(nz16, 16)
        cbf_u = jnp.where(trd_u.astype(bool), nz16_u, cbf_u)

    # per-unit any-nonzero (Y | Cb | Cr) for the host's skip derivation
    uh, uw = H // 4, W // 4
    nz_y = jnp.any(lev_yp.reshape(uh, 4, uw, 4) != 0, axis=(1, 3))
    nz_u = jnp.any(lev_up.reshape(uh, 2, uw, 2) != 0, axis=(1, 3))
    nz_v = jnp.any(lev_vp.reshape(uh, 2, uw, 2) != 0, axis=(1, 3))
    nz = (nz_y | nz_u | nz_v).astype(I32)

    ly16 = lev_yp.astype(jnp.int16)
    lu16 = lev_up.astype(jnp.int16)
    lv16 = lev_vp.astype(jnp.int16)
    lev_packed = jnp.concatenate([ly16.reshape(-1), lu16.reshape(-1),
                                  lv16.reshape(-1)])
    # Decoded-QP maps. Syntax side (qp_ctu, per CTB == QG): the row target
    # where the QG codes a cu_qp_delta, else the predicted QP — qPY_PREV
    # resets to SliceQpY at each CTB-row start (spec 8.6.1 entropy sync;
    # verified against libde265 with a crafted uncoded-leading-QG stream).
    # Deblock side (qp16, per 16-block): libde265 assigns QP PER CU at
    # parse time, so CUs that decode BEFORE the QG's first coded CU (in
    # z-order) keep the PREDICTION while later CUs carry the target — the
    # per-CU granularity matters for deblock tc/beta at CU edges.
    nby_c, nbx_c = H // ctu, W // ctu
    h16, w16 = H // 16, W // 16
    if qp_rows is not None:
        cbf_ctu = (nz.reshape(nby_c, ctu // 4, nbx_c, ctu // 4)
                   .any(axis=(1, 3)))
        row_t = jnp.repeat(qp_rows[:, None]
                           if qp_rows.shape[0] == nby_c else
                           jnp.broadcast_to(qp, (nby_c, 1)), nbx_c, 1)
        # prediction seen STRICTLY-BEFORE each CTB in its row
        seen_excl = (jnp.cumsum(cbf_ctu.astype(I32), axis=1)
                     - cbf_ctu.astype(I32)) > 0
        if wpp:
            # qPY_PREV resets to SliceQpY at each CTB-row start (8.6.1
            # entropy sync)
            pred_row0 = jnp.broadcast_to(jnp.asarray(qp, I32), (nby_c,))
        else:
            # no reset: the chain carries the last coded row's target
            # across row boundaries (slice QP before any coded QG)
            any_row = cbf_ctu.any(axis=1)

            def carry_body(carry, x):
                rt_r, has_r = x
                return jnp.where(has_r, rt_r, carry), carry

            _, pred_row0 = jax.lax.scan(
                carry_body, jnp.asarray(qp, I32).reshape(()),
                (row_t[:, 0], any_row))
        pred_ctb = jnp.where(seen_excl, row_t, pred_row0[:, None])
        qp_ctu_final = jnp.where(cbf_ctu, row_t, pred_ctb)

        # --- per-16-block z-order model for deblock ---
        k = ctu // 16
        nz16g = jnp.any(lev_yp.reshape(h16, 16, w16, 16) != 0, axis=(1, 3))
        nz16g = nz16g | jnp.any(
            lev_up.reshape(h16, 8, w16, 8) != 0, axis=(1, 3)) | jnp.any(
            lev_vp.reshape(h16, 8, w16, 8) != 0, axis=(1, 3))
        d16 = depth_u[::4, ::4]                  # depth per 16-block
        # Morton z of each 16-block within its CTB
        byk = (np.arange(h16) % k)[:, None]
        bxk = (np.arange(w16) % k)[None, :]
        zv = np.zeros((h16, w16), np.int32)
        for b in range(8):
            zv |= (((byk >> b) & 1) << (2 * b + 1)) | (((bxk >> b) & 1)
                                                       << (2 * b))
        zval = jnp.asarray(zv)
        # CU size per block in 16-units: m = (ctu >> depth) / 16
        m = jnp.maximum((ctu >> d16) // 16, 1)
        cu_base = zval & ~(m * m - 1)            # z of the CU's first block
        # cu_coded: any nz16 within the CU — max-pool nz over each CU via
        # per-depth pools and select by depth
        cu_coded = nz16g
        pool = nz16g
        size_blk = 1
        while size_blk < k:
            size_blk *= 2
            pool = (pool.reshape(h16 // size_blk, size_blk,
                                 w16 // size_blk, size_blk)
                    .any(axis=(1, 3)))
            up = jnp.repeat(jnp.repeat(pool, size_blk, 0), size_blk, 1)
            cu_coded = jnp.where(m == size_blk, up, cu_coded)
        BIGZ = jnp.int32(1 << 20)
        firstz = jnp.where(cu_coded, cu_base, BIGZ)
        firstz = (firstz.reshape(nby_c, k, nbx_c, k).min(axis=(1, 3)))
        firstz16 = jnp.repeat(jnp.repeat(firstz, k, 0), k, 1)
        pred16 = jnp.repeat(jnp.repeat(pred_ctb, k, 0), k, 1)
        rowt16 = jnp.repeat(jnp.repeat(row_t, k, 0), k, 1)
        qp16 = jnp.where(cu_base >= firstz16, rowt16, pred16)
    else:
        qp_ctu_final = jnp.broadcast_to(jnp.asarray(qp, I32),
                                        (nby_c, nbx_c))
        qp16 = jnp.broadcast_to(jnp.asarray(qp, I32), (h16, w16))
    meta_packed = jnp.concatenate([depth_u.reshape(-1), mv_u.reshape(-1),
                                   nz.reshape(-1), trd_u.reshape(-1),
                                   pred_intra_u.reshape(-1),
                                   enc[ctu]["icost"].reshape(-1)])
    return dict(
        depth_u=depth_u, mv_u=mv_u, cbf_u=cbf_u, trd_u=trd_u,
        pred_intra_u=pred_intra_u, qp_ctu=qp_ctu_final, qp16=qp16,
        sad=enc[ctu]["icost"],
        lev_y=ly16, lev_u=lu16, lev_v=lv16,
        lev_packed=lev_packed,
        meta_packed=meta_packed,
        wire=jnp.concatenate([
            lev_packed,
            jax.lax.bitcast_convert_type(meta_packed,
                                         jnp.int16).reshape(-1)]),
        recon_y=rec[0].astype(jnp.uint8),
        recon_u=rec[1].astype(jnp.uint8),
        recon_v=rec[2].astype(jnp.uint8),
    )


@functools.partial(jax.jit,
                   static_argnames=("ctu", "search", "me_precision",
                                    "deblock", "sign_hiding", "tr_split",
                                    "intra_in_p", "vis", "wpp", "cu8"))
def p_frame_tree_device(y_pad, u_pad, v_pad, ref_y, ref_u, ref_v, *,
                        ctu: int, qp, search: int, me_precision: int,
                        deblock: bool = False, sign_hiding: bool = False,
                        tr_split: bool = False, intra_in_p: bool = False,
                        qp_rows=None, vis=None, wpp: bool = False,
                        cu8: bool = False):
    """Quadtree P frame, all device: hierarchical ME + per-level coding +
    split select (+ on-device deblock of the selected reconstruction)."""
    H, W = y_pad.shape
    ry = jnp.pad(ref_y.astype(jnp.int16), PAD, mode="edge")
    ru = jnp.pad(ref_u.astype(jnp.int16), PAD // 2, mode="edge")
    rv = jnp.pad(ref_v.astype(jnp.int16), PAD // 2, mode="edge")
    result = _p_stage_tree(y_pad, u_pad, v_pad, ry, ru, rv, ctu=ctu, qp=qp,
                           search=search, me_precision=me_precision,
                           sign_hiding=sign_hiding, tr_split=tr_split,
                           intra_in_p=intra_in_p, qp_rows=qp_rows, vis=vis,
                           wpp=wpp, cu8=cu8)
    if deblock:
        from ..ops import deblock as dbk
        ctu_log2 = ctu.bit_length() - 1
        bs_v, bs_h = dbk.inter_bs_from_units(
            result["depth_u"], result["mv_u"], result["cbf_u"],
            ctu_log2, xp=jnp, trd_u=result["trd_u"],
            intra_u=result["pred_intra_u"])
        qp_map = jnp.repeat(jnp.repeat(result["qp16"], 4, 0), 4, 1)
        fy, fu, fv = dbk.deblock_frame(
            result["recon_y"].astype(I32), result["recon_u"].astype(I32),
            result["recon_v"].astype(I32),
            bs_v=bs_v, bs_h=bs_h, qp_map=qp_map, xp=jnp)
        result["ref_y"] = fy.astype(jnp.uint8)
        result["ref_u"] = fu.astype(jnp.uint8)
        result["ref_v"] = fv.astype(jnp.uint8)
    return result


@functools.partial(jax.jit,
                   static_argnames=("B", "search", "me_precision", "deblock",
                                    "sign_hiding"))
def p_frame_device(y_pad, u_pad, v_pad, ref_y, ref_u, ref_v, *, B: int,
                   qp, search: int, me_precision: int,
                   deblock: bool = False, sign_hiding: bool = False):
    H, W = y_pad.shape
    ry = jnp.pad(ref_y.astype(jnp.int16), PAD, mode="edge")
    ru = jnp.pad(ref_u.astype(jnp.int16), PAD // 2, mode="edge")
    rv = jnp.pad(ref_v.astype(jnp.int16), PAD // 2, mode="edge")
    result = _p_stage(y_pad, u_pad, v_pad, ry, ru, rv, B=B, qp=qp,
                      search=search, me_precision=me_precision,
                      sign_hiding=sign_hiding)
    mvs = result["mvs"]
    lev_y = result["lev_y"]
    rec = (result["recon_y"].astype(I32), result["recon_u"].astype(I32),
           result["recon_v"].astype(I32))
    if deblock:
        # On-device loop filter: the deblocked planes are the reference for
        # the next frame AND the decoder-side output — they never need to
        # leave the device between P frames.
        from ..ops import deblock as dbk
        cbf_blk = jnp.any(lev_y != 0, axis=(-1, -2))
        qcbf = None
        if B == 64:
            nby, nbx = cbf_blk.shape
            qcbf = jnp.any(lev_y.reshape(nby, nbx, 2, 32, 2, 32) != 0,
                           axis=(3, 5))
        bs_v, bs_h = dbk.inter_bs_from_blocks(mvs, cbf_blk, B, xp=jnp,
                                              qcbf=qcbf)
        qp_map = jnp.full((H // 4, W // 4), qp, jnp.int32)
        fy, fu, fv = dbk.deblock_frame(rec[0], rec[1], rec[2],
                                       bs_v=bs_v, bs_h=bs_h, qp_map=qp_map,
                                       xp=jnp)
        result["ref_y"] = fy.astype(jnp.uint8)
        result["ref_u"] = fu.astype(jnp.uint8)
        result["ref_v"] = fv.astype(jnp.uint8)
    return result


@functools.partial(jax.jit, static_argnames=("B",))
def deblock_intra_device(rec_y, rec_u, rec_v, *, B: int, qp,
                         depth_units=None, trd_units=None):
    """On-device deblocking of an all-intra frame. `depth_units` is the
    unit-granular CU depth map relative to 32-containers (TU = 32 >> depth);
    None = uniform CU=TU=B grid. trd_units marks split_transform_flag CUs
    (TU one level finer)."""
    from ..ops import deblock as dbk
    H, W = rec_y.shape
    if depth_units is None:
        bs_v, bs_h = dbk.intra_edge_maps(H, W, min(B, 32))
        bs_v, bs_h = jnp.asarray(bs_v), jnp.asarray(bs_h)
    else:
        bs_v, bs_h = dbk.intra_bs_from_depth_units(depth_units, xp=jnp,
                                                   trd_u=trd_units)
    qp_map = jnp.full((H // 4, W // 4), jnp.asarray(qp, jnp.int32))
    fy, fu, fv = dbk.deblock_frame(rec_y.astype(jnp.int32),
                                   rec_u.astype(jnp.int32),
                                   rec_v.astype(jnp.int32),
                                   bs_v=bs_v, bs_h=bs_h,
                                   qp_map=qp_map, xp=jnp)
    return fy.astype(jnp.uint8), fu.astype(jnp.uint8), fv.astype(jnp.uint8)


def encode_p_frame(y, u, v, ref_planes, *, qp: int, ctu_log2: int = 5,
                   search: int = 16, me_precision: int = 2,
                   max_merge_cand: int = 5) -> PFramePlan:
    """Device stage A + shared host stage B; same signature/result as
    p_golden.encode_p_frame."""
    B = 1 << ctu_log2
    out = p_frame_device(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                         jnp.asarray(ref_planes[0]),
                         jnp.asarray(ref_planes[1]),
                         jnp.asarray(ref_planes[2]),
                         B=B, qp=qp, search=search,
                         me_precision=me_precision)
    recon = (np.asarray(out["recon_y"]), np.asarray(out["recon_u"]),
             np.asarray(out["recon_v"]))
    return build_p_plans(np.asarray(out["mvs"]), np.asarray(out["lev_y"]),
                         np.asarray(out["lev_u"]), np.asarray(out["lev_v"]),
                         recon, size=B, max_merge_cand=max_merge_cand)
