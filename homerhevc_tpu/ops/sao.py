"""Sample Adaptive Offset (spec 7.3.8.3 syntax, 8.7.3 application).

Role of the reference's hmr_sao.c (/root/reference/src/homer_lib/hmr_sao.c:
75-349 stats, 439-619 offset derivation, 960-1210 application,
1295 block-param decision), re-designed as whole-frame tensor passes:
edge-index maps and band indices are computed for the full picture at once,
per-CTU statistics fall out of reshape-reductions, and the offset/type
search is a small vectorized RD sweep over all CTUs simultaneously.

Parameters per CTU (struct-of-arrays over the (nby, nbx) CTU grid):
  type_*:   0 = off, 1 = band (BO), 2 = edge (EO)
  eo_class: 0 hor, 1 ver, 2 135deg, 3 45deg       (luma / shared chroma)
  band_pos: first of 4 consecutive bands           (per component)
  offsets:  4 signed applied offsets               (per component)
  merge_left / merge_up: params copied from neighbor CTU (encoder sets
  these only when the params are identical, which keeps application simple)

Encoder-side estimation is numpy (host); application is xp-generic so the
decoder-identical SAO filter can run on device for the reference loop.
"""

from __future__ import annotations

import numpy as np

# EO neighbor offsets per class (hPos/vPos, spec Table 8-16).
EO_NEIGHBORS = {
    0: ((0, -1), (0, 1)),        # horizontal
    1: ((-1, 0), (1, 0)),        # vertical
    2: ((-1, -1), (1, 1)),       # 135 degrees
    3: ((-1, 1), (1, -1)),       # 45 degrees
}

MAX_OFFSET = 7                   # (1 << (Min(bitDepth,10)-5)) - 1 for 8-bit


def edge_idx_map(rec, eo_class: int, xp=np):
    """edgeIdx in 0..4 per pixel (2 = no category); border pixels whose
    neighbor would fall outside the picture get 2 (unmodified)."""
    H, W = rec.shape
    r = rec.astype(xp.int32)
    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[eo_class]

    def shifted(dy, dx):
        return xp.roll(xp.roll(r, -dy, axis=0), -dx, axis=1)

    idx = (2 + xp.sign(r - shifted(dy0, dx0))
           + xp.sign(r - shifted(dy1, dx1))).astype(xp.int32)
    # invalidate borders touched by either neighbor
    ys, xs = xp.arange(H), xp.arange(W)
    valid = xp.ones((H, W), bool)
    for dy, dx in ((dy0, dx0), (dy1, dx1)):
        if dy:
            valid = valid & ((ys[:, None] + dy >= 0) & (ys[:, None] + dy < H))
        if dx:
            valid = valid & ((xs[None, :] + dx >= 0) & (xs[None, :] + dx < W))
    return xp.where(valid, idx, 2)


def _ctu_reduce(arr, ctu: int):
    """Sum (H, W) int array per (ctu x ctu) tile -> (nby, nbx)."""
    H, W = arr.shape
    return arr.reshape(H // ctu, ctu, W // ctu, ctu).sum(axis=(1, 3))


def eo_stats(orig, rec, ctu: int):
    """Per-CTU (count, sum(orig-rec)) for the 4 EO classes x 4 categories.

    Returns k (4, 4, nby, nbx) and s (4, 4, nby, nbx); categories are
    edgeIdx 0, 1, 3, 4 (index 2 carries no offset).
    """
    diff = orig.astype(np.int64) - rec.astype(np.int64)
    ks, ss = [], []
    for cls in range(4):
        idx = edge_idx_map(rec, cls)
        k_c, s_c = [], []
        for cat, ei in enumerate((0, 1, 3, 4)):
            m = idx == ei
            k_c.append(_ctu_reduce(m.astype(np.int64), ctu))
            s_c.append(_ctu_reduce(np.where(m, diff, 0), ctu))
        ks.append(np.stack(k_c))
        ss.append(np.stack(s_c))
    return np.stack(ks), np.stack(ss)


def bo_stats(orig, rec, ctu: int):
    """Per-CTU (count, sum) per 32 bands: (32, nby, nbx) each."""
    diff = orig.astype(np.int64) - rec.astype(np.int64)
    band = (rec.astype(np.int32) >> 3)
    ks, ss = [], []
    for b in range(32):
        m = band == b
        ks.append(_ctu_reduce(m.astype(np.int64), ctu))
        ss.append(_ctu_reduce(np.where(m, diff, 0), ctu))
    return np.stack(ks), np.stack(ss)


def _best_offset(k, s, lam_fx, sign_constraint=0, xp=np):
    """Vectorized best offset per (.., nby, nbx) stat cell.

    Minimises D(h) = k h^2 - 2 h s plus lam * bits(|h|); sign_constraint:
    +1 -> h >= 0, -1 -> h <= 0, 0 -> free. Returns (h, cost_delta).
    xp-generic: identical integer math host (int64) and device (int32 —
    every term < 2**24, so the narrower dtype cannot change the argmin)."""
    hs_np = np.arange(-MAX_OFFSET, MAX_OFFSET + 1)
    if sign_constraint > 0:
        hs_np = hs_np[hs_np >= 0]
    elif sign_constraint < 0:
        hs_np = hs_np[hs_np <= 0]
    acc = np.int64 if xp is np else xp.int32
    hs = xp.asarray(hs_np)
    # shape (H..., len(hs))
    k_ = k[..., None].astype(acc)
    s_ = s[..., None].astype(acc)
    bits = xp.asarray(np.abs(hs_np) + 1)
    cost = k_ * hs * hs - 2 * hs * s_ + ((lam_fx * bits) >> 8)
    j = xp.argmin(cost, axis=-1)
    h = hs[j]
    c = xp.take_along_axis(cost, j[..., None], axis=-1)[..., 0]
    return h.astype(xp.int32), c


def _component_costs(orig, rec, ctu: int, lam_fx: int):
    """Per-CTU costs/offsets for one component: EO per class, BO, off."""
    H, W = orig.shape
    nby, nbx = H // ctu, W // ctu

    ke, se = eo_stats(orig, rec, ctu)                  # (4cls, 4cat, nby, nbx)
    # EO sign rules: cats 0,1 (valleys) positive; 2,3 (peaks) negative.
    offs = np.zeros((4, 4, nby, nbx), np.int32)
    cost_eo = np.zeros((4, nby, nbx), np.int64)
    for cat in range(4):
        sign = 1 if cat < 2 else -1
        h, c = _best_offset(ke[:, cat], se[:, cat], lam_fx, sign)
        offs[:, cat] = h
        cost_eo += c

    kb, sb = bo_stats(orig, rec, ctu)                  # (32, nby, nbx)
    hb, cb = _best_offset(kb, sb, lam_fx, 0)           # per band
    win_costs = np.stack([cb[p:p + 4].sum(axis=0) for p in range(29)])
    band_pos = np.argmin(win_costs, axis=0)            # (nby, nbx)
    bo_cost = np.min(win_costs, axis=0)
    bo_off = np.stack([np.take_along_axis(hb, (band_pos + i)[None], 0)[0]
                       for i in range(4)])             # (4, nby, nbx)
    return dict(cost_eo=cost_eo, eo_offs=offs, band_pos=band_pos,
                bo_cost=bo_cost, bo_off=bo_off,
                zero=np.zeros((nby, nbx), np.int64))


def _pack(typ, cls, band_pos, bo_off, eo_offs, xp=np):
    eo_off = xp.take_along_axis(eo_offs, cls[None, None], axis=0)[0]
    offsets = xp.where(typ[None] == 1, bo_off,
                       xp.where(typ[None] == 2, eo_off, 0))
    dt = xp.int8
    return dict(type=typ.astype(dt), eo_class=cls.astype(dt),
                band_pos=band_pos.astype(dt),
                offsets=offsets.transpose(1, 2, 0).astype(dt))




def _shift_params(par, direction, xp):
    """Neighbor's params aligned to each CTU (edge values are junk — the
    candidate masks exclude the first row/column)."""
    ax = 1 if direction == "left" else 0
    return {k: xp.roll(v, 1, axis=ax) for k, v in par.items()}


def _shift_bool(m, direction, xp):
    if direction == "left":
        return xp.pad(m[:, :-1], ((0, 0), (1, 0)), mode="constant",
                      constant_values=False)
    return xp.pad(m[:-1, :], ((1, 0), (0, 0)), mode="constant",
                  constant_values=False)


def _cummax(a, xp):
    if xp is np:
        return np.maximum.accumulate(a, axis=1)
    import jax
    return jax.lax.cummax(a, axis=1)


def _eval_params_cost(stats, par, xp):
    """Closed-form SAO distortion delta of applying `par` to a CTU's stat
    moments: sum over active offsets of k*h^2 - 2*h*s (negative = better
    than no SAO). Off CTUs cost 0."""
    ke, se, kb, sb = stats
    acc = np.int64 if xp is np else xp.int32
    ke = xp.asarray(ke).astype(acc)
    se = xp.asarray(se).astype(acc)
    kb = xp.asarray(kb).astype(acc)
    sb = xp.asarray(sb).astype(acc)
    typ = par["type"].astype(xp.int32)
    cls = par["eo_class"].astype(xp.int32)
    bp = par["band_pos"].astype(xp.int32)
    off = par["offsets"].astype(acc)                # (nby, nbx, 4)
    ke_g = xp.take_along_axis(ke, cls[None, None], axis=0)[0]   # (4cat, ..)
    se_g = xp.take_along_axis(se, cls[None, None], axis=0)[0]
    d_eo = xp.zeros_like(typ).astype(acc)
    for cat in range(4):
        h = off[..., cat]
        d_eo = d_eo + ke_g[cat] * h * h - 2 * h * se_g[cat]
    d_bo = xp.zeros_like(typ).astype(acc)
    for i in range(4):
        idx = xp.clip(bp + i, 0, 31)
        kb_g = xp.take_along_axis(kb, idx[None], axis=0)[0]
        sb_g = xp.take_along_axis(sb, idx[None], axis=0)[0]
        h = off[..., i]
        d_bo = d_bo + kb_g * h * h - 2 * h * sb_g
    return xp.where(typ == 2, d_eo, xp.where(typ == 1, d_bo, 0))


def derive_all_from_stats(st_y, st_cb, st_cr, qp: int, qp_c: int, xp=np,
                          slice_p: bool = False):
    """Full SAO parameter derivation from per-CTU stat tensors for all three
    components (luma independent; chroma type/EO-class shared, spec 7.3.8.3)
    + equality-based merge flags. xp-generic: runs on host over fetched
    stats or fully on device inside the frame jit. Returns
    (luma, cb, cr, merge_left, merge_up).

    slice_p selects the P-slice RD lambda (the reference prices SAO with
    the slice lambda, hmr_tables.c:372 sao_lambdas[0] = lambda — using the
    I-slice table on P frames underpriced offsets ~2x and SAO grew to ~20%
    of P bits)."""
    from .. import tables
    fx = tables.LAMBDA_FX_P if slice_p else tables.LAMBDA_FX
    if xp is np:
        lam_y = int(fx[min(qp, 51)])
        lam_c = int(fx[min(qp_c, 51)])
    else:                                 # traced qp inside the frame jit
        lt = xp.asarray(fx)
        lam_y = lt[xp.minimum(qp, 51)]
        lam_c = lt[xp.minimum(qp_c, 51)]
    ccy = _component_costs_from_stats(*st_y, lam_y, xp=xp)
    ccb = _component_costs_from_stats(*st_cb, lam_c, xp=xp)
    ccr = _component_costs_from_stats(*st_cr, lam_c, xp=xp)

    # Bit-cost estimates calibrated against measured CABAC output on the
    # synthetic 720p RD clip (sweep 2026-08: eo=14/bo=22/off=2 saved ~350B
    # per P frame for -0.04dB vs the old 6/10/1 optimistic estimates).
    cost_eo = ccy["cost_eo"] + ((lam_y * 14) >> 8)
    cls = xp.argmin(cost_eo, axis=0)
    eo_cost = xp.take_along_axis(cost_eo, cls[None], axis=0)[0]
    bo_cost = ccy["bo_cost"] + ((lam_y * 22) >> 8)
    off_cost = ccy["zero"] + ((lam_y * 2) >> 8)
    typ = xp.argmin(xp.stack([off_cost, bo_cost, eo_cost]), axis=0)
    luma = _pack(typ, cls, ccy["band_pos"], ccy["bo_off"], ccy["eo_offs"],
                 xp=xp)

    cost_eo_c = ccb["cost_eo"] + ccr["cost_eo"] + ((lam_c * 14) >> 8)
    cls_c = xp.argmin(cost_eo_c, axis=0)
    bo_cost_c = ccb["bo_cost"] + ccr["bo_cost"] + ((lam_c * 28) >> 8)
    off_cost_c = ccb["zero"] + ((lam_c * 2) >> 8)
    eo_cost_c = xp.take_along_axis(cost_eo_c, cls_c[None], axis=0)[0]
    typ_c = xp.argmin(xp.stack([off_cost_c, bo_cost_c, eo_cost_c]), axis=0)
    cbp = _pack(typ_c, cls_c, ccb["band_pos"], ccb["bo_off"], ccb["eo_offs"],
                xp=xp)
    crp = _pack(typ_c, cls_c, ccr["band_pos"], ccr["bo_off"], ccr["eo_offs"],
                xp=xp)

    # ---- merge-left/up RDO (role of hmr_sao.c:663/:854/:1295) ----
    # cost of coding NEW params for this CTU (all components, lambda-R in)
    new_cost = (xp.minimum(xp.minimum(off_cost, bo_cost), eo_cost)
                + xp.minimum(xp.minimum(off_cost_c, bo_cost_c), eo_cost_c))

    def merged_cost(shift):
        """Cost of copying the neighbor's (pre-merge) params: closed-form
        distortion of applying them to THIS CTU's stats + 1-2 flag bits."""
        d = (_eval_params_cost(st_y, _shift_params(luma, shift, xp), xp)
             + _eval_params_cost(st_cb, _shift_params(cbp, shift, xp), xp)
             + _eval_params_cost(st_cr, _shift_params(crp, shift, xp), xp))
        bits = 2 if shift == "left" else 3
        return d + ((lam_y * bits) >> 8)

    nby, nbx = new_cost.shape
    idx_x = xp.arange(nbx)[None, :]
    idx_y = xp.arange(nby)[:, None]
    costL = merged_cost("left")
    costU = merged_cost("up")
    candL = (costL < new_cost) & (idx_x > 0)
    candU = (costU < new_cost) & (idx_y > 0)
    # length-1 chains only: a merge SOURCE must keep its new params, so the
    # decoder's copied params equal the ones this RDO evaluated. Left runs
    # alternate (accept even positions within each candidate run); up
    # accepts only from neighbors that are no candidates at all.
    # acceptance must guarantee every merge SOURCE kept its NEW params
    # (length-1 chains), or the decoder's copy would diverge from the
    # params this RDO evaluated/applied. Up-merges are decided first
    # (acyclic: only non-left-candidates, from a source that is no
    # candidate at all — accU positions are never candL). Left candidate
    # runs then alternate from each run start; a run whose start sits
    # right of an up-merged CTU starts one position later (that source's
    # final params are not its new ones).
    src_pure = ~(candL | candU)
    accU = candU & ~candL & _shift_bool(src_pure, "up", xp)
    runs = candL & ~_shift_bool(candL, "left", xp)
    blocked = _shift_bool(accU, "left", xp)
    pos = xp.broadcast_to(idx_x, candL.shape).astype(xp.int32)
    seed = xp.where(runs, pos + blocked.astype(xp.int32), -1)
    anchor = _cummax(seed, xp)
    accL = candL & (((pos - anchor) % 2) == 0)

    def apply_merge(par):
        out = {}
        pl = _shift_params(par, "left", xp)
        pu = _shift_params(par, "up", xp)
        for k in par:
            sel = accL if par[k].ndim == 2 else accL[..., None]
            selu = accU if par[k].ndim == 2 else accU[..., None]
            out[k] = xp.where(sel, pl[k], xp.where(selu, pu[k], par[k]))
        return out

    return (apply_merge(luma), apply_merge(cbp), apply_merge(crp),
            accL, accU)


def derive_params(orig, rec, ctu: int, qp: int, *, lam_scale: int = 256):
    """Per-CTU SAO params for the luma component. Any choice yields a
    conformant stream — the RD sweep only affects quality."""
    from .. import tables
    lam_fx = int(tables.LAMBDA_FX[min(qp, 51)]) * lam_scale // 256
    cc = _component_costs(orig, rec, ctu, lam_fx)
    cost_eo = cc["cost_eo"] + ((lam_fx * 6) >> 8)
    cls = np.argmin(cost_eo, axis=0)
    eo_cost = np.take_along_axis(cost_eo, cls[None], axis=0)[0]
    bo_cost = cc["bo_cost"] + ((lam_fx * 10) >> 8)
    off_cost = cc["zero"] + ((lam_fx * 1) >> 8)
    typ = np.argmin(np.stack([off_cost, bo_cost, eo_cost]), axis=0)
    return _pack(typ, cls, cc["band_pos"], cc["bo_off"], cc["eo_offs"])


def derive_params_chroma(orig_cb, rec_cb, orig_cr, rec_cr, ctu: int, qp: int,
                         *, lam_scale: int = 256):
    """Joint chroma derivation: sao_type_idx_chroma and the EO class are
    shared between Cb and Cr (spec 7.3.8.3); band positions and offsets
    stay per-component. Returns (params_cb, params_cr)."""
    from .. import tables
    lam_fx = int(tables.LAMBDA_FX[min(qp, 51)]) * lam_scale // 256
    cb = _component_costs(orig_cb, rec_cb, ctu, lam_fx)
    cr = _component_costs(orig_cr, rec_cr, ctu, lam_fx)
    cost_eo = cb["cost_eo"] + cr["cost_eo"] + ((lam_fx * 6) >> 8)
    cls = np.argmin(cost_eo, axis=0)
    eo_cost = np.take_along_axis(cost_eo, cls[None], axis=0)[0]
    bo_cost = cb["bo_cost"] + cr["bo_cost"] + ((lam_fx * 16) >> 8)
    off_cost = cb["zero"] + ((lam_fx * 1) >> 8)
    typ = np.argmin(np.stack([off_cost, bo_cost, eo_cost]), axis=0)
    return (_pack(typ, cls, cb["band_pos"], cb["bo_off"], cb["eo_offs"]),
            _pack(typ, cls, cr["band_pos"], cr["bo_off"], cr["eo_offs"]))


def derive_merge_flags(luma, chroma_cb, chroma_cr, xp=np):
    """Set merge_left/up where ALL components' params match the neighbor
    (encoder-side convenience; decoder copies on merge)."""
    t = luma["type"]
    nby, nbx = t.shape

    def same(a, b):
        return xp.all(a == b, axis=-1) if a.ndim == 3 else (a == b)

    def params_equal(shift):
        eq = None
        for comp in (luma, chroma_cb, chroma_cr):
            for key in ("type", "eo_class", "band_pos", "offsets"):
                a = comp[key]
                if shift == "left":
                    e = same(a[:, 1:], a[:, :-1])
                else:
                    e = same(a[1:, :], a[:-1, :])
                eq = e if eq is None else (eq & e)
        pad = ((0, 0), (1, 0)) if shift == "left" else ((1, 0), (0, 0))
        return xp.pad(eq, pad, mode="constant", constant_values=False)

    merge_left = params_equal("left")
    merge_up = params_equal("up") & ~merge_left
    return merge_left, merge_up


def apply_sao(rec, params, ctu: int, xp=np):
    """Decoder-exact SAO application for one component plane (8.7.3)."""
    H, W = rec.shape
    nby, nbx = H // ctu, W // ctu
    r = rec.astype(xp.int32)
    typ = xp.asarray(params["type"])
    eo_cls = xp.asarray(params["eo_class"])
    band_pos = xp.asarray(params["band_pos"])
    offsets = xp.asarray(params["offsets"])            # (nby, nbx, 4)

    def up(a):
        return xp.repeat(xp.repeat(a, ctu, axis=0), ctu, axis=1)

    typ_px = up(typ)
    cls_px = up(eo_cls)
    pos_px = up(band_pos.astype(xp.int32))
    off_px = [up(offsets[..., i].astype(xp.int32)) for i in range(4)]

    # --- BO ---
    band = r >> 3
    rel = band - pos_px
    bo_off = xp.zeros_like(r)
    for i in range(4):
        bo_off = xp.where(rel == i, off_px[i], bo_off)
    bo_out = xp.clip(r + bo_off, 0, 255)

    # --- EO: compute result for each class, select by per-pixel class ---
    eo_out = r
    for cls in range(4):
        idx = edge_idx_map(r, cls, xp=xp)
        o = xp.zeros_like(r)
        for cat, ei in enumerate((0, 1, 3, 4)):
            o = xp.where(idx == ei, off_px[cat], o)
        cand = xp.clip(r + o, 0, 255)
        eo_out = xp.where(cls_px == cls, cand, eo_out)

    out = xp.where(typ_px == 1, bo_out, xp.where(typ_px == 2, eo_out, r))
    return out


def _ctu_reduce_xp(arr, ctu: int, xp):
    if xp is not np:
        from .blocksum import block_sum
        return block_sum(arr, ctu, ctu, xp=xp)
    H, W = arr.shape
    return arr.reshape(H // ctu, ctu, W // ctu, ctu).sum(axis=(1, 3))


def _stats_device_one(orig, rec, ctu, xp):
    """(ke, se, kb, sb) int32 stat tensors for one component, on device.

    All per-CTU reductions go through the MXU block_sum primitive: the
    (16 + 64) masked sums stack into one (80, H, W) tensor and pool as a
    single batched matmul pair. |diff| <= 255 and counts <= 1 per pixel, so
    16-granular f32 partials are exact (ops/blocksum.py)."""
    o = orig.astype(xp.int32)
    r = rec.astype(xp.int32)
    diff = o - r
    maps = []
    for cls in range(4):
        idx = edge_idx_map(r, cls, xp=xp)
        for ei in (0, 1, 3, 4):
            m = idx == ei
            maps.append(m.astype(xp.int32))
            maps.append(xp.where(m, diff, 0))
    band = r >> 3
    for b in range(32):
        m = band == b
        maps.append(m.astype(xp.int32))
        maps.append(xp.where(m, diff, 0))
    red = _ctu_reduce_xp(xp.stack(maps), ctu, xp)     # (96, nby, nbx)
    ke = xp.stack([red[8 * c:8 * c + 8:2] for c in range(4)])
    se = xp.stack([red[8 * c + 1:8 * c + 9:2] for c in range(4)])
    kb = red[32::2]
    sb = red[33::2]
    return (ke, se, kb, sb)


def _component_costs_from_stats(ke, se, kb, sb, lam_fx: int, xp=np):
    """Twin of _component_costs operating on stat tensors (tiny
    (4,4,nby,nbx)/(32,nby,nbx) arrays); xp-generic so the same derivation
    runs on fetched stats (host) or inside the frame jit (device)."""
    acc = np.int64 if xp is np else xp.int32
    ke = xp.asarray(ke).astype(acc)
    se = xp.asarray(se).astype(acc)
    kb = xp.asarray(kb).astype(acc)
    sb = xp.asarray(sb).astype(acc)
    nby, nbx = ke.shape[-2:]
    offs_cat = []
    cost_eo = None
    for cat in range(4):
        sign = 1 if cat < 2 else -1
        h, c = _best_offset(ke[:, cat], se[:, cat], lam_fx, sign, xp=xp)
        offs_cat.append(h)
        cost_eo = c if cost_eo is None else cost_eo + c
    offs = xp.stack(offs_cat, axis=1)                 # (4cls, 4cat, nby, nbx)
    hb, cb = _best_offset(kb, sb, lam_fx, 0, xp=xp)
    win_costs = xp.stack([cb[p:p + 4].sum(axis=0) for p in range(29)])
    band_pos = xp.argmin(win_costs, axis=0)
    bo_cost = xp.min(win_costs, axis=0)
    bo_off = xp.stack([xp.take_along_axis(hb, (band_pos + i)[None], 0)[0]
                       for i in range(4)])
    return dict(cost_eo=cost_eo, eo_offs=offs, band_pos=band_pos,
                bo_cost=bo_cost, bo_off=bo_off,
                zero=xp.zeros((nby, nbx), acc))


def _sao_jits():
    """Module-level jitted device passes (created once — defining jits
    inside the per-frame call would re-trace every frame)."""
    global _SAO_STATS_JIT, _SAO_APPLY_JIT
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("ctu",))
    def stats(oy, ry, ou, ru, ov, rv, ctu):
        # ONE flat (288, nby, nbx) tensor -> a single fetch RPC (the tunnel's
        # per-transfer latency dominates the 12 small stat tensors)
        parts = (_stats_device_one(oy, ry, ctu, jnp)
                 + _stats_device_one(ou, ru, ctu // 2, jnp)
                 + _stats_device_one(ov, rv, ctu // 2, jnp))
        nby, nbx = parts[0].shape[-2:]
        return jnp.concatenate([t.reshape(-1, nby, nbx) for t in parts], 0)

    @functools.partial(jax.jit, static_argnames=("ctu",))
    def apply_packed(ry, ru, rv, pp, ctu):
        # one upload (3, nby, nbx, 7) + one dispatch for all 3 components
        def one(rec, par, c):
            params = dict(type=par[..., 0], eo_class=par[..., 1],
                          band_pos=par[..., 2], offsets=par[..., 3:7])
            return apply_sao(rec, params, c, xp=jnp).astype(jnp.uint8)
        return (one(ry, pp[0], ctu), one(ru, pp[1], ctu // 2),
                one(rv, pp[2], ctu // 2))

    _SAO_STATS_JIT, _SAO_APPLY_JIT = stats, apply_packed
    return stats, apply_packed


_SAO_STATS_JIT = None
_SAO_APPLY_JIT = None


def sao_stage_device(orig_planes_dev, dbk_planes_dev, ctu: int, qp: int,
                     qp_c: int, slice_p: bool = False):
    """Device-accelerated SAO stage: stats + application run on device
    (whole-frame reductions/selects); only the tiny per-CTU stat tensors and
    the chosen params cross the host boundary. Returns
    (sao_info, filtered device planes)."""
    import jax.numpy as jnp

    from .. import tables

    stats, apply_packed = ((_SAO_STATS_JIT, _SAO_APPLY_JIT)
                           if _SAO_STATS_JIT is not None else _sao_jits())

    oy, ou, ov = orig_planes_dev
    ry, ru, rv = dbk_planes_dev
    flat = np.asarray(stats(oy, ry, ou, ru, ov, rv, ctu))
    st = []
    o = 0
    for _ in range(3):
        nby, nbx = flat.shape[-2:]
        st.append(flat[o:o + 16].reshape(4, 4, nby, nbx)); o += 16
        st.append(flat[o:o + 16].reshape(4, 4, nby, nbx)); o += 16
        st.append(flat[o:o + 32]); o += 32
        st.append(flat[o:o + 32]); o += 32
    luma, cbp, crp, ml, mu = derive_all_from_stats(
        tuple(st[0:4]), tuple(st[4:8]), tuple(st[8:12]), qp, qp_c, xp=np,
        slice_p=slice_p)

    def pk(par):
        return np.concatenate([par["type"][..., None],
                               par["eo_class"][..., None],
                               par["band_pos"][..., None],
                               par["offsets"]], -1).astype(np.int32)

    pp = jnp.asarray(np.stack([pk(luma), pk(cbp), pk(crp)]))
    fy, fu, fv = apply_packed(ry, ru, rv, pp, ctu)
    info = dict(luma=luma, cb=cbp, cr=crp, merge_left=ml, merge_up=mu,
                sao_luma=True, sao_chroma=True)
    return info, (fy, fu, fv)


def sao_stage(orig_planes, dbk_planes, ctu: int, qp: int, qp_c: int):
    """Full encoder-side SAO stage: derive params for Y/Cb/Cr, set
    equality-based merge flags, apply. Returns (sao_info, filtered planes).

    Role of hmr_wpp_sao_ctu (hmr_sao.c:1415) + sao_decide_blk_params
    (:1295), as whole-frame host numpy (device port: apply_sao is
    xp-generic)."""
    oy, ou, ov = orig_planes
    dy, du, dv = (np.asarray(p) for p in dbk_planes)
    luma = derive_params(np.asarray(oy), dy, ctu, qp)
    cbp, crp = derive_params_chroma(np.asarray(ou), du, np.asarray(ov), dv,
                                    ctu // 2, qp_c)
    ml, mu = derive_merge_flags(luma, cbp, crp)
    fy = apply_sao(dy, luma, ctu).astype(np.uint8)
    fu = apply_sao(du, cbp, ctu // 2).astype(np.uint8)
    fv = apply_sao(dv, crp, ctu // 2).astype(np.uint8)
    info = dict(luma=luma, cb=cbp, cr=crp, merge_left=ml, merge_up=mu,
                sao_luma=True, sao_chroma=True)
    return info, (fy, fu, fv)


def resolve_merges(params, merge_left, merge_up):
    """Propagate merged params so application sees final values per CTU."""
    out = {k: v.copy() for k, v in params.items()}
    nby, nbx = merge_left.shape
    for r in range(nby):
        for c in range(nbx):
            if merge_left[r, c]:
                for k in out:
                    out[k][r, c] = out[k][r, c - 1]
            elif merge_up[r, c]:
                for k in out:
                    out[k][r, c] = out[k][r - 1, c]
    return out
