"""HEVC deblocking filter (spec 8.7.2), batched array-functional form.

Role of the reference's hmr_deblocking_filter.c
(/root/reference/src/homer_lib/hmr_deblocking_filter.c:63-903), re-derived
from the spec as whole-frame tensor passes instead of a per-CU walker:
vertical edges live on an 8-pel grid and each filter reads/writes only the
8 columns centred on its edge, so all vertical edges of a frame are
independent — one reshape turns the pass into a dense (segments, lanes)
batch with no scatter.  Horizontal edges run as the same kernel on the
transposed frame (using vertically-filtered samples, per spec ordering).

Written against the `xp` array namespace so the identical code is both the
numpy golden oracle and the jitted JAX device pass.
"""

from __future__ import annotations

import numpy as np

from .. import tables


def _clip1(xp, v):
    return xp.clip(v, 0, 255)


def _luma_vertical_pass(xp, y, bs, qp_p, qp_q, beta_offset, tc_offset):
    """Filter all vertical luma edges of `y` (H, W) in one batch.

    bs:          (H//4, nE) boundary strength per 4-row segment per edge,
                 edges at columns 8, 16, ... (nE = W//8 - 1).
    qp_p, qp_q:  (H//4, nE) QP of the blocks left/right of each edge segment.
    """
    H, W = y.shape
    nE = W // 8 - 1
    if nE <= 0:
        return y
    nS = H // 4
    y = y.astype(xp.int32)
    # (nS, 4, nE, 8): segment, row-in-segment, edge lane, column p3..p0 q0..q3
    t = y[:, 4:W - 4].reshape(nS, 4, nE, 8)
    p3, p2, p1, p0 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    q0, q1, q2, q3 = t[..., 4], t[..., 5], t[..., 6], t[..., 7]

    qp_l = (qp_p + qp_q + 1) >> 1                               # (nS, nE)
    beta = tables.DEBLOCK_BETA if isinstance(y, np.ndarray) else _jx(xp, tables.DEBLOCK_BETA)
    tc_t = tables.DEBLOCK_TC if isinstance(y, np.ndarray) else _jx(xp, tables.DEBLOCK_TC)
    b = beta[xp.clip(qp_l + beta_offset, 0, 51)]
    tc = tc_t[xp.clip(qp_l + 2 * (bs - 1) + tc_offset, 0, 53)]

    ad = lambda a: xp.abs(a)
    dp = ad(p2 - 2 * p1 + p0)                                   # (nS, 4, nE)
    dq = ad(q2 - 2 * q1 + q0)
    dp0, dp3 = dp[:, 0], dp[:, 3]
    dq0, dq3 = dq[:, 0], dq[:, 3]
    d = dp0 + dp3 + dq0 + dq3                                   # (nS, nE)
    filt = (bs > 0) & (d < b)

    def strong_row(r):
        dpq2 = 2 * (dp[:, r] + dq[:, r])
        return ((dpq2 < (b >> 2))
                & (ad(p3[:, r] - p0[:, r]) + ad(q0[:, r] - q3[:, r]) < (b >> 3))
                & (ad(p0[:, r] - q0[:, r]) < ((5 * tc + 1) >> 1)))

    strong = filt & strong_row(0) & strong_row(3)               # (nS, nE)
    weak = filt & ~strong

    tc4 = tc[:, None, :]                                        # broadcast rows
    st4 = strong[:, None, :]
    wk4 = weak[:, None, :]

    # --- strong filter (8.7.2.5.7, dE = 2) ---
    sp0 = xp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                  p0 - 2 * tc4, p0 + 2 * tc4)
    sp1 = xp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc4, p1 + 2 * tc4)
    sp2 = xp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                  p2 - 2 * tc4, p2 + 2 * tc4)
    sq0 = xp.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                  q0 - 2 * tc4, q0 + 2 * tc4)
    sq1 = xp.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tc4, q1 + 2 * tc4)
    sq2 = xp.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                  q2 - 2 * tc4, q2 + 2 * tc4)

    # --- weak filter (dE = 1) ---
    side_thr = (b + (b >> 1)) >> 3
    dEp = ((dp0 + dp3) < side_thr)[:, None, :]
    dEq = ((dq0 + dq3) < side_thr)[:, None, :]
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    do_w = wk4 & (ad(delta) < 10 * tc4)
    dlt = xp.clip(delta, -tc4, tc4)
    wp0 = _clip1(xp, p0 + dlt)
    wq0 = _clip1(xp, q0 - dlt)
    tc2 = tc4 >> 1
    dp1c = xp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tc2, tc2)
    dq1c = xp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tc2, tc2)
    wp1 = _clip1(xp, p1 + dp1c)
    wq1 = _clip1(xp, q1 + dq1c)

    f_p0 = xp.where(st4, sp0, xp.where(do_w, wp0, p0))
    f_p1 = xp.where(st4, sp1, xp.where(do_w & dEp, wp1, p1))
    f_p2 = xp.where(st4, sp2, p2)
    f_q0 = xp.where(st4, sq0, xp.where(do_w, wq0, q0))
    f_q1 = xp.where(st4, sq1, xp.where(do_w & dEq, wq1, q1))
    f_q2 = xp.where(st4, sq2, q2)

    out = xp.stack([p3, f_p2, f_p1, f_p0, f_q0, f_q1, f_q2, q3], axis=-1)
    mid = out.reshape(H, W - 8)
    return xp.concatenate([y[:, :4], mid, y[:, W - 4:]], axis=1)


def _chroma_vertical_pass(xp, c, bs2, qp_p, qp_q, c_qp_offset, tc_offset):
    """Filter all vertical chroma edges of plane `c` (H2, W2).

    Chroma edges sit every 8 chroma samples (16 luma). Only bS == 2 filters.
    bs2, qp_p, qp_q: (H2//4, nE) per 4-chroma-row segment per edge.
    """
    H2, W2 = c.shape
    nE = W2 // 8 - 1
    if nE <= 0:
        return c
    nS = H2 // 4
    c = c.astype(xp.int32)
    t = c[:, 4:W2 - 4].reshape(nS, 4, nE, 8)
    p1, p0, q0, q1 = t[..., 2], t[..., 3], t[..., 4], t[..., 5]

    qp_i = xp.clip(((qp_p + qp_q + 1) >> 1) + c_qp_offset, 0, 57)
    qp_c = _chroma_qp(xp, qp_i)
    tc_t = tables.DEBLOCK_TC if isinstance(c, np.ndarray) else _jx(xp, tables.DEBLOCK_TC)
    tc = tc_t[xp.clip(qp_c + 2 + tc_offset, 0, 53)][:, None, :]
    on = (bs2 == 2)[:, None, :]

    delta = xp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    f_p0 = xp.where(on, _clip1(xp, p0 + delta), p0)
    f_q0 = xp.where(on, _clip1(xp, q0 - delta), q0)

    out = xp.stack([t[..., 0], t[..., 1], p1, f_p0, f_q0, q1,
                    t[..., 6], t[..., 7]], axis=-1)
    mid = out.reshape(H2, W2 - 8)
    return xp.concatenate([c[:, :4], mid, c[:, W2 - 4:]], axis=1)


def _chroma_qp(xp, qp_i):
    table = tables.chroma_qp_from_luma  # numpy path
    if isinstance(qp_i, np.ndarray):
        return table(qp_i)
    t = _jx(xp, np.array([29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37],
                         dtype=np.int32))
    return xp.where(qp_i < 30, qp_i,
                    xp.where(qp_i > 43, qp_i - 6, t[xp.clip(qp_i, 30, 43) - 30]))


def _jx(xp, arr):
    return xp.asarray(arr)


def deblock_frame(y, u, v, *, bs_v, bs_h, qp_map, cb_qp_offset=0,
                  cr_qp_offset=0, beta_offset=0, tc_offset=0, xp=np):
    """Deblock one reconstructed frame (spec 8.7.2 ordering: all vertical
    edges first, then all horizontal edges on the vertically-filtered output).

    y (H, W), u/v (H//2, W//2): reconstructed planes (H, W multiples of 8).
    bs_v: (H//4, W//8) int — boundary strength of the vertical edge at luma
          column 8*j for rows 4*i..4*i+3 (column 0 = picture edge, must be 0).
    bs_h: (H//8, W//4) int — horizontal edge at luma row 8*i, cols 4*j...
    qp_map: (H//4, W//4) int QP per 4x4 luma unit.
    Returns filtered (y, u, v).
    """
    H, W = y.shape

    # ---------------- vertical edges ----------------
    # Luma: edge lanes j = 1..W//8-1; P unit column = 2j-1, Q = 2j.
    je = np.arange(1, W // 8)
    bsv = bs_v[:, 1:]
    qp_p = qp_map[:, 2 * je - 1]
    qp_q = qp_map[:, 2 * je]
    y = _luma_vertical_pass(xp, y, bsv, qp_p, qp_q, beta_offset, tc_offset)

    # Chroma: edge at chroma col 8*jc = luma col 16*jc -> luma 8-grid j = 2*jc.
    # One 4-chroma-row segment spans two luma 4-row segments; take the bs/qp
    # of each luma segment row pair (they are equal on CU interiors; use even).
    H2, W2 = u.shape
    if W2 >= 16:
        jc = np.arange(1, W2 // 8)
        bs2 = bs_v[::2, 2 * jc]
        qp_pc = qp_map[::2, 4 * jc - 1]
        qp_qc = qp_map[::2, 4 * jc]
        u = _chroma_vertical_pass(xp, u, bs2, qp_pc, qp_qc, cb_qp_offset, tc_offset)
        v = _chroma_vertical_pass(xp, v, bs2, qp_pc, qp_qc, cr_qp_offset, tc_offset)

    # ---------------- horizontal edges (transpose trick) ----------------
    ie = np.arange(1, H // 8)
    bsh = bs_h[1:, :].T                     # (W//4 segs, nE) after transpose
    qp_p = qp_map[2 * ie - 1, :].T
    qp_q = qp_map[2 * ie, :].T
    yt = _luma_vertical_pass(xp, y.T, bsh, qp_p, qp_q, beta_offset, tc_offset)
    y = yt.T

    if H2 >= 16:
        ic = np.arange(1, H2 // 8)
        bs2 = bs_h[2 * ic, :][:, ::2].T
        qp_pc = qp_map[4 * ic - 1, :][:, ::2].T
        qp_qc = qp_map[4 * ic, :][:, ::2].T
        u = _chroma_vertical_pass(xp, u.T, bs2, qp_pc, qp_qc, cb_qp_offset, tc_offset).T
        v = _chroma_vertical_pass(xp, v.T, bs2, qp_pc, qp_qc, cr_qp_offset, tc_offset).T

    return y, u, v


def intra_edge_maps(H: int, W: int, tu_size: int):
    """bs_v/bs_h for an all-intra frame with a uniform TU grid: every TU
    boundary on the 8-pel grid has bS = 2 (spec 8.7.2.4: intra => bS 2)."""
    bs_v = np.zeros((H // 4, W // 8), np.int32)
    bs_h = np.zeros((H // 8, W // 4), np.int32)
    step = tu_size // 8
    if step == 0:
        step = 1
    bs_v[:, step::step] = 2
    bs_h[step::step, :] = 2
    return bs_v, bs_h


def inter_bs_from_units(depth_u, mv_u, cbf_u, ctu_log2: int, xp=np,
                        trd_u=None, intra_u=None):
    """bs maps for a P frame coded as a variable-depth inter CU quadtree
    (spec 8.7.2.4 reduced to the all-inter one-reference case).

    depth_u (uh, uw) absolute CU depth per 4x4 unit; mv_u (uh, uw, 2)
    quarter-pel MV per unit; cbf_u (uh, uw) bool per-unit luma TB cbf.
    TU = min(CU, 32) (the implicit 64-CU split) halved where trd_u marks
    an explicit depth-1 residual-quadtree split, and PU == CU, so TU
    starts cover every CU/PU edge. cbf_u must then be TB-granular. bs = 1
    on an edge when either TB has coefficients or the MVs differ by >= one
    luma sample (4 qpel).
    """
    uh, uw = depth_u.shape
    cusz = (1 << ctu_log2) >> depth_u.astype(xp.int32)
    tusz = xp.minimum(cusz, 32)
    if trd_u is not None:      # explicit inter TU split (depth 1): TB=CU/2
        tusz = xp.where(trd_u.astype(bool), tusz >> 1, tusz)
    posx = (np.arange(uw) * 4).astype(np.int32)
    posy = (np.arange(uh) * 4).astype(np.int32)
    startx = (posx[None, :] & (tusz - 1)) == 0
    starty = (posy[:, None] & (tusz - 1)) == 0

    def bs_at(edge, l_idx, r_idx, axis):
        if axis == 1:            # vertical edges: left/right units
            mvl, mvr = mv_u[:, l_idx], mv_u[:, r_idx]
            cl, cr = cbf_u[:, l_idx], cbf_u[:, r_idx]
            il = intra_u[:, l_idx] if intra_u is not None else False
            ir = intra_u[:, r_idx] if intra_u is not None else False
        else:                    # horizontal edges: above/below units
            mvl, mvr = mv_u[l_idx, :], mv_u[r_idx, :]
            cl, cr = cbf_u[l_idx, :], cbf_u[r_idx, :]
            il = intra_u[l_idx, :] if intra_u is not None else False
            ir = intra_u[r_idx, :] if intra_u is not None else False
        mvdiff = ((abs(mvl[..., 0] - mvr[..., 0]) >= 4)
                  | (abs(mvl[..., 1] - mvr[..., 1]) >= 4))
        bs = xp.where(edge & (cl | cr | mvdiff), 1, 0).astype(xp.int32)
        if intra_u is not None:  # spec 8.7.2.4: either side intra -> bS 2
            has_i = (xp.asarray(il).astype(bool)
                     | xp.asarray(ir).astype(bool))
            bs = xp.where(edge & has_i, 2, bs)
        return bs

    # vertical edges at luma cols 8, 16, ... -> unit cols 2, 4, ...
    cols = np.arange(2, uw, 2)
    vals_v = bs_at(startx[:, cols], cols - 1, cols, axis=1)
    bs_v = xp.zeros((uh, uw // 2), xp.int32)
    rows = np.arange(2, uh, 2)
    vals_h = bs_at(starty[rows, :], rows - 1, rows, axis=0)
    bs_h = xp.zeros((uh // 2, uw), xp.int32)
    if xp is np:
        bs_v[:, 1:] = vals_v
        bs_h[1:, :] = vals_h
    else:
        bs_v = bs_v.at[:, 1:].set(vals_v)
        bs_h = bs_h.at[1:, :].set(vals_h)
    return bs_v, bs_h


def intra_bs_from_depth_units(depth_u, xp=np, trd_u=None):
    """bs maps for an all-intra frame from the unit-granular CU/TU depth map
    (relative to 32-containers: TU size per unit = 32 >> depth, i.e. 32/16/8
    — all on the 8-pel deblocking grid; intra edges are bS 2). trd_u marks
    CUs whose transform splits one level (split_transform_flag): their TU
    edges lie one level finer (a 4x4-TB interior edge falls off the 8-pel
    grid, so the clamp to 4 is harmless)."""
    uh, uw = depth_u.shape
    tusz = 32 >> depth_u.astype(xp.int32)             # (uh, uw)
    if trd_u is not None:
        tusz = xp.maximum(tusz >> trd_u.astype(xp.int32), 4)
    posx = (np.arange(uw) * 4).astype(np.int32)
    posy = (np.arange(uh) * 4).astype(np.int32)
    startx = (posx[None, :] & (tusz - 1)) == 0        # unit starts a TU (x)
    starty = (posy[:, None] & (tusz - 1)) == 0
    bs_v = xp.zeros((uh, uw // 2), xp.int32)
    vals_v = 2 * startx[:, 2::2].astype(xp.int32)     # unit cols 2,4,...
    bs_h = xp.zeros((uh // 2, uw), xp.int32)
    vals_h = 2 * starty[2::2, :].astype(xp.int32)
    if xp is np:
        bs_v[:, 1:] = vals_v
        bs_h[1:, :] = vals_h
    else:
        bs_v = bs_v.at[:, 1:].set(vals_v)
        bs_h = bs_h.at[1:, :].set(vals_h)
    return bs_v, bs_h


def intra_bs_from_split(split_blocks, B: int, xp=np):
    """bs maps for an all-intra frame with a one-level CU quadtree: every
    CTU boundary has bS=2; split CTUs add their internal half-size TU edges
    (spec 8.7.2.4: intra => bS 2 on TU edges, 8-pel grid only).

    split_blocks: (nby, nbx) bool. xp-generic so the device reference loop
    can run it inside jit."""
    nby, nbx = split_blocks.shape
    rv = B // 4
    rh = B // 8
    s2 = 2 * split_blocks.astype(xp.int32)
    bs_v = xp.zeros((nby * rv, nbx * rh), xp.int32)
    ctu_cols = (np.arange(1, nbx) * rh).astype(np.int32)
    mid_cols = (np.arange(nbx) * rh + rh // 2).astype(np.int32)
    mid_v = xp.repeat(s2, rv, axis=0)                 # (H/4, nbx)
    if xp is np:
        bs_v[:, ctu_cols] = 2
        bs_v[:, mid_cols] = mid_v
    else:
        bs_v = bs_v.at[:, ctu_cols].set(2)
        bs_v = bs_v.at[:, mid_cols].set(mid_v)
    bs_h = xp.zeros((nby * rh, nbx * rv), xp.int32)
    ctu_rows = (np.arange(1, nby) * rh).astype(np.int32)
    mid_rows = (np.arange(nby) * rh + rh // 2).astype(np.int32)
    mid_h = xp.repeat(s2, rv, axis=1)                 # (nby, W/4)
    if xp is np:
        bs_h[ctu_rows, :] = 2
        bs_h[mid_rows, :] = mid_h
    else:
        bs_h = bs_h.at[ctu_rows, :].set(2)
        bs_h = bs_h.at[mid_rows, :].set(mid_h)
    return bs_v, bs_h


def inter_bs_from_blocks(mvs, cbf_blk, B: int, xp=np, qcbf=None):
    """bs maps for an all-inter CU=PU=B grid, from per-block MVs + luma
    cbf (spec 8.7.2.4 reduced: no intra).

    mvs: (nby, nbx, 2) quarter-pel; cbf_blk: (nby, nbx) bool.
    For B = 64 the TU implicitly splits to 32: pass qcbf (nby, nbx, 2, 2)
    per-quadrant luma cbf; CU edges then use the edge-adjacent quadrant
    cbfs and the internal TU-32 edges get bS 1 from cbf alone (MV is
    uniform inside the CU).
    Returns bs_v (nby*B//4, nbx*B//8), bs_h (nby*B//8, nbx*B//4) — device
    (jnp) or host (np) depending on xp. Runs inside jit for the
    device-resident reference loop.
    """
    nby, nbx = cbf_blk.shape
    rv = B // 4          # 4-row segments per block
    rh = B // 8          # 8-col edge slots per block

    def setcol(arr, idx, vals):
        if xp is np:
            arr[:, idx] = vals
            return arr
        return arr.at[:, idx].set(vals)

    def setrow(arr, idx, vals):
        if xp is np:
            arr[idx, :] = vals
            return arr
        return arr.at[idx, :].set(vals)

    dmv_v = xp.abs(mvs[:, 1:] - mvs[:, :-1]).max(axis=-1) >= 4  # (nby, nbx-1)
    dmv_h = xp.abs(mvs[1:, :] - mvs[:-1, :]).max(axis=-1) >= 4  # (nby-1, nbx)
    bs_v = xp.zeros((nby * rv, nbx * rh), xp.int32)
    bs_h = xp.zeros((nby * rh, nbx * rv), xp.int32)
    col_idx = (np.arange(1, nbx) * rh).astype(np.int32)
    row_idx = (np.arange(1, nby) * rh).astype(np.int32)

    if qcbf is None:
        bs1_v = ((cbf_blk[:, 1:] | cbf_blk[:, :-1]) | dmv_v).astype(xp.int32)
        bs_v = setcol(bs_v, col_idx, xp.repeat(bs1_v, rv, axis=0))
        bs1_h = ((cbf_blk[1:, :] | cbf_blk[:-1, :]) | dmv_h).astype(xp.int32)
        bs_h = setrow(bs_h, row_idx, xp.repeat(bs1_h, rv, axis=1))
        return bs_v, bs_h

    q = qcbf.astype(xp.int32)                        # (nby, nbx, 2, 2)
    # --- vertical CU edges, per row-half: left block right-col quadrant vs
    # right block left-col quadrant ---
    v_half = ((q[:, :-1, :, 1] | q[:, 1:, :, 0])
              | dmv_v[:, :, None].astype(xp.int32))   # (nby, nbx-1, 2)
    v_rows = (v_half.transpose(0, 2, 1).reshape(nby * 2, nbx - 1))
    bs_v = setcol(bs_v, col_idx, xp.repeat(v_rows, rv // 2, axis=0))
    # --- horizontal CU edges per col-half ---
    h_half = ((q[:-1, :, 1, :] | q[1:, :, 0, :])
              | dmv_h[:, :, None].astype(xp.int32))   # (nby-1, nbx, 2)
    h_cols = h_half.reshape(nby - 1, nbx * 2)
    bs_h = setrow(bs_h, row_idx, xp.repeat(h_cols, rv // 2, axis=1))
    # --- internal TU-32 edges (cbf only) ---
    v_top = q[..., 0, 0] | q[..., 0, 1]
    v_bot = q[..., 1, 0] | q[..., 1, 1]
    v_mid = xp.stack([v_top, v_bot], axis=1).reshape(nby * 2, nbx)
    mid_col = (np.arange(nbx) * rh + rh // 2).astype(np.int32)
    bs_v = setcol(bs_v, mid_col, xp.repeat(v_mid, rv // 2, axis=0))
    h_left = q[..., 0, 0] | q[..., 1, 0]
    h_right = q[..., 0, 1] | q[..., 1, 1]
    h_mid = xp.stack([h_left, h_right], axis=2).reshape(nby, nbx * 2)
    mid_row = (np.arange(nby) * rh + rh // 2).astype(np.int32)
    bs_h = setrow(bs_h, mid_row, xp.repeat(h_mid, rv // 2, axis=1))
    return bs_v, bs_h


def edge_maps_from_tu_grid(tu_left_edge: np.ndarray, tu_top_edge: np.ndarray,
                           intra_mask: np.ndarray | None = None):
    """Generalised edge maps from per-4x4-unit TU boundary flags.

    tu_left_edge/tu_top_edge: (H//4, W//4) bool — the unit starts a new TU
    horizontally / vertically. Picture-boundary columns/rows must be False.
    intra_mask: (H//4, W//4) bool; None = all intra (bS 2 everywhere).
    Only 8-grid-aligned edges are kept (spec: deblocking on the 8x8 grid).
    """
    uh, uw = tu_left_edge.shape
    bs_v = np.zeros((uh, uw // 2), np.int32)
    left8 = tu_left_edge[:, ::2]            # unit columns at multiples of 8
    bs_v[:, :] = np.where(left8, 2, 0)
    bs_v[:, 0] = 0
    bs_h = np.zeros((uh // 2, uw), np.int32)
    top8 = tu_top_edge[::2, :]
    bs_h[:, :] = np.where(top8, 2, 0)
    bs_h[0, :] = 0
    return bs_v, bs_h
