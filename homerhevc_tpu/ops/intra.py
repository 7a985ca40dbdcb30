"""JAX intra prediction: all 35 modes generated at once, batched over blocks.

TPU-first replacement for the reference's per-mode prediction generators and
coarse-to-fine mode search (hmr_motion_intra.c:408-530 generators,
:1084-1180 loop1 search): instead of searching a few candidate modes
sequentially, the full 35-mode tensor is produced as vectorized gathers +
fused arithmetic and scored in one batched reduction — the shape of compute
TPUs like (large, static, batched), replacing branchy scalar search.

All arithmetic follows spec 8.4.4.2.4-.6 exactly (validated against
ops/golden.py which is validated against libde265).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables

# ---------------------------------------------------------------------------
# Static per-size mode tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mode_tables(n: int):
    """Precompute per-mode angle/idx/fact/filter tables for block size n."""
    modes = np.arange(35)
    angle = tables.INTRA_PRED_ANGLE.copy()          # (35,)
    inv_angle = tables.INV_ANGLE.copy()
    is_vertical = modes >= 18                        # vertical family
    # filter decision (8.4.4.2.3) for luma
    min_dist = np.minimum(np.abs(modes - 26), np.abs(modes - 10))
    thres = {8: 7, 16: 1, 32: 0}.get(n, 100)
    filter_flag = (min_dist > thres) & (modes != 1) & (n > 4)
    filter_flag[0] = n > 4 and min_dist[0] > thres   # planar via same rule

    y = np.arange(n)
    pos = (y[None, :] + 1) * angle[:, None]          # (35, n)
    idx = pos >> 5
    fact = pos & 31
    # NOTE: return numpy (not jnp) so the cache never captures traced
    # constants across jit traces; jnp conversion happens per-trace for free.
    return (angle.astype(np.int32), inv_angle.astype(np.int32),
            is_vertical, filter_flag, idx.astype(np.int32),
            fact.astype(np.int32))


# ---------------------------------------------------------------------------
# Reference sample preparation (substitution 8.4.4.2.2 + filtering 8.4.4.2.3)
# ---------------------------------------------------------------------------

def prepare_refs(top: jax.Array, left: jax.Array, corner: jax.Array,
                 has_left: jax.Array, has_top: jax.Array, *,
                 size: int, c_idx: int, strong_smoothing: bool,
                 bit_depth: int = 8):
    """Substitute unavailable refs and produce filtered variants.

    top/left: (2N,) int32 raw neighbor samples (garbage where unavailable —
    the caller clamps gathers so out-of-frame positions replicate the edge,
    which matches the substitution result for suffix-unavailable regions).
    has_left/has_top: scalar bool (raster CU==CTU availability pattern).
    Returns (top, left, corner, ftop, fleft, fcorner).
    """
    n2 = 2 * size
    mid = 1 << (bit_depth - 1)
    # Case neither: everything mid-grey.
    # Case only left: corner & top take left[0].
    # Case only top: left & corner take top[0].
    corner = jnp.where(has_left & has_top, corner,
                       jnp.where(has_left, left[0],
                                 jnp.where(has_top, top[0], mid)))
    top = jnp.where(has_top, top,
                    jnp.where(has_left, jnp.full((n2,), 1, top.dtype) * left[0], mid))
    left = jnp.where(has_left, left,
                     jnp.where(has_top, jnp.full((n2,), 1, left.dtype) * top[0], mid))

    if c_idx != 0:
        return top, left, corner, top, left, corner

    # 3-tap [1 2 1] smoothing over the scan (left reversed, corner, top).
    vals = jnp.concatenate([left[::-1], corner[None], top])
    sm = vals.at[1:-1].set((vals[:-2] + 2 * vals[1:-1] + vals[2:] + 2) >> 2)
    fleft = sm[:n2][::-1]
    fcorner = sm[n2]
    ftop = sm[n2 + 1:]

    if size == 32 and strong_smoothing:
        b = 1 << (bit_depth - 5)
        cond = (jnp.abs(corner + top[n2 - 1] - 2 * top[size - 1]) < b) & \
               (jnp.abs(corner + left[n2 - 1] - 2 * left[size - 1]) < b)
        xs = jnp.arange(n2)
        stop = ((63 - xs) * corner + (xs + 1) * top[n2 - 1] + 32) >> 6
        sleft = ((63 - xs) * corner + (xs + 1) * left[n2 - 1] + 32) >> 6
        stop = stop.at[n2 - 1].set(top[n2 - 1])
        sleft = sleft.at[n2 - 1].set(left[n2 - 1])
        ftop = jnp.where(cond, stop, ftop)
        fleft = jnp.where(cond, sleft, fleft)
        fcorner = jnp.where(cond, corner, fcorner)
    return top, left, corner, ftop, fleft, fcorner


# ---------------------------------------------------------------------------
# All-35-mode prediction (8.4.4.2.4-.6)
# ---------------------------------------------------------------------------

def predict_all_modes(top, left, corner, ftop, fleft, fcorner, *,
                      size: int, c_idx: int, bit_depth: int = 8) -> jax.Array:
    """Returns (35, N, N) int32 predictions for one block's prepared refs."""
    n = size
    log2 = n.bit_length() - 1
    angle, inv_angle, is_vert, ff, idx, fact = _mode_tables(n)
    if c_idx != 0:
        ff = jnp.zeros_like(ff)

    i32 = jnp.int32
    top, left = top.astype(i32), left.astype(i32)
    ftop, fleft = ftop.astype(i32), fleft.astype(i32)

    # Per-mode selected refs (35, 2N) / corners (35,).
    top_m = jnp.where(ff[:, None], ftop[None, :], top[None, :])
    left_m = jnp.where(ff[:, None], fleft[None, :], left[None, :])
    corner_m = jnp.where(ff, fcorner, corner).astype(i32)

    # main/side per family.
    main = jnp.where(is_vert[:, None], top_m, left_m)
    side = jnp.where(is_vert[:, None], left_m, top_m)

    # ref[m] indexed -N..2N at offset N (+1 spare slot for the fact==0 gather).
    npos = 3 * n + 2
    ref = jnp.zeros((35, npos), i32)
    ref = ref.at[:, n].set(corner_m)
    ref = ref.at[:, n + 1:3 * n + 1].set(main)
    # negative extension: ref[N + i] for i in [-N..-1]. One-hot contraction
    # instead of take_along_axis (whose TPU gather lowering costs ms-scale
    # inside the batched pipelines); exact, since the refs are 8-bit pixel
    # values and every output has exactly one nonzero product.
    i_neg = jnp.arange(-n, 0)
    j = ((i_neg[None, :] * inv_angle[:, None] + 128) >> 8) - 1   # side index
    side_ext = jnp.concatenate([corner_m[:, None], side], axis=1)  # idx -1..2N-1
    ohn = (jnp.clip(j + 1, 0, 2 * n)[:, :, None]
           == jnp.arange(2 * n + 1)[None, None, :])
    neg_vals = jnp.einsum("mit,mt->mi", ohn.astype(jnp.float32),
                          side_ext.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST).astype(i32)
    use_neg = (angle < 0)[:, None] & jnp.ones((1, n), bool)
    ref = ref.at[:, 0:n].set(jnp.where(use_neg, neg_vals, ref[:, 0:n]))

    # angular prediction in vertical orientation: row y of mode m is the
    # contiguous run ref[m, n+1+idx[m,y] : +n+1] (idx in [-n, n], so the
    # run always lies inside ref) — a shift-stack one-hot matmul on the
    # MXU instead of a (35, n, n) gather.
    x = jnp.arange(n)
    cands = jnp.stack([ref[:, 1 + s:1 + s + n + 1]
                       for s in range(2 * n + 1)], axis=1)      # (35,2n+1,n+1)
    ohs = ((idx + n)[:, :, None]
           == jnp.arange(2 * n + 1)[None, None, :])             # (35, n, 2n+1)
    sel = jnp.einsum("mys,msx->myx", ohs.astype(jnp.float32),
                     cands.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST).astype(i32)
    p0 = sel[:, :, :n]
    p1 = sel[:, :, 1:]
    f = fact[:, :, None]
    pred = ((32 - f) * p0 + f * p1 + 16) >> 5                    # (35, y, x)

    # pure hor/ver edge filter (luma, N<32): column 0 (vertical orientation)
    if c_idx == 0 and n < 32:
        maxv = (1 << bit_depth) - 1
        col = jnp.clip(main[:, None, 0] + ((side[:, :n] - corner) >> 1), 0, maxv)
        is_pure = (angle == 0)[:, None]
        pred = pred.at[:, :, 0].set(jnp.where(is_pure, col, pred[:, :, 0]))

    # transpose horizontal-family modes
    pred = jnp.where(is_vert[:, None, None], pred,
                     jnp.transpose(pred, (0, 2, 1)))

    # PLANAR (mode 0) — uses filtered refs per ff[0].
    t0, l0 = top_m[0], left_m[0]
    xx, yy = jnp.meshgrid(x, x)
    planar = ((n - 1 - xx) * l0[yy] + (xx + 1) * t0[n]
              + (n - 1 - yy) * t0[xx] + (yy + 1) * l0[n] + n) >> (log2 + 1)
    pred = pred.at[0].set(planar)

    # DC (mode 1) — unfiltered refs always.
    dc = (jnp.sum(top[:n]) + jnp.sum(left[:n]) + n) >> (log2 + 1)
    dcb = jnp.full((n, n), dc, i32)
    if c_idx == 0 and n < 32:
        dcb = dcb.at[0, :].set((top[:n] + 3 * dc + 2) >> 2)
        dcb = dcb.at[:, 0].set((left[:n] + 3 * dc + 2) >> 2)
        dcb = dcb.at[0, 0].set((left[0] + 2 * dc + top[0] + 2) >> 2)
    pred = pred.at[1].set(dcb)
    return pred


def predict_one_mode(top, left, corner, ftop, fleft, fcorner, m, *,
                     size: int, c_idx: int, bit_depth: int = 8) -> jax.Array:
    """(N, N) int32 prediction for ONE traced mode m — the apply-pass twin
    of predict_all_modes (identical arithmetic, tables indexed by m instead
    of materialising 35 planes). Used by the two-pass intra pipeline where
    the mode is already decided."""
    n = size
    log2 = n.bit_length() - 1
    angle_t, inv_t, is_vert_t, ff_t, _, _ = _mode_tables(n)
    i32 = jnp.int32
    m = jnp.asarray(m, i32)
    angle = jnp.asarray(angle_t)[m]
    inv_angle = jnp.asarray(inv_t)[m]
    is_vert = jnp.asarray(is_vert_t)[m]
    ff = jnp.asarray(ff_t)[m] if c_idx == 0 else jnp.asarray(False)

    top, left = top.astype(i32), left.astype(i32)
    ftop, fleft = ftop.astype(i32), fleft.astype(i32)
    top_m = jnp.where(ff, ftop, top)
    left_m = jnp.where(ff, fleft, left)
    corner_m = jnp.where(ff, fcorner, corner).astype(i32)

    main = jnp.where(is_vert, top_m, left_m)
    side = jnp.where(is_vert, left_m, top_m)

    npos = 3 * n + 2
    ref = jnp.zeros((npos,), i32)
    ref = ref.at[n].set(corner_m)
    ref = ref.at[n + 1:3 * n + 1].set(main)
    i_neg = jnp.arange(-n, 0)
    j = ((i_neg * inv_angle + 128) >> 8) - 1
    side_ext = jnp.concatenate([corner_m[None], side])
    # one-hot contractions instead of gathers (see predict_all_modes) —
    # this function is vmapped over whole-frame block batteries where the
    # TPU gather lowering costs ms-scale per call.
    ohn = (jnp.clip(j + 1, 0, 2 * n)[:, None]
           == jnp.arange(2 * n + 1)[None, :])
    neg_vals = jnp.einsum("it,t->i", ohn.astype(jnp.float32),
                          side_ext.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST).astype(i32)
    ref = ref.at[0:n].set(jnp.where(angle < 0, neg_vals, ref[0:n]))

    x = jnp.arange(n)
    pos = (x + 1) * angle                            # (n,) per-row offsets
    idx = pos >> 5
    fact = pos & 31
    cands = jnp.stack([ref[1 + s:1 + s + n + 1]
                       for s in range(2 * n + 1)])   # (2n+1, n+1)
    ohs = (idx + n)[:, None] == jnp.arange(2 * n + 1)[None, :]
    sel = jnp.einsum("ys,sx->yx", ohs.astype(jnp.float32),
                     cands.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST).astype(i32)
    p0 = sel[:, :n]
    p1 = sel[:, 1:]
    f = fact[:, None]
    pred = ((32 - f) * p0 + f * p1 + 16) >> 5

    if c_idx == 0 and n < 32:
        maxv = (1 << bit_depth) - 1
        col = jnp.clip(main[0] + ((side[:n] - corner_m) >> 1), 0, maxv)
        pred = pred.at[:, 0].set(jnp.where(angle == 0, col, pred[:, 0]))

    pred = jnp.where(is_vert, pred, pred.T)

    t0, l0 = top_m, left_m
    xx, yy = jnp.meshgrid(x, x)
    planar = ((n - 1 - xx) * l0[yy] + (xx + 1) * t0[n]
              + (n - 1 - yy) * t0[xx] + (yy + 1) * l0[n] + n) >> (log2 + 1)
    dc = (jnp.sum(top[:n]) + jnp.sum(left[:n]) + n) >> (log2 + 1)
    dcb = jnp.full((n, n), dc, i32)
    if c_idx == 0 and n < 32:
        dcb = dcb.at[0, :].set((top[:n] + 3 * dc + 2) >> 2)
        dcb = dcb.at[:, 0].set((left[:n] + 3 * dc + 2) >> 2)
        dcb = dcb.at[0, 0].set((left[0] + 2 * dc + top[0] + 2) >> 2)
    return jnp.where(m == 0, planar, jnp.where(m == 1, dcb, pred))
