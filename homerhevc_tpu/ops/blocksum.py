"""MXU block-sum primitive: per-block sums of a whole-frame plane as
one-hot f32 matmuls.

The TPU-native replacement for the reference's per-block SAD/SSD reduction
loops (hmr_sse42_functions_pixel.c SAD kernels; plain-C sad/ssd at
hmr_motion_intra.c:51/:128): `X.reshape(nby, B, nbx, B).sum((1, 3))` is a
strided small-segment reduction that wastes the (8, 128) vector lanes,
while `P_L @ X @ P_R` with 0/1 selection matrices runs on the systolic
array at full tile utilisation.

Exactness: every partial sum is an integer and f32 addition of integers is
exact below 2**24, so results are bit-deterministic across backends for
|X| sums < 2**24 — true for SAD at any block size <= 64 (64*64*255 ~ 1e6)
and for SSD up to 16x16 (256 * 255^2 ~ 1.7e7). Larger SSD blocks must sum
int32 over 16-granular partials (`block_sum` picks this automatically via
the `max_cell` argument).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _pool_mats_np(h: int, w: int, by: int, bx: int):
    """(P_L, P_R) f32 one-hot pooling matrices: P_L (h//by, h), P_R (w, w//bx)."""
    nby, nbx = h // by, w // bx
    pl = np.zeros((nby, h), np.float32)
    pl[np.arange(h) // by, np.arange(h)] = 1.0
    pr = np.zeros((w, nbx), np.float32)
    pr[np.arange(w), np.arange(w) // bx] = 1.0
    return pl, pr


def block_sum_f32(x, by: int, bx: int, xp=np):
    """Per-(by, bx)-block sums of x (..., H, W) -> (..., H//by, W//bx) f32.

    Caller guarantees each block sum < 2**24 (use block_sum for the general
    int case)."""
    h, w = x.shape[-2:]
    pl, pr = _pool_mats_np(h, w, by, bx)
    if xp is not np:
        pl, pr = xp.asarray(pl), xp.asarray(pr)
    xf = x.astype(xp.float32)
    return pl @ xf @ pr


def block_sum(x, by: int, bx: int, xp=np, max_cell: int = 16):
    """Exact int32 per-block sums of a nonneg-int plane x (..., H, W).

    Sums f32 at <=max_cell granularity (exact), then integer sum-pools up
    to (by, bx). x entries must satisfy max_cell**2 * max|x| < 2**24."""
    cy, cx = min(by, max_cell), min(bx, max_cell)
    s = block_sum_f32(x, cy, cx, xp=xp).astype(xp.int32)
    ry, rx = by // cy, bx // cx
    if ry == 1 and rx == 1:
        return s
    h, w = s.shape[-2:]
    lead = s.shape[:-2]
    return (s.reshape(lead + (h // ry, ry, w // rx, rx))
            .sum(axis=(-3, -1)))
