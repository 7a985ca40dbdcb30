"""Inter-prediction interpolation (spec 8.5.4.2.2): 8-tap luma quarter-pel,
4-tap chroma eighth-pel, and motion compensation with edge extension.

Role of the reference's hmr_motion_inter.c interpolation kernels
(/root/reference/src/homer_lib/hmr_motion_inter.c:262-975), re-derived from
the spec. Written against the `xp` array namespace: numpy oracle == JAX
device code.
"""

from __future__ import annotations

import numpy as np

# Luma fractional-sample filters fL[frac][i], frac = 0..3 (spec Table 8-11).
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)

# Chroma filters fC[frac][i], frac = 0..7 (spec Table 8-13).
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int32)


def pad_plane(plane: np.ndarray, pad: int, xp=np):
    """Edge-replicate padding (role of reference_picture_border_padding,
    hmr_encoder_lib.c:1672)."""
    return xp.pad(plane, pad, mode="edge")


def _filt_h(xp, block, taps, ntap):
    """Horizontal FIR: block (..., H, W + ntap - 1) -> (..., H, W)."""
    acc = 0
    for i in range(ntap):
        acc = acc + taps[i] * block[..., :, i:i + block.shape[-1] - ntap + 1]
    return acc


def _filt_v(xp, block, taps, ntap):
    acc = 0
    for i in range(ntap):
        acc = acc + taps[i] * block[..., i:i + block.shape[-2] - ntap + 1, :]
    return acc


def mc_luma(ref_pad: np.ndarray, pad: int, x0: int, y0: int, h: int, w: int,
            mv_x: int, mv_y: int, xp=np) -> np.ndarray:
    """Motion-compensated luma block, uni-prediction (spec 8.5.4.2.2.1 +
    default weighted sample process 8.5.4.2.3.1).

    ref_pad: edge-padded reference plane (int32), pad >= 3 + max|mv|/4 + 4.
    (x0, y0): block position in unpadded coords; mv in quarter-pel units.
    Returns (h, w) uint8-range int32.
    """
    ix = x0 + (mv_x >> 2)
    iy = y0 + (mv_y >> 2)
    fx = mv_x & 3
    fy = mv_y & 3
    # Top-left of the 8-tap support in padded coords.
    px = ix + pad - 3
    py = iy + pad - 3
    if fx == 0 and fy == 0:
        return ref_pad[py + 3:py + 3 + h, px + 3:px + 3 + w].astype(xp.int32)
    if fy == 0:
        win = ref_pad[py + 3:py + 3 + h, px:px + w + 7].astype(xp.int32)
        val = _filt_h(xp, win, LUMA_FILTERS[fx], 8)
        return xp.clip((val + 32) >> 6, 0, 255)
    if fx == 0:
        win = ref_pad[py:py + h + 7, px + 3:px + 3 + w].astype(xp.int32)
        val = _filt_v(xp, win, LUMA_FILTERS[fy], 8)
        return xp.clip((val + 32) >> 6, 0, 255)
    win = ref_pad[py:py + h + 7, px:px + w + 7].astype(xp.int32)
    tmp = _filt_h(xp, win, LUMA_FILTERS[fx], 8)          # 14-bit intermediate
    val = _filt_v(xp, tmp, LUMA_FILTERS[fy], 8) >> 6
    return xp.clip((val + 32) >> 6, 0, 255)


def mc_luma_hp(ref_pad, pad, x0, y0, h, w, mv_x, mv_y, xp=np):
    """14-bit intermediate luma MC (no final shift/clip) for bi-prediction
    (spec 8.5.4.2.2.1 predSampleLX values)."""
    ix = x0 + (mv_x >> 2)
    iy = y0 + (mv_y >> 2)
    fx = mv_x & 3
    fy = mv_y & 3
    px = ix + pad - 3
    py = iy + pad - 3
    if fx == 0 and fy == 0:
        return ref_pad[py + 3:py + 3 + h, px + 3:px + 3 + w].astype(xp.int32) << 6
    if fy == 0:
        win = ref_pad[py + 3:py + 3 + h, px:px + w + 7].astype(xp.int32)
        return _filt_h(xp, win, LUMA_FILTERS[fx], 8)
    if fx == 0:
        win = ref_pad[py:py + h + 7, px + 3:px + 3 + w].astype(xp.int32)
        return _filt_v(xp, win, LUMA_FILTERS[fy], 8)
    win = ref_pad[py:py + h + 7, px:px + w + 7].astype(xp.int32)
    tmp = _filt_h(xp, win, LUMA_FILTERS[fx], 8)
    return _filt_v(xp, tmp, LUMA_FILTERS[fy], 8) >> 6


def mc_chroma_hp(ref_pad, pad, x0, y0, h, w, mv_x, mv_y, xp=np):
    """14-bit intermediate chroma MC for bi-prediction (8.5.4.2.2.2)."""
    ix = x0 + (mv_x >> 3)
    iy = y0 + (mv_y >> 3)
    fx = mv_x & 7
    fy = mv_y & 7
    px = ix + pad - 1
    py = iy + pad - 1
    if fx == 0 and fy == 0:
        return ref_pad[py + 1:py + 1 + h, px + 1:px + 1 + w].astype(xp.int32) << 6
    if fy == 0:
        win = ref_pad[py + 1:py + 1 + h, px:px + w + 3].astype(xp.int32)
        return _filt_h(xp, win, CHROMA_FILTERS[fx], 4)
    if fx == 0:
        win = ref_pad[py:py + h + 3, px + 1:px + 1 + w].astype(xp.int32)
        return _filt_v(xp, win, CHROMA_FILTERS[fy], 4)
    win = ref_pad[py:py + h + 3, px:px + w + 3].astype(xp.int32)
    tmp = _filt_h(xp, win, CHROMA_FILTERS[fx], 4)
    return _filt_v(xp, tmp, CHROMA_FILTERS[fy], 4) >> 6


def bi_average(hp0, hp1, xp=np):
    """Default bi-prediction combine (spec 8.5.4.2.3.1, 8-bit output)."""
    return xp.clip((hp0 + hp1 + 64) >> 7, 0, 255)


def mc_chroma(ref_pad: np.ndarray, pad: int, x0: int, y0: int, h: int, w: int,
              mv_x: int, mv_y: int, xp=np) -> np.ndarray:
    """Chroma MC (spec 8.5.4.2.2.2). (x0, y0) in chroma samples; mv is the
    LUMA quarter-pel vector (chroma frac = mv & 7 in eighth-pel)."""
    ix = x0 + (mv_x >> 3)
    iy = y0 + (mv_y >> 3)
    fx = mv_x & 7
    fy = mv_y & 7
    px = ix + pad - 1
    py = iy + pad - 1
    if fx == 0 and fy == 0:
        return ref_pad[py + 1:py + 1 + h, px + 1:px + 1 + w].astype(xp.int32)
    if fy == 0:
        win = ref_pad[py + 1:py + 1 + h, px:px + w + 3].astype(xp.int32)
        val = _filt_h(xp, win, CHROMA_FILTERS[fx], 4)
        return xp.clip((val + 32) >> 6, 0, 255)
    if fx == 0:
        win = ref_pad[py:py + h + 3, px + 1:px + 1 + w].astype(xp.int32)
        val = _filt_v(xp, win, CHROMA_FILTERS[fy], 4)
        return xp.clip((val + 32) >> 6, 0, 255)
    win = ref_pad[py:py + h + 3, px:px + w + 3].astype(xp.int32)
    tmp = _filt_h(xp, win, CHROMA_FILTERS[fx], 4)
    val = _filt_v(xp, tmp, CHROMA_FILTERS[fy], 4) >> 6
    return xp.clip((val + 32) >> 6, 0, 255)
