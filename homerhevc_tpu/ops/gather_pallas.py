"""Pallas TPU kernel: batched per-block window gather.

The P pipeline needs, for every S-sized block b of the frame, a (G, G)
pixel window from the padded reference plane at the block's integer-MV
offset (subpel refinement support, MC, chroma MC, ME refine). XLA lowers
the natural vmap(dynamic_slice) to a device while-loop of one tiny
dynamic-slice + dynamic-update-slice per block (~1.3 us x 3680 blocks
~= 4.7 ms/frame per gather site at 720p — measured; the four sites were
~17 ms/frame, the single largest cost of the P chunk body).

Kernel shape (role of the reference's mem_transfer window staging,
hmr_mem_transfer.c:284): grid over block rows; each program DMAs the
band of the plane that can contain its row's windows (row pitch S_row,
per-block offset bounded by the ME search range) into VMEM once, then
copies each block's window out with on-chip dynamic slices. Output is
(nb, G, G); callers transpose to the (G, G, nb) lane-major compute
layout (one XLA transpose ~= 50 us, vs ms-scale loop gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gw_kernel(by_ref, bx_ref, plane_hbm, out_ref, band, band32, sem, *,
               G, nbx, S_row, lo, band_h, Wp, Hp):
    # Mosaic only allows vector loads at 8-aligned sublane / 128-aligned
    # lane starts: load an aligned super-window and rotate the residual
    # offset in-register (pltpu.roll wraps, and the band scratch is
    # over-allocated by one tile in each dim, so the aligned load is
    # always in bounds and the first G rows/cols after the roll are the
    # requested window).
    i = pl.program_id(0)
    # 8-align the band start (DMA source slicing requires tile-aligned
    # rows) and clamp so it never runs off the plane's bottom edge
    row0 = jnp.minimum(((i * S_row + lo) >> 3) << 3, Hp - band_h)
    row0 = pl.multiple_of(row0, 8)
    dma = pltpu.make_async_copy(
        plane_hbm.at[pl.ds(row0, band_h), :], band.at[:band_h, :Wp], sem)
    # Wp is lane-aligned (caller pads the plane to a 128 multiple)
    dma.start()
    Gy = ((G + 8 + 7) // 8) * 8        # rotate needs 8x128-aligned shapes
    Gx = ((G + 127) // 128 + 1) * 128
    dma.wait()
    # dynamic sublane slicing of (2,1)-packed int16 VMEM miscompiles on
    # Mosaic (off-by-tile rows observed on v5e); widen the band to int32
    # once per program and slice that instead
    band32[...] = band[...].astype(jnp.int32)

    def body(b, _):
        dy = by_ref[i * nbx + b] - row0
        dx = bx_ref[i * nbx + b]
        dy0 = pl.multiple_of((dy >> 3) << 3, 8)
        dx0 = pl.multiple_of((dx >> 7) << 7, 128)
        big = band32[pl.ds(dy0, Gy), pl.ds(dx0, Gx)]
        # positive rotate amounts only: Mosaic's dynamic rotate with a
        # negative shift miscompiles on v5e for multi-tile row counts
        # (observed +24-row offset on a 40-row vector)
        big = pltpu.roll(big, Gy - (dy - dy0), 0)
        big = pltpu.roll(big, Gx - (dx - dx0), 1)
        out_ref[b] = big[:G, :G].astype(jnp.int16)
        return 0

    jax.lax.fori_loop(0, nbx, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("nby", "nbx", "G", "S_row", "lo",
                                    "band_h", "interpret"))
def gather_windows_grid(plane: jax.Array, by: jax.Array, bx: jax.Array, *,
                        nby: int, nbx: int, G: int, S_row: int, lo: int,
                        band_h: int, interpret: bool = False) -> jax.Array:
    """Gather (G, G) windows at absolute top-left (by[b], bx[b]).

    plane: (Hp, Wp) int16. by, bx: (nb,) int32, nb = nby * nbx with
    blocks in raster order and row pitch S_row; for every block of block
    row i, by[b] - (i*S_row + lo) must lie in [0, band_h - G] (the caller
    knows its ME bound). Returns (nb, G, G) int16."""
    Hp, Wp = plane.shape
    nb = nby * nbx
    assert by.shape == (nb,) and bx.shape == (nb,)
    band_h = ((band_h + 7) // 8) * 8 + 8   # aligned rows + align-down slack
    assert band_h <= Hp and lo >= 0 and Hp % 8 == 0
    if Wp % 128:                        # lane-align the DMA'd width
        plane = jnp.pad(plane, ((0, 0), (0, 128 - Wp % 128)))
        Wp = plane.shape[1]
    kernel = functools.partial(_gw_kernel, G=G, nbx=nbx, S_row=S_row,
                               lo=lo, band_h=band_h, Wp=Wp, Hp=Hp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nby,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((nbx, G, G), lambda i, by, bx: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((band_h + 16, Wp + 256), jnp.int16),
                        pltpu.VMEM((band_h + 16, Wp + 256), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, G, G), jnp.int16),
        interpret=interpret,
    )(by.astype(jnp.int32), bx.astype(jnp.int32), plane.astype(jnp.int16))
    return out
