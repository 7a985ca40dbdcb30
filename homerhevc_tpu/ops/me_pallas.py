"""Pallas TPU kernel for the integer-pel motion search.

Role of the reference's SAD hot loop (SURVEY.md §3.4 hot loop (a);
hmr_sse42_functions_pixel.c SAD kernels): for every B x B block, the best
(cost, offset) over the (2S+1)^2 search window, cost = SAD + mvcost[offset].

Kernel shape: grid over CTU rows. Each program DMAs its (overlapping)
reference band — B + 2S rows by W + 2S columns — from HBM into a VMEM
scratch once, then sweeps the whole window with VPU abs-diff reductions.
The XLA fallback in p_jax re-streams shifted HBM slices per offset; here
the band stays resident in VMEM for all (2S+1)^2 offsets.

First-minimum semantics (flat (dy, dx) raster order, strict less) are
identical to the golden encoder's argmin, so streams stay bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _me_kernel(cur_ref, ref_hbm, mvcost_ref, cost_out, idx_out,
               band, sem, *, B, S, nbx, W):
    # cost_out/idx_out are whole-(nby, nbx) revisited blocks; program i
    # writes row i (keeps the last-dim small outputs alignment-legal).
    n = 2 * S + 1
    band_h = B + 2 * S
    i = pl.program_id(0)

    dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * B, band_h), :], band, sem)
    dma.start()
    dma.wait()

    cur32 = cur_ref[:, :].astype(jnp.int32)

    def body(o, carry):
        best_c, best_o = carry
        dy = o // n
        dx = o % n
        win = band[pl.ds(dy, B), pl.ds(dx, W)]
        diff = jnp.abs(cur32 - win.astype(jnp.int32))
        col = jnp.sum(diff, axis=0)                           # (W,)
        sad = jnp.sum(col.reshape(nbx, B), axis=1)            # (nbx,)
        cost = sad + mvcost_ref[0, o]
        better = cost < best_c
        return (jnp.where(better, cost, best_c),
                jnp.where(better, o, best_o))

    big = jnp.full((nbx,), 1 << 30, jnp.int32)
    best_c, best_o = jax.lax.fori_loop(0, n * n, body,
                                       (big, jnp.zeros((nbx,), jnp.int32)))
    cost_out[i, :] = best_c
    idx_out[i, :] = best_o


@functools.partial(jax.jit, static_argnames=("B", "search", "pad",
                                             "interpret"))
def integer_me_pallas(cur: jax.Array, ref_pad: jax.Array, mvcost: jax.Array,
                      *, B: int, search: int, pad: int,
                      interpret: bool = False):
    """cur: (H, W); ref_pad: (H + 2*pad, W + 2*pad); mvcost: (n*n,) int32.

    Returns (best_cost, best_idx) each (nby, nbx) int32; idx flattens
    (dy, dx) over the window in raster order (dy = idx // n - search).
    """
    H, W = cur.shape
    nby, nbx = H // B, W // B
    S = search
    band_h = B + 2 * S
    cur16 = cur.astype(jnp.int16)
    # Window rows/cols only: [pad-S, pad-S + H+2S) x [pad-S, pad-S + W+2S).
    ref_win = jax.lax.dynamic_slice(
        ref_pad.astype(jnp.int16), (pad - S, pad - S), (H + 2 * S, W + 2 * S))

    kernel = functools.partial(_me_kernel, B=B, S=S, nbx=nbx, W=W)
    cost, idx = pl.pallas_call(
        kernel,
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((nby, nbx), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nby, nbx), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nby, nbx), jnp.int32),
                   jax.ShapeDtypeStruct((nby, nbx), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((band_h, W + 2 * S), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(cur16, ref_win, mvcost.reshape(1, -1).astype(jnp.int32))
    return cost, idx
