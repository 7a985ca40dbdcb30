"""JAX quantisation / dequantisation (HM forward; spec 8.6.3 inverse).

Equivalent of hmr_quant.c:172-258 — elementwise integer ops that XLA fuses
into the surrounding transform matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import tables


def quantize(coeff: jax.Array, qp: int, log2_size: int, *, is_intra: bool,
             bit_depth: int = 8) -> jax.Array:
    tshift = tables.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = tables.QUANT_SHIFT + qp // 6 + tshift
    scale = int(tables.QUANT_SCALES[qp % 6])
    add = (171 if is_intra else 85) << (qbits - 9)
    c = coeff.astype(jnp.int64)
    level = (jnp.abs(c) * scale + add) >> qbits
    level = jnp.clip(level, 0, 32767)
    return (jnp.sign(c) * level).astype(jnp.int32)


def dequantize(level: jax.Array, qp: int, log2_size: int,
               bit_depth: int = 8) -> jax.Array:
    bd_shift = bit_depth + log2_size - 5
    scale = int(tables.INV_QUANT_SCALES[qp % 6]) << (qp // 6)
    c = level.astype(jnp.int64) * (scale * 16)
    c = (c + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(c, -32768, 32767).astype(jnp.int32)
