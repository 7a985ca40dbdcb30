"""JAX integer transforms (HM forward schedule; spec 8.6.4 inverse).

TPU notes: the two-stage butterflies are expressed as dense matmuls so XLA
can tile them onto the MXU; integer exactness is preserved by computing in
int32 (and, on the optimized path, by hi/lo int8 decomposition so the MXU's
int8 path can be used exactly). Equivalent of hmr_transform.c +
hmr_sse42_functions_transform.c.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables


@functools.lru_cache(maxsize=None)
def _t(n: int, is_dst: bool = False) -> np.ndarray:
    # numpy (not jnp): a cached jnp array would capture a traced constant
    # and leak it across jit traces.
    m = tables.DST4 if is_dst else tables.dct_matrix(n)
    return np.asarray(m, dtype=np.int32)


def _round_shift(v, s: int):
    return (v + (1 << (s - 1))) >> s


def forward_transform(residual: jax.Array, *, is_dst: bool = False,
                      bit_depth: int = 8) -> jax.Array:
    """Forward transform of (..., N, N) int32 residual blocks."""
    n = residual.shape[-1]
    log2 = n.bit_length() - 1
    t = _t(n, is_dst)
    s1, s2 = tables.fwd_transform_shifts(log2, bit_depth)
    x = residual.astype(jnp.int32)
    # stage 1: row transform -> tmp[..., hfreq, row]
    tmp = _round_shift(jnp.einsum("ki,...ji->...kj", t, x), s1)
    # stage 2: column transform -> out[..., vfreq, hfreq]
    out = _round_shift(jnp.einsum("kj,...hj->...kh", t, tmp), s2)
    return out.astype(jnp.int32)


def inverse_transform(coeff: jax.Array, *, is_dst: bool = False,
                      bit_depth: int = 8) -> jax.Array:
    """Inverse transform with normative 16-bit intermediate clipping."""
    n = coeff.shape[-1]
    t = _t(n, is_dst)
    s1, s2 = tables.inv_transform_shifts(bit_depth)
    c = coeff.astype(jnp.int32)
    tmp = jnp.clip(_round_shift(jnp.einsum("vi,...vh->...ih", t, c), s1),
                   -32768, 32767)
    out = jnp.clip(_round_shift(jnp.einsum("hj,...ih->...ij", t, tmp), s2),
                   -32768, 32767)
    return out.astype(jnp.int32)
