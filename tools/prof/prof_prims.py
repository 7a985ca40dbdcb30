"""Primitive-level cost table: each encoder primitive looped in-jit x10 on
bench-sized tensors (720p, K=8 frames per dispatch), dispatch floor
subtracted. The numbers localize pathological XLA lowerings (gathers,
transposes, argmin) that hide inside the chunk scan."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.ops import quant as quant_ops
from homerhevc_tpu.ops import sao as sao_ops
from homerhevc_tpu.ops import deblock as dbk
from homerhevc_tpu.pipeline import p_chunk

I32 = jnp.int32
W, H, K, QP = 1280, 736, 8, 32
R = 10
FLOOR = 0.026


def timeit(name, fn, sets):
    out = fn(sets[0])
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
    ts = []
    for s in sets[1:]:
        t0 = time.perf_counter()
        out = fn(s)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
        ts.append(time.perf_counter() - t0)
    net = (min(ts) - FLOOR) / (K * R) * 1e3
    print(f"{name:26s} {net:8.3f} ms/frame", flush=True)


def loop(fn):
    def run(x):
        def body(i, y):
            o = fn(y)
            # keep a data dependency so the loop can't be collapsed
            return y ^ (o.reshape(-1)[:1].astype(y.dtype) & 1)
        return jax.lax.fori_loop(0, K * R, body, x)
    return jax.jit(run)


def mksets(shape, dtype=np.int32, lo=-100, hi=101):
    out = []
    for s in range(3):
        r = np.random.default_rng(s)
        out.append(jnp.asarray(r.integers(lo, hi, shape, dtype)))
    for s in out:
        np.asarray(s.reshape(-1)[:4])
    return out


# ---- SBH on the lev16 shape ----
lev16 = mksets((3680, 16, 16))
timeit("sbh (3680,16,16)", loop(
    lambda x: quant_ops.sign_bit_hiding(x, x * 17, QP, 4)), lev16)
lev32 = mksets((920, 32, 32))
timeit("sbh (920,32,32)", loop(
    lambda x: quant_ops.sign_bit_hiding(x, x * 17, QP, 5)), lev32)
timeit("quantize 16", loop(
    lambda x: quant_ops.quantize(x * 9, QP, 4, is_intra=False)), lev16)
timeit("dequantize 16", loop(
    lambda x: quant_ops.dequantize(x, QP, 4)), lev16)
timeit("level_bits_est 16", loop(
    lambda x: tables.level_bits_est(x, xp=jnp)), lev16)

# ---- deblock / sao on frame planes ----
pl = mksets((H, W), np.int32, 0, 256)


def deblock_full(y):
    bs = jnp.ones((H // 4, W // 4), jnp.int8)
    qp_map = jnp.full((H // 4, W // 4), QP, I32)
    fy, fu, fv = dbk.deblock_frame(y, y[:H // 2, :W // 2],
                                   y[:H // 2, :W // 2], bs_v=bs, bs_h=bs,
                                   qp_map=qp_map, xp=jnp)
    return fy


timeit("deblock_frame", loop(deblock_full), pl)


def sao_full(y):
    st = sao_ops._stats_device_one(y, jnp.clip(y + 1, 0, 255), 32, jnp)
    return st[0] if isinstance(st, tuple) else st


timeit("sao stats luma", loop(sao_full), pl)

# ---- wire compaction ----
cap = max(1024, (H // 4) * (W // 4) * 3 // 2 // 32)


def compact(y):
    lv4 = jnp.concatenate([p_chunk._to4(y), p_chunk._to4(y[:H // 2, :W // 2]),
                           p_chunk._to4(y[:H // 2, :W // 2])])
    nzm = jnp.any(lv4 != 0, axis=1)
    L4 = lv4.shape[0]
    (idx,) = jnp.nonzero(nzm, size=cap, fill_value=L4)
    vals = jnp.take(lv4, jnp.minimum(idx, L4 - 1), axis=0)
    return jnp.where((idx < L4)[:, None], vals, 0)


timeit("wire compact", loop(compact), pl)

# ---- rd_zero-ish SSD + bits over blocks ----
blk = mksets((920, 32, 32), np.int32, 0, 256)


def rdz(x):
    ssd = jnp.sum((x - (x >> 1)) * (x - (x >> 1)), axis=(-1, -2))
    bits = jnp.minimum(tables.level_bits_est(x, xp=jnp), 16383)
    return ssd + bits


timeit("ssd+bits (920,32,32)", loop(rdz), blk)

# ---- argmin over 49 candidates ----
c49 = mksets((49, 3680))
timeit("argmin49+take", loop(
    lambda c: jnp.take_along_axis(
        c, jnp.argmin(c, axis=0)[None].astype(I32), axis=0)), c49)
