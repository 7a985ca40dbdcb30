import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from homerhevc_tpu.ops import deblock as dbk
from homerhevc_tpu import tables

W, H = 1280, 736
rng = np.random.default_rng(0)
y = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
nS, nE = H // 4, W // 8 - 1
bs = jnp.asarray(rng.integers(0, 3, (nS, nE), dtype=np.int32))
qp = jnp.full((nS, nE), 32, jnp.int32)

@jax.jit
def cur(y, bs):
    return dbk._luma_vertical_pass(jnp, y.astype(jnp.int32), bs, qp, qp, 0, 0)

@jax.jit
def strided(y, bs):
    """Strided-column formulation: p/q as (H, nE) stride-8 column slices."""
    xp = jnp
    yy = y.astype(jnp.int32)
    cols = [yy[:, 4 + k:W - 4 + k - 7 + 7:8][:, :nE] for k in range(8)]
    # columns of edge j at 8*(j+1): p3 = col 8j+4 .. q3 = 8j+11
    p3, p2, p1, p0, q0, q1, q2, q3 = cols
    qp_l = (qp + qp + 1) >> 1
    beta = jnp.asarray(tables.DEBLOCK_BETA)
    tc_t = jnp.asarray(tables.DEBLOCK_TC)
    bta = beta[xp.clip(qp_l, 0, 51)]
    tc = tc_t[xp.clip(qp_l + 2 * (bs - 1), 0, 53)]
    # upsample seg-row (nS, nE) -> (H, nE)
    def up(a):
        return jnp.repeat(a, 4, axis=0)
    b4, tc4 = up(bta), up(tc)
    ad = jnp.abs
    dp = ad(p2 - 2 * p1 + p0); dq = ad(q2 - 2 * q1 + q0)
    dp0, dp3 = dp[0::4], dp[3::4]
    dq0, dq3 = dq[0::4], dq[3::4]
    d = dp0 + dp3 + dq0 + dq3
    filt = (bs > 0) & (d < bta)
    strong = filt
    sp0 = xp.clip((p2 + 2*p1 + 2*p0 + 2*q0 + q1 + 4) >> 3, p0 - 2*tc4, p0 + 2*tc4)
    sq0 = xp.clip((q2 + 2*q1 + 2*q0 + 2*p0 + p1 + 4) >> 3, q0 - 2*tc4, q0 + 2*tc4)
    m = up(strong.astype(jnp.int32))
    return sp0 * m + sq0 * m

@jax.jit
def shifted(y, bs):
    """Whole-frame shifted-plane formulation (sketch: strong filter only)."""
    xp = jnp
    yy = y.astype(jnp.int32)
    sh = {k: jnp.roll(yy, -k, axis=1) for k in range(-4, 4)}
    # every pixel computes as if p0 (edge right of it) and q0
    p2, p1, p0, q0, q1, q2 = sh[-2], sh[-1], sh[0], sh[1], sh[2], sh[3]
    sp0 = xp.clip((p2 + 2*p1 + 2*p0 + 2*q0 + q1 + 4) >> 3, 0, 255)
    sq0 = xp.clip((q2 + 2*q1 + 2*q0 + 2*p0 + p1 + 4) >> 3, 0, 255)
    colr = jnp.arange(W) & 7
    return jnp.where(colr[None, :] == 7, sp0, jnp.where(colr[None, :] == 0, sq0, yy))

def tm(name, f, *args):
    o = f(*args); jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
    ts = []
    for i in range(3):
        a0 = np.asarray(args[0])
        varied = jnp.asarray(a0 ^ np.asarray(i + 1, a0.dtype)); varied.block_until_ready()
        t0 = time.perf_counter()
        o = f(varied, *args[1:])
        jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {[round(t,4) for t in ts]}", flush=True)

tm("current luma_v pass", cur, y, bs)
tm("strided cols", strided, y, bs)
tm("shifted planes", shifted, y, bs)
tm("transpose only", jax.jit(lambda y, b: y.T.astype(jnp.int32) + 1), y, bs)
