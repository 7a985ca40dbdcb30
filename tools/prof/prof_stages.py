import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu import tables
from homerhevc_tpu.ops import deblock as dbk

W, H = 1280, 736
rng = np.random.default_rng(0)
def mk(h, w):
    return jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.uint8))
y, u, v = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)
ry0, ru0, rv0 = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)

@functools.partial(jax.jit, static_argnames=("B", "search"))
def ime(y, ry, B, search):
    cur = y.astype(jnp.int32)
    ryp = jnp.pad(ry.astype(jnp.int32), PAD, mode="edge")
    lam = jnp.asarray(tables.LAMBDA_ME_FX)[32]
    n = 2 * search + 1
    bits1 = p_jax._bits_tab(4*search)[np.abs(4*np.arange(-search, search+1))]
    bits2 = jnp.asarray(bits1[:, None] + bits1[None, :], jnp.int32)
    mvcost = ((lam * bits2) >> 8).reshape(-1)
    nby, nbx = H // B, W // B
    cur16 = cur.astype(jnp.int16)

    def step(carry, dyi):
        best_cost, best_o = carry
        row_band = jax.lax.dynamic_slice(ryp, (PAD - search + dyi, 0),
                                         (H, W + 2 * PAD))

        def sad_dx(dxi):
            shifted = jax.lax.dynamic_slice(
                row_band, (0, PAD - search + dxi), (H, W)).astype(jnp.int16)
            return jnp.abs(cur16 - shifted)

        diffs = jax.vmap(sad_dx)(jnp.arange(n, dtype=jnp.int32))
        from homerhevc_tpu.ops import blocksum
        sads = blocksum.block_sum(diffs, B, B, xp=jnp)
        cost = sads + mvcost.reshape(n, n)[dyi][:, None, None]
        kx = jnp.argmin(cost, axis=0).astype(jnp.int32)
        val = jnp.take_along_axis(cost, kx[None], axis=0)[0]
        o = dyi * n + kx
        better = val < best_cost
        return (jnp.where(better, val, best_cost),
                jnp.where(better, o, best_o)), None

    big = jnp.full((nby, nbx), 1 << 30, jnp.int32)
    (best_cost, best_o), _ = jax.lax.scan(
        step, (big, jnp.zeros((nby, nbx), jnp.int32)),
        jnp.arange(n, dtype=jnp.int32))
    return best_cost, best_o

@functools.partial(jax.jit, static_argnames=("S",))
def lev(y, u, v, ry, ru, rv, ivy, ivx, S):
    qp = jnp.asarray(32, jnp.int32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam = jnp.asarray(tables.LAMBDA_ME_FX)[qp]
    ryp = jnp.pad(ry.astype(jnp.int32), PAD, mode="edge")
    rup = jnp.pad(ru.astype(jnp.int32), PAD//2, mode="edge")
    rvp = jnp.pad(rv.astype(jnp.int32), PAD//2, mode="edge")
    e = p_jax._level_encode(y.astype(jnp.int32), u, v, ryp, rup, rvp, ivy,
                            ivx, S=S, qp=qp, qp_c=qp_c, lam=lam, search=16,
                            me_precision=2, sign_hiding=True)
    return e["rec_y"], e["lev_y"]

@jax.jit
def dbl(ryc, ruc, rvc, mvs, cbf):
    bs_v, bs_h = dbk.inter_bs_from_blocks(mvs, cbf, 32, xp=jnp)
    qp_map = jnp.full((H//4, W//4), 32, jnp.int32)
    return dbk.deblock_frame(ryc.astype(jnp.int32), ruc.astype(jnp.int32),
                             rvc.astype(jnp.int32), bs_v=bs_v, bs_h=bs_h,
                             qp_map=qp_map, xp=jnp)

def tm(name, f, *args):
    o = f(*args)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
    ts = []
    for i in range(3):
        a0 = np.asarray(args[0])
        varied = jnp.asarray(a0 ^ np.asarray(i + 1, a0.dtype))
        varied.block_until_ready()          # upload outside the timed window
        t0 = time.perf_counter()
        o = f(varied, *args[1:])
        jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {[round(t,3) for t in ts]}", flush=True)
    return o

cost, besto = tm("int ME xla B=32 r=16", ime, y, ry0, 32, 16)
n = 33
ivy = (besto // n - 16).astype(jnp.int32)
ivx = (besto % n - 16).astype(jnp.int32)
tm("level_encode S=32", lev, y, u, v, ry0, ru0, rv0, ivy, ivx, 32)
nby, nbx = H//32, W//32
i16y = jnp.zeros((H//16, W//16), jnp.int32)
tm("level_encode S=16", lev, y, u, v, ry0, ru0, rv0, i16y, i16y, 16)
mvs = jnp.stack([ivx*4, ivy*4], -1)
cbf = jnp.ones((nby, nbx), bool)
tm("deblock frame", dbl, y, u, v, mvs, cbf)
tm("sadgrid16", jax.jit(lambda c, r: p_jax._sad_grids(
    c.astype(jnp.int16), jnp.pad(r.astype(jnp.int32), PAD, mode="edge"),
    S=16, search=16)), y, ry0)
