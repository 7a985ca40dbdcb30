import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu import tables
from homerhevc_tpu.ops import deblock as dbk, sao

W, H = 1280, 736
rng = np.random.default_rng(0)
def mk(h, w):
    return jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.uint8))
y, u, v = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)
ry0, ru0, rv0 = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)

def stage_fn(n_stages):
    @jax.jit
    def f(y):
        qp = jnp.asarray(32, jnp.int32)
        qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
        lam = jnp.asarray(tables.LAMBDA_ME_FX)[qp]
        cur = y.astype(jnp.int32)
        ryp = jnp.pad(ry0.astype(jnp.int32), PAD, mode="edge")
        rup = jnp.pad(ru0.astype(jnp.int32), PAD//2, mode="edge")
        rvp = jnp.pad(rv0.astype(jnp.int32), PAD//2, mode="edge")
        acc = []
        g16 = p_jax._sad_grids(cur.astype(jnp.int16), ryp, S=16, search=16)
        acc.append(g16.sum())
        if n_stages >= 2:
            n = 33
            k = jnp.argmin(g16, axis=0).astype(jnp.int32)
            ivy = k // n - 16; ivx = k % n - 16
            e16 = p_jax._level_encode(cur, u, v, ryp, rup, rvp, ivy, ivx,
                                      S=16, qp=qp, qp_c=qp_c, lam=lam,
                                      search=16, me_precision=2,
                                      sign_hiding=True)
            acc.append(e16["rec_y"].sum())
        if n_stages >= 3:
            g32 = g16.reshape(33*33, H//32, 2, W//32, 2).sum(axis=(2, 4))
            k = jnp.argmin(g32, axis=0).astype(jnp.int32)
            ivy = k // 33 - 16; ivx = k % 33 - 16
            e32 = p_jax._level_encode(cur, u, v, ryp, rup, rvp, ivy, ivx,
                                      S=32, qp=qp, qp_c=qp_c, lam=lam,
                                      search=16, me_precision=2,
                                      sign_hiding=True)
            acc.append(e32["rec_y"].sum())
        if n_stages >= 4:
            recy = e32["rec_y"].transpose(0, 2, 1, 3).reshape(H, W)
            recu = e32["rec_u"].transpose(0, 2, 1, 3).reshape(H//2, W//2)
            recv = e32["rec_v"].transpose(0, 2, 1, 3).reshape(H//2, W//2)
            mvs = jnp.stack([e32["mvx"], e32["mvy"]], -1)
            cbf = jnp.any(e32["lev_y"] != 0, axis=(-1, -2))
            bs_v, bs_h = dbk.inter_bs_from_blocks(mvs, cbf, 32, xp=jnp)
            qp_map = jnp.full((H//4, W//4), 32, jnp.int32)
            fy, fu, fv = dbk.deblock_frame(recy, recu, recv, bs_v=bs_v,
                                           bs_h=bs_h, qp_map=qp_map, xp=jnp)
            acc.append(fy.sum())
        if n_stages >= 5:
            parts = (sao._stats_device_one(cur, fy, 32, jnp)
                     + sao._stats_device_one(u.astype(jnp.int32), fu, 16, jnp)
                     + sao._stats_device_one(v.astype(jnp.int32), fv, 16, jnp))
            acc.append(sum(p.sum() for p in parts))
        return sum(acc)
    return f

prev = None
names = ["sadgrid16", "+lev16", "+lev32", "+deblock", "+saostats"]
for ns in range(1, 6):
    f = stage_fn(ns)
    o = f(y); o.block_until_ready()
    ts = []
    for i in range(3):
        y2 = jnp.asarray(np.asarray(y) ^ np.uint8(i + 1)); y2.block_until_ready()
        t0 = time.perf_counter()
        f(y2).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    d = t - prev if prev is not None else t
    print(f"{names[ns-1]:12s} total {t*1e3:7.1f}ms  delta {d*1e3:7.1f}ms", flush=True)
    prev = t
