import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu.ops import blocksum

W, H = 1280, 736
rng = np.random.default_rng(0)
cur0 = rng.integers(0,256,(H,W),np.int32)
ry0 = rng.integers(0,256,(H+2*PAD,W+2*PAD),np.int32)

def variant(mode):
    @jax.jit
    def f(cur, ry):
        lam = jnp.asarray(181, jnp.int32)
        if mode == "dense16":
            g = p_jax._sad_grids(cur.astype(jnp.int16), ry, S=16, search=16)
            return g.sum()
        if mode == "coarse_only":
            R4=16; n4=33; P4=PAD//4
            cur4 = blocksum.block_sum(cur, 4, 4, xp=jnp)
            ry4 = blocksum.block_sum(ry, 4, 4, xp=jnp)
            def step(_, dyi):
                band = jax.lax.dynamic_slice(ry4, (P4-R4+dyi, 0), (H//4, W//4+2*P4))
                def sad_dx(dxi):
                    sh = jax.lax.dynamic_slice(band, (0, P4-R4+dxi), (H//4, W//4))
                    return jnp.abs(cur4 - sh)
                d = jax.vmap(sad_dx)(jnp.arange(n4, dtype=jnp.int32))
                return None, blocksum.block_sum(d, 4, 4, xp=jnp)
            _, g = jax.lax.scan(step, None, jnp.arange(n4, dtype=jnp.int32))
            return g.sum()
        if mode == "gather16":
            nb = (H//16)*(W//16)
            bi = jnp.arange(nb, dtype=jnp.int32)
            r, c = bi // (W//16), bi % (W//16)
            vy = (cur[:nb//(W//16)*0+0,0]*0)  # dummy
            vy = jnp.zeros((nb,), jnp.int32); vx = jnp.zeros((nb,), jnp.int32)
            win = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(ry,(yy,xx),(22,22)),
                           out_axes=2)(r*16+vy-3+PAD, c*16+vx-3+PAD)
            return win.sum()
        if mode == "l0_49":
            nb = (H//16)*(W//16)
            bi = jnp.arange(nb, dtype=jnp.int32)
            r, c = bi // (W//16), bi % (W//16)
            vy = jnp.zeros((nb,), jnp.int32); vx = vy
            win = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(ry,(yy,xx),(22,22)),
                           out_axes=2)(r*16+vy-3+PAD, c*16+vx-3+PAD)
            blk = cur.reshape(H//16,16,W//16,16).transpose(1,3,0,2).reshape(16,16,nb)
            cs=[]
            for dy in range(7):
                for dx in range(7):
                    cs.append(jnp.abs(blk - win[dy:dy+16, dx:dx+16,:]).sum(axis=(0,1)))
            return jnp.stack(cs).sum()
        if mode == "hier_full":
            me = p_jax._me_hier(cur, ry, sizes=(16,32), search=64, lam=lam)
            return sum(a.sum() for t in me.values() for a in t)
    return f

for mode in ["dense16","coarse_only","gather16","l0_49","hier_full"]:
    f = variant(mode)
    o = f(jnp.asarray(cur0), jnp.asarray(ry0)); np.asarray(o)
    ts=[]
    for i in range(3):
        c2 = jnp.asarray(cur0 ^ (i+1)); r2 = jnp.asarray(ry0 ^ (i+1))
        np.asarray(c2[:1,:1]); np.asarray(r2[:1,:1])
        t0=time.perf_counter(); np.asarray(f(c2, r2)); ts.append(time.perf_counter()-t0)
    print(f"{mode:12s} {min(ts)*1e3:7.1f} ms")
