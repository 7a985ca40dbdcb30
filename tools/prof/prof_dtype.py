import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.ops import blocksum
W, H, PAD = 1280, 736, 72
rng = np.random.default_rng(0)
cur0 = rng.integers(0,256,(H,W),np.int32)
ry0 = rng.integers(0,256,(H+2*PAD,W+2*PAD),np.int32)

def sweep(n, dt, bs):     # n x n shift sweep + per-16 block sums
    @jax.jit
    def f(cur, ry):
        cur = cur.astype(dt); ry = ry.astype(dt)
        out = []
        def step(_, dyi):
            band = jax.lax.dynamic_slice(ry, (PAD - n//2 + dyi, 0), (H, W + 2*PAD))
            def sad_dx(dxi):
                sh = jax.lax.dynamic_slice(band, (0, PAD - n//2 + dxi), (H, W))
                return jnp.abs(cur - sh)
            d = jax.vmap(sad_dx)(jnp.arange(n, dtype=jnp.int32))
            if bs == "f32":
                return None, blocksum.block_sum(d, 16, 16, xp=jnp)
            elif bs == "bf16":
                pl, pr = blocksum._pool_mats_np(H, W, 16, 16)
                plb = jnp.asarray(pl, jnp.bfloat16); prb = jnp.asarray(pr, jnp.bfloat16)
                db = d.astype(jnp.bfloat16)
                s = jnp.einsum('hw,nwk->nhk', plb, db,
                                preferred_element_type=jnp.float32)
                s2 = jnp.einsum('nhw,wk->nhk', s.astype(jnp.bfloat16), prb,
                                preferred_element_type=jnp.float32)
                return None, s2.astype(jnp.int32)
            else:
                return None, d.reshape(n, H//16, 16, W//16, 16).sum((2,4))
        _, g = jax.lax.scan(step, None, jnp.arange(n, dtype=jnp.int32))
        return g.sum()
    return f

for name, n, dt, bs in [("7x7 i32 f32bs", 7, jnp.int32, "f32"),
                        ("7x7 i16 f32bs", 7, jnp.int16, "f32"),
                        ("7x7 i16 bf16bs", 7, jnp.int16, "bf16"),
                        ("33x33 i32 f32bs", 33, jnp.int32, "f32"),
                        ("33x33 i16 f32bs", 33, jnp.int16, "f32"),
                        ("33x33 i16 bf16bs", 33, jnp.int16, "bf16"),
                        ("33x33 i16 reshsum", 33, jnp.int16, "resh")]:
    f = sweep(n, dt, bs)
    np.asarray(f(jnp.asarray(cur0), jnp.asarray(ry0)))
    ts=[]
    for i in range(3):
        c2 = jnp.asarray(cur0 ^ (i+1)); r2 = jnp.asarray(ry0 ^ (i+1))
        np.asarray(c2[:1,:1]); np.asarray(r2[:1,:1])
        t0=time.perf_counter(); np.asarray(f(c2, r2)); ts.append(time.perf_counter()-t0)
    print(f"{name:18s} {min(ts)*1e3:7.1f} ms")
