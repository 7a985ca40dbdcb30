import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

H, W = 800, 1344
NB = 3680          # 16x16 blocks of 720p
SW = 18            # window size
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(0, 255, (16, H, W), dtype=np.int16))
plane1 = planes[0]
y0 = jnp.asarray(rng.integers(0, H - SW - 1, (NB,), dtype=np.int32))
x0 = jnp.asarray(rng.integers(0, W - SW - 1, (NB,), dtype=np.int32))

@jax.jit
def g_all16(planes, y0, x0):
    def lane(yy, xx):
        return jax.lax.dynamic_slice(planes, (0, yy, xx), (16, SW, SW))
    return jax.vmap(lane)(y0, x0)          # (NB, 16, SW, SW)

@jax.jit
def g_one(plane1, y0, x0):
    def lane(yy, xx):
        return jax.lax.dynamic_slice(plane1, (yy, xx), (SW, SW))
    return jax.vmap(lane)(y0, x0)          # (NB, SW, SW)

@jax.jit
def g_rows_then_cols(plane1, y0, x0):
    # row gather: (NB, SW, W) is too big; gather rows per block via take
    ridx = y0[:, None] + jnp.arange(SW)[None, :]      # (NB, SW)
    rows = jnp.take(plane1, ridx.reshape(-1), axis=0) # (NB*SW, W)
    cidx = x0[:, None] + jnp.arange(SW)[None, :]      # (NB, SW)
    cidx_full = jnp.repeat(cidx, SW, axis=0)          # (NB*SW, SW)
    return jnp.take_along_axis(rows, cidx_full, axis=1).reshape(NB, SW, SW)

def tm(name, f, *args):
    o = f(*args); jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
    ts = []
    for i in range(3):
        a0 = np.asarray(args[1])
        varied = jnp.asarray((a0 + i + 1) % (H - SW - 1)); varied.block_until_ready()
        t0 = time.perf_counter()
        o = f(args[0], varied, *args[2:])
        jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {[round(t,4) for t in ts]}", flush=True)

tm("vmap dslice 16 planes (38MB out)", g_all16, planes, y0, x0)
tm("vmap dslice 1 plane (2.4MB out)", g_one, plane1, y0, x0)
tm("rows-then-cols take (1 plane)", g_rows_then_cols, plane1, y0, x0)
