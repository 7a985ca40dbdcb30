import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x + 1)
for size_mb, n in ((0.001, 6), (0.5, 4), (5.6, 4), (22, 2)):
    nel = int(size_mb * 1e6 / 4)
    x = jnp.asarray(np.arange(nel, dtype=np.int32))
    y = f(x); np.asarray(y)  # warm compile for this shape
    ts = []
    for i in range(n):
        x = jnp.asarray(np.full(nel, i, np.int32))
        t0 = time.perf_counter()
        y = f(x)
        r = np.asarray(y)
        ts.append(time.perf_counter() - t0)
    print(f"{size_mb:6.3f} MB roundtrip: {[round(t,3) for t in ts]}", flush=True)

# upload-only timing
x_np = np.arange(int(5.6e6/4), dtype=np.int32)
for i in range(3):
    x_np = x_np + 1
    t0 = time.perf_counter()
    d = jnp.asarray(x_np)
    d.block_until_ready()
    print(f"upload 5.6MB: {time.perf_counter()-t0:.3f}s", flush=True)

# dispatch-only latency (tiny arg, result fetched tiny)
g = jax.jit(lambda x: (x * 2 + 1).sum())
x = jnp.asarray(np.arange(256, dtype=np.int32)); np.asarray(g(x))
for i in range(5):
    x = jnp.asarray(np.arange(256, dtype=np.int32) + i)
    t0 = time.perf_counter()
    v = np.asarray(g(x))
    print(f"tiny dispatch+fetch: {time.perf_counter()-t0:.4f}s", flush=True)
