import os, time, threading
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def heavy(x):
    def body(c, _):
        c = (c * 1103515245 + 12345) & 0x7fffffff
        return c, c.sum()
    c, s = jax.lax.scan(body, x, None, length=300)
    return c, s

rng = np.random.default_rng(0)
x0 = rng.integers(0, 2**30, (1024, 1024), np.int32)
big = rng.integers(0, 2**30, (1400, 1024), np.int32)   # ~5.7MB fetch

# warm
c, s = heavy(jnp.asarray(x0)); np.asarray(s)[0:1]
bd = jnp.asarray(big) * 1; np.asarray(bd[:1,:1])

# measure compute alone
x = jnp.asarray(x0 ^ 1); np.asarray(x[:1,:1])
t0 = time.perf_counter(); c, s = heavy(x); np.asarray(s[:1])
t_comp = time.perf_counter() - t0
# fetch alone
bd = jnp.asarray(big ^ 1) * 1; np.asarray(bd[:1,:1])
t0 = time.perf_counter(); _ = np.asarray(bd); t_fetch = time.perf_counter() - t0
# overlapped: dispatch compute, then fetch other array while computing
x = jnp.asarray(x0 ^ 2); np.asarray(x[:1,:1])
bd = jnp.asarray(big ^ 2) * 1; np.asarray(bd[:1,:1])
t0 = time.perf_counter()
c, s = heavy(x)                       # async dispatch
_ = np.asarray(bd)                    # fetch during compute?
np.asarray(s[:1])                     # wait compute
t_both = time.perf_counter() - t0
print(f"compute {t_comp*1e3:.0f} ms  fetch {t_fetch*1e3:.0f} ms  overlapped {t_both*1e3:.0f} ms  (serial would be {(t_comp+t_fetch)*1e3:.0f})")
# threaded fetch variant
x = jnp.asarray(x0 ^ 3); np.asarray(x[:1,:1])
bd = jnp.asarray(big ^ 3) * 1; np.asarray(bd[:1,:1])
res = {}
def grab(): res["b"] = np.asarray(bd)
t0 = time.perf_counter()
c, s = heavy(x)
th = threading.Thread(target=grab); th.start()
np.asarray(s[:1]); th.join()
print(f"threaded-fetch overlapped {(time.perf_counter()-t0)*1e3:.0f} ms")
