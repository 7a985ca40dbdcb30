import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD

W, H = 1280, 736
rng = np.random.default_rng(0)
frames = [np.ascontiguousarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
          for _ in range(8)]
u8 = rng.integers(0, 255, (H//2, W//2), dtype=np.uint8)
ry = jnp.asarray(frames[0])

@jax.jit
def compute(y, ry):
    # ~40ms of real work: the 16-SAD grid sweep
    ryp = jnp.pad(ry.astype(jnp.int32), PAD, mode="edge")
    g = p_jax._sad_grids(y.astype(jnp.int16), ryp, S=16, search=16)
    return g.sum(), g[:, 0, 0]

# warm
d = jnp.asarray(frames[0]); s, _ = compute(d, ry); s.block_until_ready()

# A: serial per frame: upload -> compute -> tiny fetch
t0 = time.perf_counter()
for i in range(6):
    d = jnp.asarray(frames[i + 1])
    s, g = compute(d, ry)
    float(s)
tA = (time.perf_counter() - t0) / 6
print(f"A serial upload+compute+fetch: {tA*1e3:.1f} ms/frame", flush=True)

# B: pre-upload all, then compute+fetch only
devs = [jnp.asarray(f) for f in frames[1:7]]
for d in devs: d.block_until_ready()
t0 = time.perf_counter()
for d in devs:
    s, g = compute(d, ry)
    float(s)
tB = (time.perf_counter() - t0) / 6
print(f"B compute+fetch only:          {tB*1e3:.1f} ms/frame", flush=True)

# C: pipelined: upload i+1 async BEFORE forcing compute i
t0 = time.perf_counter()
d = jnp.asarray(frames[1])
for i in range(6):
    s, g = compute(d, ry)
    d = jnp.asarray(frames[(i + 2) % 8])   # async upload next
    float(s)                                # force current
tC = (time.perf_counter() - t0) / 6
print(f"C pipelined upload next:       {tC*1e3:.1f} ms/frame", flush=True)

# D: upload-only reference
t0 = time.perf_counter()
for i in range(6):
    jnp.asarray(frames[i + 1]).block_until_ready()
tD = (time.perf_counter() - t0) / 6
print(f"D upload only:                 {tD*1e3:.1f} ms/frame", flush=True)
