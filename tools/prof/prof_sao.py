import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
import functools
from homerhevc_tpu.ops import sao

W, H, ctu = 1280, 736, 32
rng = np.random.default_rng(0)

oy = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
ry = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
ou = jnp.asarray(rng.integers(0, 255, (H//2, W//2), dtype=np.uint8))
ru = jnp.asarray(rng.integers(0, 255, (H//2, W//2), dtype=np.uint8))
ov = jnp.asarray(rng.integers(0, 255, (H//2, W//2), dtype=np.uint8))
rv = jnp.asarray(rng.integers(0, 255, (H//2, W//2), dtype=np.uint8))

@functools.partial(jax.jit, static_argnames=("ctu",))
def stats(oy, ry, ou, ru, ov, rv, ctu):
    parts = (sao._stats_device_one(oy, ry, ctu, jnp)
             + sao._stats_device_one(ou, ru, ctu // 2, jnp)
             + sao._stats_device_one(ov, rv, ctu // 2, jnp))
    nby, nbx = parts[0].shape[-2:]
    return jnp.concatenate([t.reshape(-1, nby, nbx) for t in parts], 0)

for it in range(4):
    t0 = time.perf_counter()
    flat = np.asarray(stats(oy, ry, ou, ru, ov, rv, ctu))
    print(f"stats iter {it}: {time.perf_counter()-t0:.3f}s", flush=True)
    # vary input to defeat result cache
    ry = jnp.asarray(np.asarray(ry) ^ np.uint8(it + 1))

t0 = time.perf_counter()
info, filt = sao.sao_stage_device((oy, ou, ov), (ry, ru, rv), ctu, 32, 32)
print(f"full sao_stage_device (incl apply compile): {time.perf_counter()-t0:.3f}s", flush=True)
t0 = time.perf_counter()
info, filt = sao.sao_stage_device((oy, ou, ov), (ry, ru, rv), ctu, 32, 32)
print(f"full sao_stage_device warm: {time.perf_counter()-t0:.3f}s", flush=True)
ry2 = jnp.asarray(np.asarray(ry) ^ np.uint8(7))
t0 = time.perf_counter()
info, filt = sao.sao_stage_device((oy, ou, ov), (ry2, ru, rv), ctu, 32, 32)
print(f"full sao_stage_device warm varied: {time.perf_counter()-t0:.3f}s", flush=True)
