import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax

W, H = 1280, 736
rng = np.random.default_rng(0)
def mk(h, w):
    return jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.uint8))

y, u, v = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)
ry, ru, rv = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)

which = sys.argv[1] if len(sys.argv) > 1 else "fixed"
if which == "fixed":
    fn = lambda yy: p_jax.p_frame_device(yy, u, v, ry, ru, rv, B=32, qp=32,
        search=16, me_precision=2, deblock=True, sign_hiding=True)
else:
    fn = lambda yy: p_jax.p_frame_tree_device(yy, u, v, ry, ru, rv, ctu=32,
        qp=32, search=16, me_precision=2, deblock=True, sign_hiding=True)

t0 = time.perf_counter()
out = fn(y)
out["recon_y"].block_until_ready()
print(f"{which}: compile+first run {time.perf_counter()-t0:.1f}s", flush=True)
for i in range(4):
    y2 = jnp.asarray(np.asarray(y) ^ np.uint8(i + 1))
    t0 = time.perf_counter()
    out = fn(y2)
    out["recon_y"].block_until_ready()
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    w_ = np.asarray(out["wire"])
    ft = time.perf_counter() - t1
    print(f"{which}: compute {dt:.3f}s  wire fetch {ft:.3f}s ({w_.nbytes/1e6:.2f}MB)", flush=True)
