import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_chunk
W, H = 1280, 736
K = 8
rng = np.random.default_rng(0)
def mk():
    return [jnp.asarray(a) for a in (
        rng.integers(0,256,(K,H,W),np.uint8),
        rng.integers(0,256,(K,H//2,W//2),np.uint8),
        rng.integers(0,256,(K,H//2,W//2),np.uint8),
        rng.integers(0,256,(H,W),np.uint8),
        rng.integers(0,256,(H//2,W//2),np.uint8),
        rng.integers(0,256,(H//2,W//2),np.uint8),
        np.full((K,),32,np.int32))]
cap = max(1024, (H//4)*(W//4)*3//2//8)
base = dict(ctu=32, search=16, me_precision=2, sign_hiding=True,
            deblock=True, sao=True, cap=cap, tree=True)
for name, kw in [("hier64", dict(search=64)), ("hier32", dict(search=32)),
                 ("dense16", dict(search=16))]:
    k = dict(base); k.update(kw)
    args = mk()
    out = p_chunk.p_chunk_device(*args, **k)
    np.asarray(out[2][:1, :8])
    ts = []
    for it in range(2):
        args = mk(); jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = p_chunk.p_chunk_device(*args, **k)
        np.asarray(out[2][:1, :8])          # force: materialize host bytes
        ts.append(time.perf_counter()-t0)
    print(f"{name:14s} {min(ts)/K*1e3:6.1f} ms/f")
