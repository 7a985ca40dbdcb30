import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_chunk
from homerhevc_tpu.utils.synth import synth_clip

W, H = 1280, 736
K = 8
rng = np.random.default_rng(0)
def mk():
    ys = rng.integers(0,256,(K,H,W),np.uint8)
    us = rng.integers(0,256,(K,H//2,W//2),np.uint8)
    vs = rng.integers(0,256,(K,H//2,W//2),np.uint8)
    ry = rng.integers(0,256,(H,W),np.uint8)
    ru = rng.integers(0,256,(H//2,W//2),np.uint8)
    rv = rng.integers(0,256,(H//2,W//2),np.uint8)
    qps = np.full((K,),32,np.int32)
    return [jnp.asarray(a) for a in (ys,us,vs,ry,ru,rv,qps)]
cap = max(1024, (H//4)*(W//4)*3//2//8)
kw = dict(ctu=32, search=16, me_precision=2, sign_hiding=True,
          deblock=True, sao=True, cap=cap, tree=True)
args = mk()
out = p_chunk.p_chunk_device(*args, **kw)
jax.block_until_ready(out)
for it in range(3):
    args = mk()
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    out = p_chunk.p_chunk_device(*args, **kw)
    jax.block_until_ready(out[2])       # final ref plane only (small fetch)
    t1 = time.perf_counter()
    wires = np.asarray(out[0])
    t2 = time.perf_counter()
    print(f"iter{it}: compute {t1-t0:.3f}s ({(t1-t0)/K*1e3:.1f} ms/f)  wire fetch {t2-t1:.3f}s ({wires.nbytes/1e6:.1f} MB)")
