import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.ops import transforms as tx_ops
from homerhevc_tpu.ops import quant as quant_ops

H, W, S = 736, 1280, 16
nby, nbx = H//S, W//S
nb = nby*nbx
rng = np.random.default_rng(0)
resid_lm0 = jnp.asarray(rng.integers(-255,256,(S,S,nb),np.int32))  # lane-major

def chain(mode):
    @jax.jit
    def f(resid_lm):
        qp = jnp.asarray(32, jnp.int32)
        if mode == "batchmajor":
            r = resid_lm.transpose(2,0,1)               # tob
            coeff = tx_ops.forward_transform(r)
            lev = quant_ops.quantize(coeff, qp, 4, is_intra=False)
            lev = quant_ops.sign_bit_hiding(lev, coeff, qp, 4)
            rr = tx_ops.inverse_transform(quant_ops.dequantize(lev, qp, 4))
            # to_plane
            pl = (rr.reshape(nby,nbx,S,S).transpose(0,2,1,3).reshape(H,W))
            lv = (lev.reshape(nby,nbx,S,S).transpose(0,2,1,3).reshape(H,W))
            return pl.sum() + lv.sum()
        else:
            # lane-major transforms: T @ x @ T^T with nb riding lanes
            fT = jnp.asarray(tx_ops.DCT[S] if hasattr(tx_ops, 'DCT') else 0)
            return resid_lm.sum()
    return f

f = chain("batchmajor")
np.asarray(f(resid_lm0))
ts=[]
for i in range(3):
    a2 = jnp.asarray(np.asarray(resid_lm0) ^ (i+1)); np.asarray(a2[:1,:1,:1])
    t0=time.perf_counter(); np.asarray(f(a2)); ts.append(time.perf_counter()-t0)
print(f"batchmajor {min(ts)*1e3:7.1f} ms")

# pure transpose costs
for name, fn in [("tob", lambda x: x.transpose(2,0,1).sum()),
                 ("toplane", lambda x: x.transpose(2,0,1).reshape(nby,nbx,S,S).transpose(0,2,1,3).reshape(H,W).sum()),
                 ("sum", lambda x: x.sum())]:
    g = jax.jit(fn)
    np.asarray(g(resid_lm0))
    ts=[]
    for i in range(3):
        a2 = jnp.asarray(np.asarray(resid_lm0) ^ (i+1)); np.asarray(a2[:1,:1,:1])
        t0=time.perf_counter(); np.asarray(g(a2)); ts.append(time.perf_counter()-t0)
    print(f"{name:10s} {min(ts)*1e3:7.1f} ms")
