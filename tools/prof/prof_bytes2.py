import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.ops import transforms as tx_ops
from homerhevc_tpu.ops import quant as quant_ops
from homerhevc_tpu import tables

nb, S = 3680, 16
rng = np.random.default_rng(0)
resid0 = jnp.asarray(rng.integers(-255,256,(nb,S,S),np.int32))
orig0 = jnp.asarray(rng.integers(0,256,(nb,S,S),np.int32))
pred0 = jnp.asarray(rng.integers(0,256,(nb,S,S),np.int32))

def piece(mode):
    @jax.jit
    def f(resid, orig, pred):
        qp = jnp.asarray(32, jnp.int32)
        lg2 = 4
        coeff = tx_ops.forward_transform(resid)
        if mode == "tx": return coeff.sum()
        lev = quant_ops.quantize(coeff, qp, lg2, is_intra=False)
        if mode == "quant": return lev.sum()
        lev = quant_ops.sign_bit_hiding(lev, coeff, qp, lg2)
        if mode == "sbh": return lev.sum()
        rr = tx_ops.inverse_transform(quant_ops.dequantize(lev, qp, lg2))
        if mode == "itx": return rr.sum()
        rec = jnp.clip(pred + jnp.where(jnp.any(lev != 0, axis=(-1,-2))[...,None,None], rr, 0), 0, 255)
        lamf = jnp.asarray(tables.LAMBDA_FX)[qp]
        ssd_c = jnp.sum((orig-rec)*(orig-rec), axis=(-1,-2))
        ssd_s = jnp.sum((orig-pred)*(orig-pred), axis=(-1,-2))
        bits = jnp.minimum(tables.level_bits_est(lev, xp=jnp), 16383)
        keep = ssd_c + (((lamf>>4)*bits)>>4) < ssd_s
        return jnp.where(keep[...,None,None], lev, 0).sum() + rec.sum()
    return f

for mode in ["tx", "quant", "sbh", "itx", "full"]:
    c = piece(mode).lower(resid0, orig0, pred0).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(f"{mode:6s} bytes {ca['bytes accessed']/1e9:6.2f} GB  flops {ca.get('flops',0)/1e9:6.2f} G")
