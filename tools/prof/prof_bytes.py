import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu import tables
from homerhevc_tpu.ops import interp

W, H = 1280, 736
S = 16
rng = np.random.default_rng(0)
cur0 = jnp.asarray(rng.integers(0,256,(H,W),np.int32))
u0 = jnp.asarray(rng.integers(0,256,(H//2,W//2),np.uint8))
v0 = jnp.asarray(rng.integers(0,256,(H//2,W//2),np.uint8))
ry0 = jnp.asarray(rng.integers(0,256,(H+2*PAD,W+2*PAD),np.int16))
nby, nbx = H//S, W//S
nb = nby*nbx
ivy0 = jnp.asarray(rng.integers(-60,61,(nby,nbx)), jnp.int32)
ivx0 = jnp.asarray(rng.integers(-60,61,(nby,nbx)), jnp.int32)

def piece(mode):
    @jax.jit
    def f(cur, u, v, ry, ivy, ivx):
        qp = jnp.asarray(32, jnp.int32)
        lam = jnp.asarray(tables.LAMBDA_ME_FX)[qp]
        bi = jnp.arange(nb, dtype=jnp.int32)
        r, c = bi // nbx, bi % nbx
        vy = ivy.reshape(-1); vx = ivx.reshape(-1)
        win = jax.vmap(lambda yy,xx: jax.lax.dynamic_slice(ry,(yy,xx),(S+9,S+9)),
                       out_axes=2)(r*S+vy-4+PAD, c*S+vx-4+PAD).astype(jnp.int32)
        if mode == "gather": return win.sum()
        G = S + 2
        def filt_h(b, taps, w_out):
            acc = taps[0]*b[:,0:w_out,:]
            for i in range(1,8): acc = acc + int(taps[i])*b[:,i:i+w_out,:]
            return acc
        def filt_v(b, taps, h_out):
            acc = taps[0]*b[0:h_out,:,:]
            for i in range(1,8): acc = acc + int(taps[i])*b[i:i+h_out,:,:]
            return acc
        hraw = [filt_h(win, interp.LUMA_FILTERS[fx], G) for fx in range(4)]
        grids = []
        for fy in range(4):
            for fx in range(4):
                vv = filt_v(hraw[fx], interp.LUMA_FILTERS[fy], G) >> 6
                grids.append(jnp.clip((vv+32) >> 6, 0, 255))
        gstack = jnp.stack(grids)
        if mode == "grids": return gstack.sum()
        blk = (cur.reshape(nby,S,nbx,S).transpose(1,3,0,2).reshape(S,S,nb))
        costs = []
        for qy in range(-3,4):
            for qx in range(-3,4):
                fy, fx = qy & 3, qx & 3
                iy, ix = qy >> 2, qx >> 2
                pred = gstack[fy*4+fx, 1+iy:1+iy+S, 1+ix:1+ix+S, :]
                costs.append(jnp.abs(blk-pred).sum(axis=(0,1)))
        c49 = jnp.stack(costs)
        if mode == "sad49": return c49.sum()
        return c49.sum()
    return f

args = (cur0, u0, v0, ry0, ivy0, ivx0)
for mode in ["gather", "grids", "sad49"]:
    c = piece(mode).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(f"{mode:8s} bytes {ca['bytes accessed']/1e9:6.2f} GB  flops {ca.get('flops',0)/1e9:6.2f} G")

# full level encode + full tree for reference
@jax.jit
def lev_full(cur, u, v, ry, ivy, ivx):
    qp = jnp.asarray(32, jnp.int32)
    qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
    lam = jnp.asarray(tables.LAMBDA_ME_FX)[qp]
    ru = jnp.pad((u.astype(jnp.int16)), PAD//2, mode="edge")
    e = p_jax._level_encode(cur, u, v, ry, ru, ru, ivy, ivx, S=S, qp=qp,
                            qp_c=qp_c, lam=lam, search=64, me_precision=2,
                            sign_hiding=True)
    return sum(x.astype(jnp.int32).sum() for x in (e["lev_y"], e["rec_y"], e["cost"]))
c = lev_full.lower(*args).compile()
ca = c.cost_analysis()
if isinstance(ca, list): ca = ca[0]
print(f"lev_full bytes {ca['bytes accessed']/1e9:6.2f} GB  flops {ca.get('flops',0)/1e9:6.2f} G")
