import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD

W, H, K = 1280, 736, 8
rng = np.random.default_rng(0)
ys0 = rng.integers(0,256,(K,H,W),np.uint8)
us0 = rng.integers(0,256,(K,H//2,W//2),np.uint8)
vs0 = rng.integers(0,256,(K,H//2,W//2),np.uint8)
ry0 = rng.integers(0,256,(H,W),np.uint8)
u0 = rng.integers(0,256,(H//2,W//2),np.uint8)
v0 = rng.integers(0,256,(H//2,W//2),np.uint8)

def make(with_lev):
    @jax.jit
    def f(ys, us, vs, refy, refu, refv):
        def body(refs, xs):
            ry8, ru8, rv8 = refs
            y, u, v = xs
            ryp = jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge")
            rup = jnp.pad(ru8.astype(jnp.int16), PAD//2, mode="edge")
            rvp = jnp.pad(rv8.astype(jnp.int16), PAD//2, mode="edge")
            res = p_jax._p_stage_tree(y, u, v, ryp, rup, rvp, ctu=32,
                                      qp=jnp.asarray(32, jnp.int32), search=64,
                                      me_precision=2, sign_hiding=True)
            o = res["sad"].sum()
            if with_lev:
                o = o + (res["lev_y"].astype(jnp.int32).sum()
                         + res["lev_u"].astype(jnp.int32).sum()
                         + res["lev_v"].astype(jnp.int32).sum())
            return (res["recon_y"], res["recon_u"], res["recon_v"]), o
        _, o = jax.lax.scan(body, (refy, refu, refv), (ys, us, vs))
        return o.sum()
    return f

args = tuple(jnp.asarray(a) for a in (ys0, us0, vs0, ry0, u0, v0))
for wl in (False, True):
    c = make(wl).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print("with_lev" if wl else "tree_only",
          {k: round(v/1e9, 2) for k, v in ca.items()
           if k in ("flops", "bytes accessed", "transcendentals")})
