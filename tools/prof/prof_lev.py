import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu import tables

W, H = 1280, 736
rng = np.random.default_rng(0)
def mk(h, w):
    return jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.uint8))
y, u, v = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)
ry0, ru0, rv0 = mk(H, W), mk(H//2, W//2), mk(H//2, W//2)
ivy = jnp.zeros((H//32, W//32), jnp.int32)
ivx = jnp.zeros((H//32, W//32), jnp.int32)

def run(name, **kw):
    @functools.partial(jax.jit, static_argnames=("S",))
    def lev(y, S):
        qp = jnp.asarray(32, jnp.int32)
        qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
        lam = jnp.asarray(tables.LAMBDA_ME_FX)[qp]
        ryp = jnp.pad(ry0.astype(jnp.int32), PAD, mode="edge")
        rup = jnp.pad(ru0.astype(jnp.int32), PAD//2, mode="edge")
        rvp = jnp.pad(rv0.astype(jnp.int32), PAD//2, mode="edge")
        e = p_jax._level_encode(y.astype(jnp.int32), u, v, ryp, rup, rvp,
                                ivy, ivx, S=32, qp=qp, qp_c=qp_c, lam=lam,
                                search=16, **kw)
        return e["rec_y"], e["lev_y"]
    o = lev(y, 32)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
    ts = []
    for i in range(3):
        y2 = jnp.asarray(np.asarray(y) ^ np.uint8(i + 1)); y2.block_until_ready()
        t0 = time.perf_counter()
        o = lev(y2, 32)
        jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {[round(t,3) for t in ts]}", flush=True)

run("full (prec2, sbh)", me_precision=2, sign_hiding=True)
run("no sbh", me_precision=2, sign_hiding=False)
run("prec0 (no subpel sel)", me_precision=0, sign_hiding=True)
