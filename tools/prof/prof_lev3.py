"""Micro-profile of _level_encode internals + _me_hier at bench settings.
Times each piece as its own jit with a forced tiny fetch (axon laziness)."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu import tables

W, H = 1280, 736
NSET = 3
rng = np.random.default_rng(0)

sets = []
for s in range(NSET):
    cur = rng.integers(0, 256, (H, W), np.int32)
    u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    ry = np.pad(rng.integers(0, 256, (H, W), np.int16), PAD, mode="edge")
    ru = np.pad(rng.integers(0, 256, (H // 2, W // 2), np.int16), PAD // 2,
                mode="edge")
    rv = np.pad(rng.integers(0, 256, (H // 2, W // 2), np.int16), PAD // 2,
                mode="edge")
    sets.append(tuple(jnp.asarray(a) for a in (cur, u, v, ry, ru, rv)))

qp = 32
lam = int(tables.LAMBDA_ME_FX_P[qp])
qp_c = int(tables.chroma_qp_from_luma(qp))


def _force(outs):
    # slice ON DEVICE first, then fetch 4 elements: forces the producer
    # without paying a multi-MB tunnel transfer
    leaf = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(leaf.reshape(-1)[:4])


def timeit(name, fn, *argsets_extra):
    _force(fn(*sets[0]))
    ts = []
    for i in range(1, NSET):
        t0 = time.perf_counter()
        _force(fn(*sets[i]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:22s} {min(ts)*1e3:8.1f} ms/frame", flush=True)


@jax.jit
def me_hier(cur, u, v, ry, ru, rv):
    return p_jax._me_hier(cur, ry, sizes=(16, 32), search=64, lam=lam)


def mk_lev(S, tr_split):
    @jax.jit
    def f(cur, u, v, ry, ru, rv):
        nby, nbx = H // S, W // S
        ivy = jnp.zeros((nby, nbx), jnp.int32)
        ivx = jnp.zeros((nby, nbx), jnp.int32)
        return p_jax._level_encode(cur, u, v, ry, ru, rv, ivy, ivx, S=S,
                                   qp=qp, qp_c=qp_c, lam=lam, search=64,
                                   me_precision=2, sign_hiding=True,
                                   tr_split=tr_split)["lev_y"]
    return f


timeit("me_hier(64)", me_hier)
timeit("level_encode S=16", mk_lev(16, False))
timeit("level_encode S=32", mk_lev(32, False))
timeit("level_encode S=32+tr", mk_lev(32, True))


@jax.jit
def full_tree(cur, u, v, ry, ru, rv):
    return p_jax._p_stage_tree(cur.astype(jnp.uint8), u, v, ry, ru, rv,
                               ctu=32, qp=qp, search=64, me_precision=2,
                               sign_hiding=True, tr_split=True,
                               intra_in_p=True, vis=(720, 1280))["lev_y"]


timeit("p_stage_tree(all)", full_tree)
