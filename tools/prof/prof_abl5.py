"""Round-4 wide ablation: attribute the K=8 720p chunk body's ~36 ms/f
across features by toggling one at a time (each toggle recompiles)."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.pipeline import p_chunk
from homerhevc_tpu.utils.synth import synth_clip

W, H, K, CTU, QP = 1280, 736, 8, 32, 32
NSET = 3
cap = max(1024, (H // 4) * (W // 4) * 3 // 2 // 32)


def pad(a, h, w):
    return np.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])), mode="edge")


argsets = []
for seed in range(NSET):
    fr = list(synth_clip(W, 720, K + 1, seed=seed))
    ys = np.stack([pad(f[0], H, W) for f in fr[1:]])
    us = np.stack([pad(f[1], H // 2, W // 2) for f in fr[1:]])
    vs = np.stack([pad(f[2], H // 2, W // 2) for f in fr[1:]])
    ry, ru, rv = (pad(fr[0][0], H, W), pad(fr[0][1], H // 2, W // 2),
                  pad(fr[0][2], H // 2, W // 2))
    argsets.append([jnp.asarray(a) for a in (ys, us, vs, ry, ru, rv)])
for a in argsets:
    for x in a:
        np.asarray(x.reshape(-1)[:4])

qps = jnp.full((K,), QP, jnp.int32)

BASE = dict(sign_hiding=True, tr_split=True, intra_in_p=True, tree=True,
            deblock=True, sao=True, search=64, me_precision=2)

CFGS = [("full", {})]
for key, val in [("intra_in_p", False), ("tree", False),
                 ("deblock", False), ("sao", False),
                 ("search", 16), ("me_precision", 0), ("tr_split", False)]:
    CFGS.append((f"{key}={val}", {key: val}))

sel = sys.argv[1:] or None
for name, delta in CFGS:
    if sel and not any(s in name for s in sel):
        continue
    kw = dict(BASE)
    kw.update(delta)
    fn = functools.partial(p_chunk.p_chunk_device, ctu=CTU, cap=cap,
                           vis=(720, 1280), **kw)
    t0 = time.perf_counter()
    out = fn(*argsets[0], qps)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
    tw = time.perf_counter() - t0
    ts = []
    for i in range(1, NSET):
        t0 = time.perf_counter()
        out = fn(*argsets[i], qps)
        for lf in jax.tree_util.tree_leaves(out):
            lf.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name:20s} {min(ts)/K*1e3:7.1f} ms/f   (warm {tw:.0f}s)",
          flush=True)
