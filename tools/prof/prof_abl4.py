"""Chunk-scan ablations: time the K=8 720p P-chunk body under feature
toggles (sign_hiding, tr_split, intra_in_p) to attribute in-scan cost."""
import functools
import os
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

CFGS = [
    ("full", dict(sign_hiding=True, tr_split=True, intra_in_p=True)),
    ("sbh-off", dict(sign_hiding=False, tr_split=True, intra_in_p=True)),
    ("nosplit", dict(sign_hiding=True, tr_split=False, intra_in_p=True)),
]

for name, kw in CFGS:
    fn = functools.partial(
        p_chunk.p_chunk_device, ctu=CTU, search=64, me_precision=2,
        deblock=True, sao=True, cap=cap, tree=True,
        vis=(720, 1280), **kw)
    out = fn(*argsets[0], qps)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
    ts = []
    for i in range(1, NSET):
        t0 = time.perf_counter()
        out = fn(*argsets[i], qps)
        for lf in jax.tree_util.tree_leaves(out):
            lf.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s} {min(ts)/K*1e3:7.1f} ms/f", flush=True)
