"""Round-3 device ablation: time p_chunk_device with the BENCH config and
each expensive stage toggled off, on realistic content."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.pipeline import p_chunk
from homerhevc_tpu.utils.synth import synth_clip

W, H = 1280, 736
K = 8
NSET = 4            # distinct input sets: defeats the axon result cache


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
    qps = np.full((K,), 32, np.int32)
    argsets.append([jnp.asarray(a)
                    for a in (ys, us, vs, ry, ru, rv, qps)])
for a in argsets:
    for x in a:                 # tiny fetch forces the (lazy) upload
        np.asarray(x.reshape(-1)[:4])
cap = max(1024, (H // 4) * (W // 4) * 3 // 2 // 32)

base = dict(ctu=32, search=64, me_precision=2, sign_hiding=True,
            deblock=True, sao=True, cap=cap, tree=True, tr_split=True,
            intra_in_p=True, vis=(720, 1280))

variants = [
    ("bench(all)", {}),
    ("-tr_split", dict(tr_split=False)),
    ("-intra_in_p", dict(intra_in_p=False)),
    ("-sao", dict(sao=False)),
    ("-deblock", dict(deblock=False)),
    ("-sbh", dict(sign_hiding=False)),
    ("search16", dict(search=16)),
    ("minimal", dict(tr_split=False, intra_in_p=False, sao=False,
                     deblock=False)),
]
for name, kw in variants:
    k = dict(base)
    k.update(kw)
    def force(o):
        # axon executes lazily: only a host fetch forces the computation
        np.asarray(o[2][:1, :8])
    out = p_chunk.p_chunk_device(*argsets[0], **k)
    force(out)
    ts = []
    for i in range(1, NSET):
        t0 = time.perf_counter()
        out = p_chunk.p_chunk_device(*argsets[i], **k)
        force(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:14s} {min(ts)/K*1e3:7.1f} ms/f", flush=True)
