"""Round-5 device-time ablation at the EXACT bench operating point.

Times p_chunk_device (chunk=8, 720p, search=64, tree, tr_split,
intra_in_p, deblock+SAO) on the real seed-0 clip, then ablates the
major stages one at a time to attribute the ~35 ms/frame device cost.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from homerhevc_tpu.pipeline import p_chunk
from homerhevc_tpu.utils.synth import synth_clip

W, H = 1280, 720
PH, PW = 736, 1280
K = 8


def pad(a, h, w):
    out = np.zeros((h, w), np.uint8)
    out[:a.shape[0], :a.shape[1]] = a
    # edge-extend
    out[a.shape[0]:, :a.shape[1]] = a[-1:, :]
    out[:, a.shape[1]:] = out[:, a.shape[1]-1:a.shape[1]]
    return out


frames = list(synth_clip(W, H, K + 1, seed=0))
ys = np.stack([pad(f[0], PH, PW) for f in frames[1:]])
us = np.stack([pad(f[1], PH//2, PW//2) for f in frames[1:]])
vs = np.stack([pad(f[2], PH//2, PW//2) for f in frames[1:]])
ry = pad(frames[0][0], PH, PW)
ru = pad(frames[0][1], PH//2, PW//2)
rv = pad(frames[0][2], PH//2, PW//2)
qps = np.full((K,), 32, np.int32)
cap = max(1024, (PH//4)*(PW//4)*3//2 // 64)

BASE = dict(ctu=32, search=64, me_precision=2, sign_hiding=True,
            deblock=True, sao=True, cap=cap, tree=True, tr_split=True,
            intra_in_p=True, vis=(H, W))

ABL = [
    ("base", {}),
    ("no_sao", dict(sao=False)),
    ("no_deblock", dict(deblock=False)),
    ("no_trsplit", dict(tr_split=False)),
    ("no_intra_in_p", dict(intra_in_p=False)),
    ("search16", dict(search=16)),
    ("me_fullpel", dict(me_precision=0)),
]

args = [jnp.asarray(a) for a in (ys, us, vs, ry, ru, rv, qps)]
for name, over in ABL:
    kw = dict(BASE, **over)
    t0 = time.perf_counter()
    out = p_chunk.p_chunk_device(*args, **kw)
    jax.block_until_ready(out[2])
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = p_chunk.p_chunk_device(*args, **kw)
        jax.block_until_ready(out[2])
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[1]
    t0 = time.perf_counter()
    wires = np.asarray(out[0])
    tw = time.perf_counter() - t0
    print(f"{name:14s} compute {t:.3f}s ({t/K*1e3:5.1f} ms/f)  "
          f"wire {tw:.3f}s ({wires.nbytes/1e6:.2f} MB)", flush=True)
