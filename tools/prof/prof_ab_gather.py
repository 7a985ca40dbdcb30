"""A/B the one-hot MXU gather vs the XLA loop gather on the REAL chunk
pipeline: asserts bit-identical wires, reports per-frame time for both.
Usage: HOMERHEVC_GATHER=xla python ... (run twice; this script runs both
by spawning itself is overkill — it just runs the configured mode)."""
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
cap = max(1024, (H // 4) * (W // 4) * 3 // 2 // 32)


def pad(a, h, w):
    return np.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])), mode="edge")


fr = list(synth_clip(W, 720, K + 1, seed=0))
ys = jnp.asarray(np.stack([pad(f[0], H, W) for f in fr[1:]]))
us = jnp.asarray(np.stack([pad(f[1], H // 2, W // 2) for f in fr[1:]]))
vs = jnp.asarray(np.stack([pad(f[2], H // 2, W // 2) for f in fr[1:]]))
ry = jnp.asarray(pad(fr[0][0], H, W))
ru = jnp.asarray(pad(fr[0][1], H // 2, W // 2))
rv = jnp.asarray(pad(fr[0][2], H // 2, W // 2))
qps = jnp.full((K,), QP, jnp.int32)

fn = functools.partial(
    p_chunk.p_chunk_device, ctu=CTU, search=64, me_precision=2,
    deblock=True, sao=True, cap=cap, tree=True, sign_hiding=True,
    tr_split=True, intra_in_p=True, vis=(720, 1280))

out = fn(ys, us, vs, ry, ru, rv, qps)
wires = np.asarray(out[0])
for lf in jax.tree_util.tree_leaves(out):
    lf.block_until_ready()
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    o = fn(ys, us, vs, ry, ru, rv, qps)
    for lf in jax.tree_util.tree_leaves(o):
        lf.block_until_ready()
    ts.append(time.perf_counter() - t0)
mode = os.environ.get("HOMERHEVC_GATHER", "oh")
print(f"mode={mode} {min(ts)/K*1e3:7.1f} ms/f", flush=True)
outf = f"/tmp/ab_gather_{mode}.npy"
np.save(outf, wires)
other = "/tmp/ab_gather_xla.npy" if mode != "xla" else "/tmp/ab_gather_oh.npy"
if os.path.exists(other):
    w2 = np.load(other)
    same = np.array_equal(wires, w2)
    print("wires bit-identical:", same)
    if not same:
        d = np.nonzero(wires != w2)
        print("first diffs:", d[0][:5], d[1][:5])
        sys.exit(1)
