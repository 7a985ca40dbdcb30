"""Capture a jax.profiler device trace of one warm p_chunk_device dispatch
(K=8 at 720p) and print the top HLO ops by device time from the resulting
trace.json.gz (no tensorboard needed)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools

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

out = fn(ys, us, vs, ry, ru, rv, qps)       # warm compile
for lf in jax.tree_util.tree_leaves(out):
    lf.block_until_ready()

logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    out = fn(ys, us, vs, ry, ru, rv, qps)
    for lf in jax.tree_util.tree_leaves(out):
        lf.block_until_ready()

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
if not files:
    sys.exit("no trace produced")
with gzip.open(files[0], "rt") as f:
    tr = json.load(f)

# aggregate device-lane complete events by name
dur = defaultdict(float)
cnt = defaultdict(int)
pid_names = {}
for ev in tr.get("traceEvents", []):
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev["pid"]] = ev["args"].get("name", "")
for ev in tr.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    pn = pid_names.get(ev.get("pid"), "")
    if "TPU" not in pn and "/device" not in pn.lower():
        continue
    name = ev.get("name", "?")
    dur[name] += ev.get("dur", 0)
    cnt[name] += 1

tot = sum(dur.values())
print(f"total device-op time: {tot/1e3:.1f} ms over {sum(cnt.values())} evs")
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:60]:
    print(f"{d/1e3:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")
