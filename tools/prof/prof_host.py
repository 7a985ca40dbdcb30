"""Time the per-frame HOST residue of the chunked P path in isolation:
unpack_wire -> scatter_levels -> unit-map upsample -> nz -> tree decisions
-> maps -> native CABAC. Synthesizes a realistic 720p wire row (no TPU)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from homerhevc_tpu.api import _tree_decisions
from homerhevc_tpu.entropy import headers, native_backend
from homerhevc_tpu.pipeline import p_chunk

H, W, CTU = 736, 1280, 32
CAP = max(1024, (H // 4) * (W // 4) * 3 // 2 // 32)
CNT = int(os.environ.get("CNT", 1500))
uh, uw = H // 4, W // 4
h16, w16 = H // 16, W // 16
nby, nbx = H // CTU, W // CTU

rng = np.random.default_rng(0)

# ---- synthesize a wire row ----
layout = p_chunk.wire_layout(H, W, CTU, CAP)
L = sum(int(np.prod(s)) for _, s in layout)
row = np.zeros(L, np.int32)
o = 0
pos = {}
for name, shape in layout:
    n = int(np.prod(shape))
    pos[name] = (o, shape)
    o += n
row[pos["cnt"][0]] = CNT
# dec16: depth 0..2, trd/intra bits sparse, mvs small
d = rng.integers(0, 3, (h16, w16)).astype(np.int32)
mvx = rng.integers(-32, 33, (h16, w16))
mvy = rng.integers(-16, 17, (h16, w16))
dec16 = (d | (rng.integers(0, 2, (h16, w16)) << 2)
         | ((mvx + 2048) << 4) | ((mvy + 2048) << 16))
row[pos["dec16"][0]:pos["dec16"][0] + h16 * w16] = dec16.ravel()
row[pos["sad"][0]:pos["sad"][0] + nby * nbx] = 5000
# idx/vals: CNT sorted unique indices with small levels
L4 = uh * uw + 2 * (H // 8) * (W // 8)
idx = np.sort(rng.choice(L4, CNT, replace=False)).astype(np.int32)
full_idx = np.full(CAP, L4, np.int32)
full_idx[:CNT] = idx
row[pos["idx"][0]:pos["idx"][0] + CAP] = full_idx
vals16 = np.zeros((CAP, 16), np.int16)
vals16[:CNT] = rng.integers(-5, 6, (CNT, 16))
row[pos["vals"][0]:pos["vals"][0] + CAP * 8] = (
    vals16.reshape(CAP, 8, 2).astype(np.int16).view(np.int32).ravel())

params = headers.StreamParams(
    width=1280, height=720, pad_right=0, pad_bottom=16,
    ctu_log2=5, min_cu_log2=3, max_tu_log2=5,
    max_tr_depth_intra=0, max_tr_depth_inter=1,
    init_qp=32, sign_hiding=True, deblocking_disabled=False,
    num_ref_frames=1, wpp_enabled=False, sao_enabled=True)

T = {}


def tick(name, f, n=20):
    f()                     # warm
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    T[name] = (time.perf_counter() - t0) / n * 1e3
    return r


w = tick("unpack", lambda: p_chunk.unpack_wire(row, H, W, CTU, CAP))
cnt = int(w["cnt"][0])
levs = tick("scatter", lambda: p_chunk.scatter_levels(
    w["idx"], w["vals"], min(cnt, CAP), H, W))
lev_y, lev_u, lev_v = levs


def upsample():
    depth_u = np.repeat(np.repeat(w["depth16"], 4, 0), 4, 1)
    trd_u = np.repeat(np.repeat(w["trd16"], 4, 0), 4, 1)
    intra_u = np.repeat(np.repeat(w["intra16"], 4, 0), 4, 1)
    mv_u = np.repeat(np.repeat(w["mv16"], 4, 0), 4, 1)
    return depth_u, trd_u, intra_u, mv_u


depth_u, trd_u, intra_u, mv_u = tick("upsample", upsample)


def nzf():
    nz_y = np.any(lev_y.reshape(uh, 4, uw, 4) != 0, axis=(1, 3))
    nz_u = np.any(lev_u.reshape(uh, 2, uw, 2) != 0, axis=(1, 3))
    nz_v = np.any(lev_v.reshape(uh, 2, uw, 2) != 0, axis=(1, 3))
    return nz_y | nz_u | nz_v


nz = tick("nz", nzf)
dec = tick("decisions", lambda: _tree_decisions(
    depth_u, mv_u, nz, 5, 5, pred_intra_u=intra_u))
imode_u = np.where(intra_u.astype(bool), mv_u[..., 0], 1)
maps = tick("maps", lambda: native_backend.maps_from_p_units(
    depth_u, dec, lev_y, lev_u, lev_v, tr_depth=trd_u,
    pred_intra=intra_u, intra_mode=imode_u))
au = tick("cabac", lambda: native_backend.encode_slice_from_maps(
    params, maps, slice_qp=32, slice_type=headers.SLICE_P))

tot = sum(T.values())
for k, v in T.items():
    print(f"{k:10s} {v:8.3f} ms")
print(f"{'TOTAL':10s} {tot:8.3f} ms   (au {len(au)} B, cnt {cnt})")
