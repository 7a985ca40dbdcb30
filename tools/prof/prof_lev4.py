"""Sub-stage timing of _level_encode at S=16 (720p, bench settings): each
piece runs K=8 times inside one jit via lax.map so the ~25 ms tunnel
dispatch overhead amortizes. Prints net ms/frame per piece."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.ops import interp
from homerhevc_tpu.ops import quant as quant_ops
from homerhevc_tpu.ops import transforms as tx_ops
from homerhevc_tpu.pipeline.p_golden import PAD

I32 = jnp.int32
W, H, S, QP = 1280, 736, 16, 32
K = 8
nby, nbx = H // S, W // S
nb = nby * nbx
G = S + 2
lam = int(tables.LAMBDA_ME_FX_P[QP])

rng = np.random.default_rng(0)


def mk(seed):
    r = np.random.default_rng(seed)
    cur = jnp.asarray(r.integers(0, 256, (K, H, W), np.int32))
    ry = jnp.asarray(np.pad(r.integers(0, 256, (K, H, W), np.int16),
                            ((0, 0), (PAD, PAD), (PAD, PAD)), mode="edge"))
    vy = jnp.asarray(r.integers(-60, 61, (K, nb), np.int32))
    vx = jnp.asarray(r.integers(-60, 61, (K, nb), np.int32))
    win = jnp.asarray(r.integers(0, 256, (K, S + 9, S + 9, nb), np.int32))
    gstack = jnp.asarray(r.integers(0, 256, (K, 16, G, G, nb), np.int32))
    blk = jnp.asarray(r.integers(0, 256, (K, S, S, nb), np.int32))
    pidx = jnp.asarray(r.integers(0, 16, (K, nb), np.int32))
    predb = jnp.asarray(r.integers(0, 256, (K, nb, S, S), np.int32))
    resid = jnp.asarray(r.integers(-30, 31, (K, nb, S, S), np.int32))
    return dict(cur=cur, ry=ry, vy=vy, vx=vx, win=win, gstack=gstack,
                blk=blk, pidx=pidx, predb=predb, resid=resid)


bi = np.arange(nb, dtype=np.int32)
rr = jnp.asarray(bi // nbx)
cc = jnp.asarray(bi % nbx)


def piece_gather(d):
    def one(a):
        ry, vy, vx = a
        return jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(ry, (yy, xx),
                                                 (S + 9, S + 9)),
            out_axes=2)(rr * S + vy - 4 + PAD, cc * S + vx - 4 + PAD)
    return jax.lax.map(one, (d["ry"], d["vy"], d["vx"]))


def piece_grids(d):
    def one(win):
        def filt_h(b, taps, w_out):
            acc = taps[0] * b[:, 0:w_out, :]
            for i in range(1, len(taps)):
                acc = acc + int(taps[i]) * b[:, i:i + w_out, :]
            return acc

        def filt_v(b, taps, h_out):
            acc = taps[0] * b[0:h_out, :, :]
            for i in range(1, len(taps)):
                acc = acc + int(taps[i]) * b[i:i + h_out, :, :]
            return acc
        hraw = [filt_h(win, interp.LUMA_FILTERS[fx], G) for fx in range(4)]
        grids = []
        for fy in range(4):
            for fx in range(4):
                vv = filt_v(hraw[fx], interp.LUMA_FILTERS[fy], G) >> 6
                grids.append(jnp.clip((vv + 32) >> 6, 0, 255))
        return jnp.stack(grids)
    return jax.lax.map(one, d["win"])


def piece_costs(d):
    qp_idx = [(qy, qx) for qy in range(-3, 4) for qx in range(-3, 4)]

    def one(a):
        gstack, blk = a
        sads = []
        for qy, qx in qp_idx:
            fy, fx = qy & 3, qx & 3
            iy, ix = qy >> 2, qx >> 2
            pred = gstack[fy * 4 + fx, 1 + iy:1 + iy + S,
                          1 + ix:1 + ix + S, :]
            sads.append(jnp.abs(blk - pred).sum(axis=(0, 1)))
        return jnp.stack(sads)
    return jax.lax.map(one, (d["gstack"], d["blk"]))


def piece_select(d):
    def one(a):
        gstack, pidx = a
        sel = jnp.zeros((G, G, nb), I32)
        for p in range(16):
            sel = sel + jnp.where(pidx == p, gstack[p], 0)
        return sel[1:1 + S, 1:1 + S]
    return jax.lax.map(one, (d["gstack"], d["pidx"]))


def piece_code(d):
    def one(a):
        predb, resid = a
        orig = predb + resid
        coeff = tx_ops.forward_transform(resid)
        lev = quant_ops.quantize(coeff, QP, 4, is_intra=False)
        lev = quant_ops.sign_bit_hiding(lev, coeff, QP, 4)
        rr_ = tx_ops.inverse_transform(quant_ops.dequantize(lev, QP, 4))
        rec = jnp.clip(predb + rr_, 0, 255)
        return lev, rec
    return jax.lax.map(one, (d["predb"], d["resid"]))


def piece_code_nosbh(d):
    def one(a):
        predb, resid = a
        coeff = tx_ops.forward_transform(resid)
        lev = quant_ops.quantize(coeff, QP, 4, is_intra=False)
        rr_ = tx_ops.inverse_transform(quant_ops.dequantize(lev, QP, 4))
        rec = jnp.clip(predb + rr_, 0, 255)
        return lev, rec
    return jax.lax.map(one, (d["predb"], d["resid"]))


@jax.jit
def noop(d):
    return d["vy"] + 1


pieces = [("noop(overhead)", noop), ("win gather", jax.jit(piece_gather)),
          ("16 qpel grids", jax.jit(piece_grids)),
          ("49 sad costs", jax.jit(piece_costs)),
          ("pred select", jax.jit(piece_select)),
          ("code+sbh", jax.jit(piece_code)),
          ("code nosbh", jax.jit(piece_code_nosbh))]

sets = [mk(s) for s in range(3)]
for s in sets:
    for x in s.values():
        np.asarray(x.reshape(-1)[:2])

for name, fn in pieces:
    out = fn(sets[0])
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:2])
    ts = []
    for s in sets[1:]:
        t0 = time.perf_counter()
        out = fn(s)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:2])
        ts.append(time.perf_counter() - t0)
    print(f"{name:16s} {min(ts)/K*1e3:7.2f} ms/frame", flush=True)
