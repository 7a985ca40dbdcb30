"""Stage-internal profile of _level_encode at 720p on TPU: qpel grid
build, 49-SAD sweep, merge RD, code() per plane, tr_split trial, SBH,
level_bits_est — each isolated by a truncated jit (XLA DCEs the rest)."""
import functools
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
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu.utils.synth import synth_clip

I32 = jnp.int32
W, H, QP = 1280, 736, 32
NSET = 3


def pad(a, h, w):
    return np.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])), mode="edge")


sets = []
for seed in range(NSET):
    fr = list(synth_clip(W, 720, 2, seed=seed))
    y = jnp.asarray(pad(fr[1][0], H, W))
    u = jnp.asarray(pad(fr[1][1], H // 2, W // 2))
    v = jnp.asarray(pad(fr[1][2], H // 2, W // 2))
    ry = jnp.pad(jnp.asarray(pad(fr[0][0], H, W)).astype(jnp.int16), PAD,
                 mode="edge")
    ru = jnp.pad(jnp.asarray(pad(fr[0][1], H // 2, W // 2)).astype(jnp.int16),
                 PAD // 2, mode="edge")
    rv = jnp.pad(jnp.asarray(pad(fr[0][2], H // 2, W // 2)).astype(jnp.int16),
                 PAD // 2, mode="edge")
    sets.append((y, u, v, ry, ru, rv))
for s in sets:
    for x in s:
        np.asarray(x.reshape(-1)[:4])


@functools.partial(jax.jit, static_argnames=("S", "stage"))
def lev_stage(y, u, v, ry, ru, rv, *, S, stage):
    cur = y.astype(I32)
    lam = jnp.asarray(tables.LAMBDA_ME_FX_P)[QP]
    me = p_jax._me_hier(cur, ry, sizes=(16, 32), search=64, lam=lam)
    ivy, ivx, icost = me[S]
    if stage == "me":
        return icost
    nby, nbx = H // S, W // S
    nb = nby * nbx
    S2 = S // 2
    G = S + 2
    vy = ivy.reshape(-1).astype(I32)
    vx = ivx.reshape(-1).astype(I32)
    r = jnp.arange(nb, dtype=I32) // nbx
    c = jnp.arange(nb, dtype=I32) % nbx
    win = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(ry, (yy, xx), (S + 9, S + 9)),
        out_axes=2)(r * S + vy - 4 + PAD, c * S + vx - 4 + PAD).astype(I32)

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
    gstack = jnp.stack(grids)
    if stage == "qpel":
        return gstack.sum(axis=(1, 2))
    blk = (cur.reshape(nby, S, nbx, S).transpose(1, 3, 0, 2).reshape(S, S, nb))
    sads = []
    for qy in range(-3, 4):
        for qx in range(-3, 4):
            fy, fx = qy & 3, qx & 3
            iy, ix = qy >> 2, qx >> 2
            pred = gstack[fy * 4 + fx, 1 + iy:1 + iy + S,
                          1 + ix:1 + ix + S, :]
            sads.append(jnp.abs(blk - pred).sum(axis=(0, 1)))
    if stage == "sad49":
        return jnp.stack(sads)
    pred_yb = gstack[5, 1:1 + S, 1:1 + S, :].transpose(2, 0, 1)
    blk_b = blk.transpose(2, 0, 1)
    lg2 = S.bit_length() - 1
    coeff = tx_ops.forward_transform(blk_b - pred_yb)
    if stage == "fwd":
        return coeff.sum(axis=(1, 2))
    lev = quant_ops.quantize(coeff, QP, lg2, is_intra=False)
    if stage == "quant":
        return lev.sum(axis=(1, 2))
    if stage == "sbh":
        return quant_ops.sign_bit_hiding(lev, coeff, QP, lg2).sum(axis=(1, 2))
    if stage == "bits":
        return tables.level_bits_est(lev, xp=jnp)
    rr = tx_ops.inverse_transform(quant_ops.dequantize(lev, QP, lg2))
    if stage == "inv":
        return rr.sum(axis=(1, 2))
    raise ValueError(stage)


for S in (16, 32):
    for stage in ("me", "qpel", "sad49", "fwd", "quant", "sbh", "bits",
                  "inv"):
        fn = functools.partial(lev_stage, S=S, stage=stage)
        out = fn(*sets[0])
        np.asarray(out.reshape(-1)[:4])
        ts = []
        for i in range(1, NSET):
            t0 = time.perf_counter()
            out = fn(*sets[i])
            np.asarray(out.reshape(-1)[:4])
            ts.append(time.perf_counter() - t0)
        print(f"S={S} {stage:7s} {min(ts)*1e3:7.2f} ms", flush=True)
