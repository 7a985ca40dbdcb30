"""In-scan stage breakdown of the chunk pipeline: rebuilds p_chunk_device's
scan with the body truncated after each stage (XLA dead-code-eliminates the
rest), timing K=8 frames per dispatch at bench settings."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.ops import deblock as dbk
from homerhevc_tpu.pipeline import p_chunk, p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu.utils.synth import synth_clip

I32 = jnp.int32
W, H, K, CTU, QP = 1280, 736, 8, 32, 32
NSET = 3
cap = max(1024, (H // 4) * (W // 4) * 3 // 2 // 32)


def pad(a, h, w):
    return np.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])),
                  mode="edge")


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


@functools.partial(jax.jit, static_argnames=("stage",))
def chunk_stage(ys, us, vs, ref_y, ref_u, ref_v, *, stage: str):
    def body(refs, xs):
        ry8, ru8, rv8 = refs
        y, u, v = xs
        ryp = jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge")
        rup = jnp.pad(ru8.astype(jnp.int16), PAD // 2, mode="edge")
        rvp = jnp.pad(rv8.astype(jnp.int16), PAD // 2, mode="edge")
        cur = y.astype(I32)
        lam = jnp.asarray(tables.LAMBDA_ME_FX_P)[QP]
        if stage == "me":
            me = p_jax._me_hier(cur, ryp, sizes=(16, 32), search=64, lam=lam)
            out = me[32][2] + me[16][2][::2, ::2]
            # carry unchanged: isolates the ME sweep cost
            return (ry8, ru8, rv8), out.astype(I32)
        res = p_jax._p_stage_tree(
            y, u, v, ryp, rup, rvp, ctu=CTU, qp=QP, search=64,
            me_precision=2, sign_hiding=True,
            tr_split=(stage not in ("tree-notr",)),
            intra_in_p=(stage not in ("tree-notr", "tree-nointra")),
            vis=(720, 1280))
        rec = (res["recon_y"].astype(I32), res["recon_u"].astype(I32),
               res["recon_v"].astype(I32))
        if stage.startswith("tree"):
            # carry the UNFILTERED recon: cost up to tree select
            fy = res["recon_y"]
            fu = res["recon_u"]
            fv = res["recon_v"]
            return (fy, fu, fv), res["sad"]
        bs_v, bs_h = dbk.inter_bs_from_units(
            res["depth_u"], res["mv_u"], res["cbf_u"], 5, xp=jnp,
            trd_u=res["trd_u"], intra_u=res["pred_intra_u"])
        qp_map = jnp.repeat(jnp.repeat(res["qp_ctu"], CTU // 4, 0),
                            CTU // 4, 1)
        fy, fu, fv = dbk.deblock_frame(*rec, bs_v=bs_v, bs_h=bs_h,
                                       qp_map=qp_map, xp=jnp)
        if stage == "deblock":
            return (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                    fv.astype(jnp.uint8)), res["sad"]
        qp_c = tables.chroma_qp_from_luma(QP, xp=jnp)
        pp, (fy, fu, fv) = p_chunk._sao_device(
            (y.astype(I32), u.astype(I32), v.astype(I32)),
            (fy.astype(I32), fu.astype(I32), fv.astype(I32)), CTU, QP, qp_c)
        fy, fu, fv = (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                      fv.astype(jnp.uint8))
        if stage == "sao":
            return (fy, fu, fv), res["sad"]
        # wire compaction
        lv4 = jnp.concatenate([p_chunk._to4(res["lev_y"]),
                               p_chunk._to4(res["lev_u"]),
                               p_chunk._to4(res["lev_v"])])
        nzm = jnp.any(lv4 != 0, axis=1)
        L4 = lv4.shape[0]
        (idx,) = jnp.nonzero(nzm, size=cap, fill_value=L4)
        vals = jnp.take(lv4, jnp.minimum(idx, L4 - 1), axis=0)
        vals = jnp.where((idx < L4)[:, None], vals, 0)
        return (fy, fu, fv), (res["sad"], idx, vals)

    _, out = jax.lax.scan(body, (ref_y, ref_u, ref_v), (ys, us, vs))
    return out


for stage in ("me", "tree-notr", "tree-nointra", "tree", "deblock", "sao",
              "wire"):
    fn = functools.partial(chunk_stage, stage=stage)
    out = fn(*argsets[0])
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
    ts = []
    for i in range(1, NSET):
        t0 = time.perf_counter()
        out = fn(*argsets[i])
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
        ts.append(time.perf_counter() - t0)
    print(f"{stage:14s} {min(ts)/K*1e3:7.1f} ms/f", flush=True)
