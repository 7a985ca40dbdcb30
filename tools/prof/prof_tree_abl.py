import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from homerhevc_tpu.pipeline import p_jax
from homerhevc_tpu.pipeline.p_golden import PAD
from homerhevc_tpu import tables

W, H = 1280, 736
rng = np.random.default_rng(0)
cur0 = rng.integers(0,256,(H,W),np.uint8)
u0 = rng.integers(0,256,(H//2,W//2),np.uint8)
v0 = rng.integers(0,256,(H//2,W//2),np.uint8)
ry0 = rng.integers(0,256,(H,W),np.uint8)

def variant(mode, search=64):
    @jax.jit
    def f(y, u, v, refy):
        qp = jnp.asarray(32, jnp.int32)
        qp_c = tables.chroma_qp_from_luma(qp, xp=jnp)
        lam = jnp.asarray(tables.LAMBDA_ME_FX)[qp]
        cur = y.astype(jnp.int32)
        ry = jnp.pad(refy.astype(jnp.int16), PAD, mode="edge")
        ru = jnp.pad((u.astype(jnp.int16)*0+128), PAD//2, mode="edge")
        rv = ru
        if mode == "baseline":
            return cur.sum() + ry.astype(jnp.int32).sum()
        me = p_jax._me_hier(cur, ry, sizes=(16, 32), search=search, lam=lam)
        if mode == "me":
            return sum(a.sum() for t in me.values() for a in t)
        acc = []
        for S in ([16] if mode in ("lev16",) else [16, 32]):
            ivy, ivx, ic = me[S]
            e = p_jax._level_encode(cur, u, v, ry, ru, rv, ivy, ivx, S=S,
                                    qp=qp, qp_c=qp_c, lam=lam, search=search,
                                    me_precision=2, sign_hiding=True)
            acc.append(e["rec_y"].sum() + e["lev_y"].sum() + e["cost"].sum())
        return sum(acc)
    return f

for mode in ["baseline", "me", "lev16", "lev32both"]:
    f = variant(mode)
    args0 = (jnp.asarray(cur0), jnp.asarray(u0), jnp.asarray(v0), jnp.asarray(ry0))
    np.asarray(f(*args0))
    ts=[]
    for i in range(3):
        a2 = tuple(jnp.asarray(np.asarray(x) ^ np.uint8(i+1)) for x in args0)
        for x in a2: np.asarray(x[:1,:1])
        t0=time.perf_counter(); np.asarray(f(*a2)); ts.append(time.perf_counter()-t0)
    print(f"{mode:10s} {min(ts)*1e3:7.1f} ms")

# in-scan: 8 frames, tree stage only vs full chunk body
from homerhevc_tpu.pipeline import p_chunk
K = 8
ys0 = rng.integers(0,256,(K,H,W),np.uint8)
us0 = rng.integers(0,256,(K,H//2,W//2),np.uint8)
vs0 = rng.integers(0,256,(K,H//2,W//2),np.uint8)

@jax.jit
def scan_tree(ys, us, vs, refy, refu, refv):
    def body(refs, xs):
        ry8, ru8, rv8 = refs
        y, u, v = xs
        ryp = jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge")
        rup = jnp.pad(ru8.astype(jnp.int16), PAD//2, mode="edge")
        rvp = jnp.pad(rv8.astype(jnp.int16), PAD//2, mode="edge")
        res = p_jax._p_stage_tree(y, u, v, ryp, rup, rvp, ctu=32,
                                  qp=jnp.asarray(32, jnp.int32), search=64,
                                  me_precision=2, sign_hiding=True)
        return (res["recon_y"], res["recon_u"], res["recon_v"]), res["sad"].sum()
    (_, _, _), sads = jax.lax.scan(body, (refy, refu, refv), (ys, us, vs))
    return sads.sum()

f = scan_tree
args0 = tuple(jnp.asarray(a) for a in (ys0, us0, vs0, ry0, u0, v0))
np.asarray(f(*args0))
ts=[]
for i in range(2):
    a2 = tuple(jnp.asarray(np.asarray(x) ^ np.uint8(i+1)) for x in args0)
    for x in a2: np.asarray(x.reshape(-1)[:2])
    t0=time.perf_counter(); np.asarray(f(*a2)); ts.append(time.perf_counter()-t0)
print(f"scan_tree(8) {min(ts)/K*1e3:7.1f} ms/f")

# wrapper ablations: tree + dbk/sao + [to4 | nonzero | take | full]
from homerhevc_tpu.ops import deblock as dbk_ops
from homerhevc_tpu.ops import sao as sao_ops

def scan_var(mode):
    cap = 5520
    @jax.jit
    def f(ys, us, vs, refy, refu, refv):
        def body(refs, xs):
            ry8, ru8, rv8 = refs
            y, u, v = xs
            ryp = jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge")
            rup = jnp.pad(ru8.astype(jnp.int16), PAD//2, mode="edge")
            rvp = jnp.pad(rv8.astype(jnp.int16), PAD//2, mode="edge")
            res = p_jax._p_stage_tree(y, u, v, ryp, rup, rvp, ctu=32,
                                      qp=jnp.asarray(32, jnp.int32), search=64,
                                      me_precision=2, sign_hiding=True)
            lev_yp, lev_up, lev_vp = res["lev_y"], res["lev_u"], res["lev_v"]
            outv = res["sad"].sum()
            if mode >= 1:     # _to4 pack
                lv4 = jnp.concatenate([p_chunk._to4(lev_yp), p_chunk._to4(lev_up),
                                       p_chunk._to4(lev_vp)])
                outv = outv + lv4.astype(jnp.int32).sum()
            if mode >= 2:     # nonzero
                nzm = jnp.any(lv4 != 0, axis=1)
                L4 = lv4.shape[0]
                (idx,) = jnp.nonzero(nzm, size=cap, fill_value=L4)
                outv = outv + idx.sum()
            if mode >= 3:     # take + bitcast
                vals = jnp.take(lv4, jnp.minimum(idx, L4-1), axis=0)
                vals = jnp.where((idx < L4)[:, None], vals, 0)
                v32 = jax.lax.bitcast_convert_type(vals.reshape(cap, 8, 2), jnp.int32)
                outv = outv + v32.sum()
            return (res["recon_y"], res["recon_u"], res["recon_v"]), outv
        _, o = jax.lax.scan(body, (refy, refu, refv), (ys, us, vs))
        return o.sum()
    return f

for mode, name in [(1, "+to4"), (2, "+nonzero"), (3, "+take")]:
    f = scan_var(mode)
    args0 = tuple(jnp.asarray(a) for a in (ys0, us0, vs0, ry0, u0, v0))
    np.asarray(f(*args0))
    ts=[]
    for i in range(2):
        a2 = tuple(jnp.asarray(np.asarray(x) ^ np.uint8(i+1)) for x in args0)
        for x in a2: np.asarray(x.reshape(-1)[:2])
        t0=time.perf_counter(); np.asarray(f(*a2)); ts.append(time.perf_counter()-t0)
    print(f"scan{name:9s} {min(ts)/K*1e3:7.1f} ms/f")

# packing layout variants
def scan_pack(mode):
    @jax.jit
    def f(ys, us, vs, refy, refu, refv):
        def body(refs, xs):
            ry8, ru8, rv8 = refs
            y, u, v = xs
            ryp = jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge")
            rup = jnp.pad(ru8.astype(jnp.int16), PAD//2, mode="edge")
            rvp = jnp.pad(rv8.astype(jnp.int16), PAD//2, mode="edge")
            res = p_jax._p_stage_tree(y, u, v, ryp, rup, rvp, ctu=32,
                                      qp=jnp.asarray(32, jnp.int32), search=64,
                                      me_precision=2, sign_hiding=True)
            levs = [res["lev_y"], res["lev_u"], res["lev_v"]]
            outv = res["sad"].sum()
            if mode == "to4_i32":
                def to4(p):
                    h, w = p.shape
                    return (p.astype(jnp.int32).reshape(h//4,4,w//4,4)
                            .transpose(0,2,1,3).reshape(-1,16))
                lv = jnp.concatenate([to4(p) for p in levs])
                outv += lv.sum()
            elif mode == "tile4x32":
                def tot(p):
                    h, w = p.shape
                    return (p.reshape(h//4, 4, w//32, 32)
                            .transpose(0, 2, 1, 3).reshape(-1, 128))
                lv = jnp.concatenate([tot(p) for p in levs])
                outv += lv.astype(jnp.int32).sum()
            elif mode == "tile8x128":
                def tot(p):
                    h, w = p.shape
                    return (p.reshape(h//8, 8, w//128, 128)
                            .transpose(0, 2, 1, 3).reshape(-1, 8*128))
                lv = jnp.concatenate([tot(p) for p in levs])
                outv += lv.astype(jnp.int32).sum()
            return (res["recon_y"], res["recon_u"], res["recon_v"]), outv
        _, o = jax.lax.scan(body, (refy, refu, refv), (ys, us, vs))
        return o.sum()
    return f

for mode in ["to4_i32", "tile4x32", "tile8x128"]:
    f = scan_pack(mode)
    args0 = tuple(jnp.asarray(a) for a in (ys0, us0, vs0, ry0, u0, v0))
    np.asarray(f(*args0))
    ts=[]
    for i in range(2):
        a2 = tuple(jnp.asarray(np.asarray(x) ^ np.uint8(i+1)) for x in args0)
        for x in a2: np.asarray(x.reshape(-1)[:2])
        t0=time.perf_counter(); np.asarray(f(*a2)); ts.append(time.perf_counter()-t0)
    print(f"pack {mode:10s} {min(ts)/K*1e3:7.1f} ms/f")

def scan_levsum():
    @jax.jit
    def f(ys, us, vs, refy, refu, refv):
        def body(refs, xs):
            ry8, ru8, rv8 = refs
            y, u, v = xs
            ryp = jnp.pad(ry8.astype(jnp.int16), PAD, mode="edge")
            rup = jnp.pad(ru8.astype(jnp.int16), PAD//2, mode="edge")
            rvp = jnp.pad(rv8.astype(jnp.int16), PAD//2, mode="edge")
            res = p_jax._p_stage_tree(y, u, v, ryp, rup, rvp, ctu=32,
                                      qp=jnp.asarray(32, jnp.int32), search=64,
                                      me_precision=2, sign_hiding=True)
            o = (res["sad"].sum() + res["lev_y"].astype(jnp.int32).sum()
                 + res["lev_u"].astype(jnp.int32).sum()
                 + res["lev_v"].astype(jnp.int32).sum())
            return (res["recon_y"], res["recon_u"], res["recon_v"]), o
        _, o = jax.lax.scan(body, (refy, refu, refv), (ys, us, vs))
        return o.sum()
    return f

f = scan_levsum()
args0 = tuple(jnp.asarray(a) for a in (ys0, us0, vs0, ry0, u0, v0))
np.asarray(f(*args0))
ts=[]
for i in range(2):
    a2 = tuple(jnp.asarray(np.asarray(x) ^ np.uint8(i+1)) for x in args0)
    for x in a2: np.asarray(x.reshape(-1)[:2])
    t0=time.perf_counter(); np.asarray(f(*a2)); ts.append(time.perf_counter()-t0)
print(f"scan_levsum  {min(ts)/K*1e3:7.1f} ms/f")
