import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
W, H, PAD = 1280, 736, 72
rng = np.random.default_rng(0)
ry0 = rng.integers(0,256,(H+2*PAD,W+2*PAD),np.int32)

def g(dt, wsz, S):
    nb = (H//S)*(W//S)
    @jax.jit
    def f(ry, vy, vx):
        ry = ry.astype(dt)
        bi = jnp.arange(nb, dtype=jnp.int32)
        r, c = bi // (W//S), bi % (W//S)
        win = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(ry,(yy,xx),(wsz,wsz)),
                       out_axes=2)(r*S+vy-3+PAD, c*S+vx-3+PAD)
        return win.astype(jnp.int32).sum()
    return f, nb

vy0 = rng.integers(-64, 65, ((H//16)*(W//16),)).astype(np.int32)
for name, dt, wsz, S in [("i32 22x22 S16", jnp.int32, 22, 16),
                          ("i16 22x22 S16", jnp.int16, 22, 16),
                          ("u8  22x22 S16", jnp.uint8, 22, 16),
                          ("i16 38x38 S32", jnp.int16, 38, 32)]:
    f, nb = g(dt, wsz, S)
    vy = jnp.asarray((vy0[:nb]//4)*4); vx = jnp.asarray((vy0[:nb][::-1]//4)*4)
    np.asarray(f(jnp.asarray(ry0), vy, vx))
    ts=[]
    for i in range(3):
        r2 = jnp.asarray(ry0 ^ (i+1)); np.asarray(r2[:1,:1])
        t0=time.perf_counter(); np.asarray(f(r2, vy, vx)); ts.append(time.perf_counter()-t0)
    print(f"{name:16s} {min(ts)*1e3:7.1f} ms")
