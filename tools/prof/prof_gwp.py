"""Correctness + in-scan timing of the Pallas window gather vs
vmap(dynamic_slice) on TPU."""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.ops.gather_pallas import gather_windows_grid

I32 = jnp.int32
PAD = 80
H, W, K = 736, 1280, 8
Hp, Wp = H + 2 * PAD, W + 2 * PAD
rng = np.random.default_rng(0)
plane_n = rng.integers(0, 255, (Hp, Wp), np.int16)
plane = jnp.asarray(plane_n)

for S, G in ((16, 25), (32, 41), (16, 22)):
    nby, nbx = H // S, W // S
    nb = nby * nbx
    r = (np.arange(nb) // nbx) * S
    c = (np.arange(nb) % nbx) * S
    vy = rng.integers(-64, 65, nb)
    vx = rng.integers(-64, 65, nb)
    by = jnp.asarray(r + vy - 4 + PAD, jnp.int32)
    bx = jnp.asarray(c + vx - 4 + PAD, jnp.int32)
    lo = PAD - 68
    band_h = 2 * 68 + G
    out = gather_windows_grid(plane, by, bx, nby=nby, nbx=nbx, G=G,
                              S_row=S, lo=lo, band_h=band_h)
    out_n = np.asarray(out)
    # numpy oracle
    ref = np.stack([plane_n[by[b]:by[b] + G, bx[b]:bx[b] + G]
                    for b in range(nb)])
    np.testing.assert_array_equal(out_n, ref)
    print(f"S={S} G={G}: exact", flush=True)

# in-scan timing, S=16 G=25
S, G = 16, 25
nby, nbx = H // S, W // S
nb = nby * nbx
lo = PAD - 68
band_h = 2 * 68 + G
r = jnp.asarray((np.arange(nb) // nbx) * S, jnp.int32)
c = jnp.asarray((np.arange(nb) % nbx) * S, jnp.int32)
vys = jnp.asarray(rng.integers(-64, 65, (K, nb)), jnp.int32)
vxs = jnp.asarray(rng.integers(-64, 65, (K, nb)), jnp.int32)
plane8 = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))


@functools.partial(jax.jit, static_argnames=("mode",))
def run(plane8, vys, vxs, *, mode):
    def body(carry, xs):
        vy, vx = xs
        pl16 = jnp.pad(carry.astype(jnp.int16), PAD, mode="edge")
        by = r + vy - 4 + PAD
        bx = c + vx - 4 + PAD
        if mode == "pallas":
            win = gather_windows_grid(pl16, by, bx, nby=nby, nbx=nbx, G=G,
                                      S_row=S, lo=lo, band_h=band_h)
            win = win.transpose(1, 2, 0)
        else:
            win = jax.vmap(
                lambda yy, xx: jax.lax.dynamic_slice(pl16, (yy, xx), (G, G)),
                out_axes=2)(by, bx)
        s = win.astype(I32).sum(axis=(0, 1))
        return carry + jnp.uint8(1), s

    _, out = jax.lax.scan(body, plane8, (vys, vxs))
    return out


for mode in ("pallas", "xla"):
    fn = functools.partial(run, mode=mode)
    a = fn(plane8, vys, vxs)
    a.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(plane8, vys, vxs).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{mode:8s} {min(ts)/K*1e3:8.3f} ms/f", flush=True)
