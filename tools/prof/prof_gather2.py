"""Find what makes the pipeline's window gather lower to a while loop:
vary (pad-inside-body, plane-as-carry, index source) and time each."""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
PAD = 80
H, W, K, S = 736, 1280, 8, 16
G = S + 9
rng = np.random.default_rng(0)
nby, nbx = H // S, W // S
nb = nby * nbx
plane8 = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))
vys = jnp.asarray(rng.integers(-64, 65, (K, nb), np.int32))
vxs = jnp.asarray(rng.integers(-64, 65, (K, nb), np.int32))
r = (jnp.arange(nb, dtype=I32) // nbx) * S
c = (jnp.arange(nb, dtype=I32) % nbx) * S


def gather(plane, vy, vx, out_axes):
    by = r + vy - 4 + PAD
    bx = c + vx - 4 + PAD
    return jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(plane, (yy, xx), (G, G)),
        out_axes=out_axes)(by, bx)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(plane8, vys, vxs, *, mode):
    def body(carry, xs):
        vy, vx = xs
        if mode == "inv":                  # loop-invariant, prepadded
            plane = jnp.pad(plane8.astype(jnp.int16), PAD, mode="edge")
            win = gather(plane, vy, vx, 2)
        elif mode == "carry-pad":          # carried uint8, pad in body
            plane = jnp.pad(carry.astype(jnp.int16), PAD, mode="edge")
            win = gather(plane, vy, vx, 2)
        elif mode == "carry-pad0":         # pad in body, axis0 out
            plane = jnp.pad(carry.astype(jnp.int16), PAD, mode="edge")
            win = gather(plane, vy, vx, 0).transpose(1, 2, 0)
        elif mode == "carry-opt":          # pad via optimization barrier
            plane = jnp.pad(carry.astype(jnp.int16), PAD, mode="edge")
            plane = jax.lax.optimization_barrier(plane)
            win = gather(plane, vy, vx, 2)
        elif mode == "carry-flat":         # flat 1D take from padded
            plane = jnp.pad(carry.astype(jnp.int16), PAD, mode="edge")
            Wp = W + 2 * PAD
            by = r + vy - 4 + PAD
            bx = c + vx - 4 + PAD
            ii = jnp.arange(G, dtype=I32)
            flat = ((by[:, None] + ii[None])[:, :, None] * Wp
                    + (bx[:, None] + ii[None])[:, None, :]).reshape(-1)
            win = jnp.take(plane.reshape(-1), flat).reshape(nb, G, G)
            win = win.transpose(1, 2, 0)
        else:
            raise ValueError(mode)
        s = win.astype(I32).sum(axis=(0, 1)) if win.shape[-1] == nb \
            else win.astype(I32).sum(axis=(1, 2))
        new = carry + jnp.uint8(1)
        return new, s

    _, out = jax.lax.scan(body, plane8, (vys, vxs))
    return out


for mode in ("inv", "carry-pad", "carry-pad0", "carry-opt", "carry-flat"):
    fn = functools.partial(run, mode=mode)
    fn(plane8, vys, vxs).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(plane8, vys, vxs).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{mode:12s} {min(ts)/K*1e3:8.3f} ms/f", flush=True)
