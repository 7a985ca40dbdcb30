"""Benchmark per-block dynamic window gather formulations on TPU.

Task: from an int16 padded plane (864+2P, 1408+2P), gather nb per-block
windows of (S+9, S+9) at block-grid base + per-block (vy, vx) in
[-64, 64], into (S+9, S+9, nb). Variants:
  a) vmap(dynamic_slice)          — current; lowers to a device while loop
  b) flat 1D take                 — plane.ravel()[flat_idx]
  c) 2D advanced indexing         — plane[Y, X]
  d) two-stage one-hot shift      — coarse roll-select + fine shift-select
Each runs inside a lax.scan over 8 dummy frames to amortize dispatch.
"""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
PAD = 80
H, W, K = 736, 1280, 8
Hp, Wp = H + 2 * PAD, W + 2 * PAD
rng = np.random.default_rng(0)
plane = jnp.asarray(rng.integers(0, 255, (Hp, Wp), np.int16))


def mk_mv(nb):
    return (jnp.asarray(rng.integers(-64, 65, (K, nb), np.int32)),
            jnp.asarray(rng.integers(-64, 65, (K, nb), np.int32)))


@functools.partial(jax.jit, static_argnames=("S", "variant"))
def run(plane, vys, vxs, *, S, variant):
    nby, nbx = H // S, W // S
    nb = nby * nbx
    G = S + 9
    r = (jnp.arange(nb, dtype=I32) // nbx) * S
    c = (jnp.arange(nb, dtype=I32) % nbx) * S

    def body(carry, xs):
        vy, vx = xs
        by = r + vy - 4 + PAD
        bx = c + vx - 4 + PAD
        if variant == "a":
            win = jax.vmap(
                lambda yy, xx: jax.lax.dynamic_slice(plane, (yy, xx), (G, G)),
                out_axes=2)(by, bx)
        elif variant == "b":
            ii = jnp.arange(G, dtype=I32)
            Y = by[:, None] + ii[None]                    # (nb, G)
            X = bx[:, None] + ii[None]
            flat = (Y[:, :, None] * Wp + X[:, None, :]).reshape(-1)
            win = jnp.take(plane.reshape(-1), flat).reshape(nb, G, G)
            win = win.transpose(1, 2, 0)
        elif variant == "c":
            ii = jnp.arange(G, dtype=I32)
            Y = by[:, None] + ii[None]
            X = bx[:, None] + ii[None]
            win = plane[Y[:, :, None], X[:, None, :]].transpose(1, 2, 0)
        elif variant == "d":
            # coarse: vy = 16*hi + lo, hi in [-4..4] (9), lo in [0..15]
            # stage 1: 9x9 coarse one-hot over rolled planes, windows via
            # static reshape; stage 2: 16x16 fine shift select in-window.
            GE = S + 9 + 16                               # room for fine lo
            hy = (vy - 4 + 64) // 16 - 4                  # [-4..4]
            ly = (vy - 4 + 64) % 16
            hx = (vx - 4 + 64) // 16 - 4
            lx = (vx - 4 + 64) % 16
            acc = jnp.zeros((GE, GE, nb), jnp.int16)
            for oy in range(-4, 5):
                rows = jax.lax.dynamic_slice(
                    plane, (PAD + 16 * oy, 0), (H + GE - 16, Wp))
                my = (hy == oy)
                for ox in range(-4, 5):
                    sub = jax.lax.dynamic_slice(
                        rows, (0, PAD + 16 * ox), (H + GE - 16, W + GE - 16))
                    # static per-block windows: block (i,j) base = (iS, jS)
                    # slice iS..iS+GE — overlapping windows: build via
                    # strided reshape trick is impossible for overlap; use
                    # conv-style unfold: gather GE rows per block-row
                    # (static slices, python loop over block rows is OK at
                    # trace time but big; instead slice per (dy block)):
                    w4 = jnp.stack([
                        jax.lax.dynamic_slice(sub, (i * S, 0),
                                              (GE, W + GE - 16))
                        for i in range(nby)])             # (nby, GE, W+GE-16)
                    w5 = jnp.stack([
                        jax.lax.dynamic_slice(w4, (0, 0, j * S),
                                              (nby, GE, GE))
                        for j in range(nbx)])             # (nbx, nby, GE, GE)
                    wb = w5.transpose(2, 3, 1, 0).reshape(GE, GE, nb)
                    m = (my & (hx == ox)).astype(jnp.int16)
                    acc = acc + wb * m[None, None, :]
            # fine: select (ly, lx) shift within GE -> G
            out = jnp.zeros((G, G, nb), jnp.int16)
            for sy in range(16):
                rowsel = acc[sy:sy + G]
                msy = (ly == sy)
                for sx in range(16):
                    m = (msy & (lx == sx)).astype(jnp.int16)
                    out = out + rowsel[:, sx:sx + G, :] * m[None, None, :]
            win = out
        else:
            raise ValueError(variant)
        return carry, win.astype(jnp.int32).sum(axis=(0, 1))

    _, out = jax.lax.scan(body, 0, (vys, vxs))
    return out


for S in (16, 32):
    nby, nbx = H // S, W // S
    vys, vxs = mk_mv(nby * nbx)
    for variant in ("a", "b", "c"):
        fn = functools.partial(run, S=S, variant=variant)
        out = fn(plane, vys, vxs)
        out.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(plane, vys, vxs).block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"S={S} {variant} {min(ts)/K*1e3:7.2f} ms/f", flush=True)
