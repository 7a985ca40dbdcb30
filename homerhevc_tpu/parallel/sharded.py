"""Multi-chip sharding of the encoder over a jax.sharding.Mesh.

Two first-class axes (SURVEY.md §2 "parallelism mapping"):
  * 'gop'  — frame/GOP parallelism: independent sequences per mesh group,
             the TPU form of the reference's `num_enc_engines` engine
             threads (hmr_encoder_lib.c:3132).
  * 'band' — CTU-row band sharding WITHIN a frame for the P stage: each
             device computes its horizontal band; the reference-frame halo
             (ME search range + filter support = PAD rows) moves between
             neighbor devices via ppermute over ICI — the TPU form of the
             reference's WPP row threads + ref-progress semaphores
             (hmr_encoder_lib.c:2849-2987, :2393-2403).

Band outputs are bit-identical to the single-device pipeline (the halo
carries exactly the rows the global computation would read; picture-edge
bands replicate their own border rows like the global pad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..pipeline.p_jax import PAD, _p_stage

I32 = jnp.int32


def _halo_extend(loc, pad, axis_name, nb):
    """Extend a local band with `pad` rows from the neighbor above/below
    (edge-replicate at picture boundaries)."""
    idx = jax.lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(nb - 1)]
    up = [(i + 1, i) for i in range(nb - 1)]
    top_halo = jax.lax.ppermute(loc[-pad:], axis_name, down)
    bot_halo = jax.lax.ppermute(loc[:pad], axis_name, up)
    top_edge = jnp.repeat(loc[:1], pad, axis=0)
    bot_edge = jnp.repeat(loc[-1:], pad, axis=0)
    top_halo = jnp.where(idx == 0, top_edge, top_halo)
    bot_halo = jnp.where(idx == nb - 1, bot_edge, bot_halo)
    return jnp.concatenate([top_halo, loc, bot_halo], axis=0)


def make_p_frame_sharded(mesh: Mesh, *, B: int, search: int,
                         me_precision: int, sign_hiding: bool = False):
    """Build the jitted band+gop-sharded P stage for a ('gop', 'band') mesh.

    Inputs are (G, H, W) uint8 batches sharded P('gop', 'band') on (G, H);
    outputs carry the same sharding with block rows on the band axis.
    """
    nb = mesh.shape["band"]

    def band_fn(y, u, v, ry, ru, rv, qp):
        # shapes inside shard_map: (1, H/nb, W) etc.; qp replicated scalar
        # Halo = the rows the ME/MC window can actually read (search +
        # 8-tap support), then edge-padded up to the global PAD so the
        # in-band indexing matches the single-device layout; the outer
        # (PAD - halo) ring is never read.
        halo = min(PAD, ((search + 8 + 3) // 4) * 4)
        assert y.shape[1] >= halo, \
            f"band height {y.shape[1]} < halo {halo}; use fewer bands"
        y, u, v = y[0], u[0], v[0]
        ry, ru, rv = ry[0], ru[0], rv[0]
        ry_e = _halo_extend(ry.astype(jnp.int16), halo, "band", nb)
        ru_e = _halo_extend(ru.astype(jnp.int16), halo // 2, "band", nb)
        rv_e = _halo_extend(rv.astype(jnp.int16), halo // 2, "band", nb)
        e, e2 = PAD - halo, (PAD - halo) // 2
        ry_p = jnp.pad(ry_e, ((e, e), (PAD, PAD)), mode="edge")
        ru_p = jnp.pad(ru_e, ((e2, e2), (PAD // 2, PAD // 2)), mode="edge")
        rv_p = jnp.pad(rv_e, ((e2, e2), (PAD // 2, PAD // 2)), mode="edge")
        out = _p_stage(y, u, v, ry_p, ru_p, rv_p, B=B, qp=qp[0],
                       search=search, me_precision=me_precision,
                       sign_hiding=sign_hiding)
        return tuple(o[None] for o in (
            out["mvs"], out["lev_y"], out["lev_u"], out["lev_v"],
            out["recon_y"], out["recon_u"], out["recon_v"]))

    gb = P("gop", "band")
    specs_in = (gb, gb, gb, gb, gb, gb, P("gop"))
    specs_out = (gb,) * 7
    fn = jax.shard_map(band_fn, mesh=mesh, in_specs=specs_in,
                       out_specs=specs_out, check_vma=False)
    return jax.jit(fn)


def dryrun(mesh: Mesh, *, B: int = 16, frames_hw=(128, 64), search: int = 8):
    """One sharded P step on tiny shapes + bit-exactness check vs the
    single-device pipeline (the driver's multichip validation)."""
    from ..pipeline.p_jax import p_frame_device
    from ..utils.synth import synth_clip

    G = mesh.shape["gop"]
    h, w = frames_hw
    fs = [list(synth_clip(w, h, 2, seed=g)) for g in range(G)]
    refs = [np.stack([fs[g][0][i] for g in range(G)]) for i in range(3)]
    curs = [np.stack([fs[g][1][i] for g in range(G)]) for i in range(3)]

    gb = NamedSharding(mesh, P("gop", "band"))
    gs = NamedSharding(mesh, P("gop"))
    args = [jax.device_put(jnp.asarray(a), gb) for a in curs + refs]
    qp = jax.device_put(jnp.full((G,), 32, I32), gs)

    step = make_p_frame_sharded(mesh, B=B, search=search, me_precision=2)
    mvs, ly, lu, lv, ry, ru, rv = step(*args, qp)
    jax.block_until_ready(mvs)

    # bit-exactness vs single device on gop lane 0
    single = p_frame_device(
        jnp.asarray(curs[0][0]), jnp.asarray(curs[1][0]),
        jnp.asarray(curs[2][0]), jnp.asarray(refs[0][0]),
        jnp.asarray(refs[1][0]), jnp.asarray(refs[2][0]),
        B=B, qp=32, search=search, me_precision=2)
    assert np.array_equal(np.asarray(mvs[0]), np.asarray(single["mvs"])), \
        "sharded MVs diverge from single-device"
    assert np.array_equal(np.asarray(ly[0]), np.asarray(single["lev_y"])), \
        "sharded levels diverge from single-device"
    assert np.array_equal(np.asarray(ry[0]), np.asarray(single["recon_y"]))
    return True
