"""Sequence orchestration: GOP assembly, reference management, loop filter,
AU emission — the host-side role of the reference's engine loop
(hmr_encoder_lib.c:3132-3412) and frame ingestion (:262-431).

v1 structure: IDR + IPPP (gop_size 1), one reference frame, fixed QP.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import tables
from ..entropy import headers
from ..ops import deblock
from ..ops.inter_golden import inter_bs_maps
from . import assemble, intra_golden, p_golden


@dataclass
class SequenceResult:
    stream: bytes
    recons: list              # deblocked (y, u, v) per frame (decoder output)
    per_frame_bytes: list


def _deblock_intra(recon, qp, h, w, tu_size, enabled):
    if not enabled:
        return tuple(p.astype(np.uint8) for p in recon)
    bs_v, bs_h = deblock.intra_edge_maps(h, w, tu_size)
    qp_map = np.full((h // 4, w // 4), qp, np.int32)
    fy, fu, fv = deblock.deblock_frame(
        *(p.astype(np.int32) for p in recon),
        bs_v=bs_v, bs_h=bs_h, qp_map=qp_map)
    return (fy.astype(np.uint8), fu.astype(np.uint8), fv.astype(np.uint8))


def _deblock_inter(recon, qp, h, w, tu_size, fld, cbf_y_unit, enabled):
    if not enabled:
        return tuple(p.astype(np.uint8) for p in recon)
    uh, uw = h // 4, w // 4
    step = tu_size // 4
    tu_left = np.zeros((uh, uw), bool)
    tu_left[:, step::step] = True
    tu_top = np.zeros((uh, uw), bool)
    tu_top[step::step, :] = True
    bs_v, bs_h = inter_bs_maps(fld, tu_left, tu_top, tu_left, tu_top,
                               cbf_y_unit)
    qp_map = np.full((uh, uw), qp, np.int32)
    fy, fu, fv = deblock.deblock_frame(
        *(p.astype(np.int32) for p in recon),
        bs_v=bs_v, bs_h=bs_h, qp_map=qp_map)
    return (fy.astype(np.uint8), fu.astype(np.uint8), fv.astype(np.uint8))


def encode_ippp(frames, *, qp: int, ctu_log2: int = 5, width=None, height=None,
                deblocking: bool = True, search: int = 16,
                me_precision: int = 2, max_merge_cand: int = 5,
                intra_period: int = 0, sign_hiding: bool = False,
                wpp: bool = False, sao: bool = False,
                intra_split_rdo: bool = False,
                backend: str = "golden") -> SequenceResult:
    """Encode frames as IDR + P, P, ... (intra_period 0 = first frame only).

    `frames`: iterable of (y, u, v) uint8 planes, dims multiple of CTU size.
    backend: "golden" (sequential numpy oracle) or "jax" (batched device
    pipelines; bit-identical output).
    """
    if backend not in ("golden", "jax"):
        raise ValueError(f"unknown backend {backend!r}; use 'golden' or 'jax'")
    size = 1 << ctu_log2
    stream = bytearray()
    recons = []
    per_frame = []
    params = None
    ref = None
    last_idr = 0

    for poc, (y, u, v) in enumerate(frames):
        h, w = y.shape
        if params is None:
            params = headers.StreamParams(
                width=w, height=h, ctu_log2=ctu_log2,
                min_cu_log2=3 if intra_split_rdo else ctu_log2,
                max_tu_log2=min(5, ctu_log2), max_tr_depth_intra=0,
                max_tr_depth_inter=0, init_qp=qp, sign_hiding=sign_hiding,
                deblocking_disabled=not deblocking, num_ref_frames=1,
                wpp_enabled=wpp, sao_enabled=sao)
        is_idr = poc == 0 or (intra_period > 0 and poc % intra_period == 0)
        if backend == "jax":
            import jax.numpy as jnp

            from ..entropy import native_backend
            from ..ops.inter_golden import derive_block_decisions_fast
            from . import intra_jax, p_jax

            if is_idr:
                last_idr = poc
                out = intra_jax.encode_frame_intra(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    B=size, qp=qp, sign_hiding=sign_hiding,
                    split_rdo=intra_split_rdo)
                maps = native_backend.maps_from_intra_units(
                    out["mode_units"], out["depth_units"], out["lev_y"],
                    out["lev_u"], out["lev_v"],
                    part_units=(out.get("part_units")
                                if intra_split_rdo else None))
                if deblocking:
                    ref_dev = p_jax.deblock_intra_device(
                        out["recon_y"], out["recon_u"], out["recon_v"],
                        B=size, qp=qp, depth_units=out["depth_units"])
                else:
                    ref_dev = (out["recon_y"], out["recon_u"], out["recon_v"])
                sao_info = None
                if sao:
                    from ..ops.sao import sao_stage
                    qp_c = int(tables.chroma_qp_from_luma(qp))
                    sao_info, filt = sao_stage((y, u, v), ref_dev, size, qp,
                                               qp_c)
                    ref_dev = tuple(jnp.asarray(p) for p in filt)
                au = assemble.assemble_idr_au_from_maps(
                    params, maps, slice_qp=qp,
                    include_parameter_sets=(poc == 0), sao_info=sao_info)
            else:
                out = p_jax.p_frame_device(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    *ref_dev, B=size, qp=qp, search=search,
                    me_precision=me_precision, deblock=deblocking,
                    sign_hiding=sign_hiding)
                mvs = np.asarray(out["mvs"])
                lev_y = np.asarray(out["lev_y"])
                lev_u = np.asarray(out["lev_u"])
                lev_v = np.asarray(out["lev_v"])
                has_resid = (np.any(lev_y, axis=(-1, -2))
                             | np.any(lev_u, axis=(-1, -2))
                             | np.any(lev_v, axis=(-1, -2)))
                dec, _ = derive_block_decisions_fast(mvs, has_resid, size,
                                                     max_merge_cand)
                maps = native_backend.maps_from_p_arrays(
                    mvs, dec, lev_y, lev_u, lev_v, size)
                if deblocking:
                    ref_dev = (out["ref_y"], out["ref_u"], out["ref_v"])
                else:
                    ref_dev = (out["recon_y"], out["recon_u"], out["recon_v"])
                sao_info = None
                if sao:
                    from ..ops.sao import sao_stage
                    qp_c = int(tables.chroma_qp_from_luma(qp))
                    sao_info, filt = sao_stage((y, u, v), ref_dev, size, qp,
                                               qp_c)
                    ref_dev = tuple(jnp.asarray(p) for p in filt)
                au = assemble.assemble_p_au_from_maps(
                    params, maps, poc=poc - last_idr, slice_qp=qp,
                    max_merge_cand=max_merge_cand, sao_info=sao_info)
            ref = tuple(np.asarray(p) for p in ref_dev)
        elif is_idr:
            last_idr = poc
            plan = intra_golden.encode_intra_frame(y, u, v, qp=qp,
                                                   ctu_log2=ctu_log2,
                                                   sign_hiding=sign_hiding)
            ref = _deblock_intra(plan.recon, qp, h, w, min(size, 32),
                                 deblocking)
            sao_info = None
            if sao:
                from ..ops.sao import sao_stage
                qp_c = int(tables.chroma_qp_from_luma(qp))
                sao_info, ref = sao_stage((y, u, v), ref, size, qp, qp_c)
            au = assemble.assemble_idr_au(params, plan.ctu_plans, slice_qp=qp,
                                          include_parameter_sets=(poc == 0),
                                          sao_info=sao_info)
        else:
            pplan = p_golden.encode_p_frame(
                y, u, v, ref, qp=qp, ctu_log2=ctu_log2, search=search,
                me_precision=me_precision, max_merge_cand=max_merge_cand,
                sign_hiding=sign_hiding)
            ref = _deblock_inter(pplan.recon, qp, h, w, min(size, 32),
                                 pplan.field, pplan.cbf_y_unit, deblocking)
            sao_info = None
            if sao:
                from ..ops.sao import sao_stage
                qp_c = int(tables.chroma_qp_from_luma(qp))
                sao_info, ref = sao_stage((y, u, v), ref, size, qp, qp_c)
            au = assemble.assemble_p_au(params, pplan.ctu_plans,
                                        poc=poc - last_idr, slice_qp=qp,
                                        max_merge_cand=max_merge_cand,
                                        sao_info=sao_info)
        stream += au
        per_frame.append(len(au))
        recons.append(ref)

    return SequenceResult(bytes(stream), recons, per_frame)


def encode_ibp(frames, *, qp: int, ctu_log2: int = 5, deblocking: bool = True,
               search: int = 16, me_precision: int = 2,
               max_merge_cand: int = 5,
               sign_hiding: bool = False,
               backend: str = "golden") -> SequenceResult:
    """IBP GOP (gop_size 2, one B between anchors) — the reference's default
    structure (hmr_encoder_lib.c:782-821 decode-order GOP tables).

    Decode order: I0, P2, B1, P4, B3, ... Stream AUs are emitted in decode
    order; `recons` stays in display order (what the decoder outputs).
    """
    from ..ops.inter_b import inter_bs_maps_b
    from . import b_golden

    def _plan_p(yy, uu, vv, ref):
        if backend == "jax":
            import jax.numpy as jnp
            from . import p_jax
            out = p_jax.p_frame_device(
                jnp.asarray(yy), jnp.asarray(uu), jnp.asarray(vv),
                jnp.asarray(ref[0]), jnp.asarray(ref[1]),
                jnp.asarray(ref[2]), B=1 << ctu_log2, qp=qp, search=search,
                me_precision=me_precision, deblock=False,
                sign_hiding=sign_hiding)
            return p_golden.build_p_plans(
                np.asarray(out["mvs"]), np.asarray(out["lev_y"]),
                np.asarray(out["lev_u"]), np.asarray(out["lev_v"]),
                tuple(np.asarray(out[k]) for k in ("recon_y", "recon_u",
                                                   "recon_v")),
                size=1 << ctu_log2, max_merge_cand=max_merge_cand)
        return p_golden.encode_p_frame(
            yy, uu, vv, ref, qp=qp, ctu_log2=ctu_log2, search=search,
            me_precision=me_precision, max_merge_cand=max_merge_cand,
            sign_hiding=sign_hiding)

    def _plan_b(yy, uu, vv, ref0, ref1, poc, poc_refs):
        if backend == "jax":
            import jax.numpy as jnp
            from . import b_jax
            out = b_jax.b_frame_device(
                jnp.asarray(yy), jnp.asarray(uu), jnp.asarray(vv),
                jnp.asarray(ref0[0]), jnp.asarray(ref0[1]),
                jnp.asarray(ref0[2]), jnp.asarray(ref1[0]),
                jnp.asarray(ref1[1]), jnp.asarray(ref1[2]),
                B=1 << ctu_log2, qp=qp, search=search,
                me_precision=me_precision, sign_hiding=sign_hiding)
            nby, nbx = np.asarray(out["idc"]).shape
            recy = (np.asarray(out["rec_y"]).transpose(0, 2, 1, 3)
                    .reshape(h, w).astype(np.uint8))
            recu = (np.asarray(out["rec_u"]).transpose(0, 2, 1, 3)
                    .reshape(h // 2, w // 2).astype(np.uint8))
            recv = (np.asarray(out["rec_v"]).transpose(0, 2, 1, 3)
                    .reshape(h // 2, w // 2).astype(np.uint8))
            return b_golden.build_b_plans(
                np.asarray(out["idc"]), np.asarray(out["mv0"]),
                np.asarray(out["mv1"]), np.asarray(out["lev_y"]),
                np.asarray(out["lev_u"]), np.asarray(out["lev_v"]),
                (recy, recu, recv), size=1 << ctu_log2, poc=poc,
                poc_refs=poc_refs, max_merge_cand=max_merge_cand)
        return b_golden.encode_b_frame(
            yy, uu, vv, ref0, ref1, qp=qp, ctu_log2=ctu_log2, search=search,
            me_precision=me_precision, max_merge_cand=max_merge_cand,
            sign_hiding=sign_hiding, poc=poc, poc_refs=poc_refs)

    frames = list(frames)
    n = len(frames)
    size = 1 << ctu_log2
    h, w = frames[0][0].shape
    params = headers.StreamParams(
        width=w, height=h, ctu_log2=ctu_log2, min_cu_log2=ctu_log2,
        max_tu_log2=min(5, ctu_log2), max_tr_depth_intra=0,
        max_tr_depth_inter=0, init_qp=qp, sign_hiding=sign_hiding,
        deblocking_disabled=not deblocking, num_ref_frames=2,
        num_reorder_pics=1,
        rps_list=(headers.StRefPicSet(delta_pocs=(2,), used=(True,)),
                  headers.StRefPicSet(delta_pocs=(1,), used=(True,),
                                      pos_delta_pocs=(1,), pos_used=(True,)),
                  # trailing P (odd-length sequence): prev anchor only
                  headers.StRefPicSet(delta_pocs=(1,), used=(True,))))

    stream = bytearray()
    recons = [None] * n
    per_frame = [0] * n

    def deblock_b(plan, poc):
        if not deblocking:
            return tuple(p.astype(np.uint8) for p in plan.recon)
        bs_v, bs_h = inter_bs_maps_b(plan.field, min(size, 32),
                                     plan.cbf_y_unit)
        qp_map = np.full((h // 4, w // 4), qp, np.int32)
        fy, fu, fv = deblock.deblock_frame(
            *(p.astype(np.int32) for p in plan.recon),
            bs_v=bs_v, bs_h=bs_h, qp_map=qp_map)
        return tuple(p.astype(np.uint8) for p in (fy, fu, fv))

    # anchor 0: IDR
    plan = intra_golden.encode_intra_frame(*frames[0], qp=qp,
                                           ctu_log2=ctu_log2,
                                           sign_hiding=sign_hiding)
    au = assemble.assemble_idr_au(params, plan.ctu_plans, slice_qp=qp)
    stream += au
    per_frame[0] = len(au)
    prev_anchor = _deblock_intra(plan.recon, qp, h, w, min(size, 32),
                                 deblocking)
    recons[0] = prev_anchor
    prev_poc = 0

    t = 1
    while t < n:
        if t + 1 < n:
            # next anchor P at t+1 (decode-order first)
            pplan = _plan_p(*frames[t + 1], prev_anchor)
            au = assemble.assemble_p_au(params, pplan.ctu_plans, poc=t + 1,
                                        slice_qp=qp,
                                        max_merge_cand=max_merge_cand,
                                        rps_idx=0)
            stream += au
            per_frame[t + 1] = len(au)
            new_anchor = _deblock_inter(pplan.recon, qp, h, w, min(size, 32),
                                        pplan.field, pplan.cbf_y_unit,
                                        deblocking)
            recons[t + 1] = new_anchor
            # B between the anchors
            bplan = _plan_b(*frames[t], prev_anchor, new_anchor, t,
                            (t - 1, t + 1))
            au = assemble.assemble_p_au(params, bplan.ctu_plans, poc=t,
                                        slice_qp=qp,
                                        max_merge_cand=max_merge_cand,
                                        slice_type=headers.SLICE_B,
                                        rps_idx=1)
            stream += au
            per_frame[t] = len(au)
            recons[t] = deblock_b(bplan, t)
            prev_anchor = new_anchor
            prev_poc = t + 1
            t += 2
        else:
            # trailing frame: plain P referencing the previous anchor
            pplan = _plan_p(*frames[t], prev_anchor)
            au = assemble.assemble_p_au(params, pplan.ctu_plans, poc=t,
                                        slice_qp=qp,
                                        max_merge_cand=max_merge_cand,
                                        rps_idx=2)
            stream += au
            per_frame[t] = len(au)
            recons[t] = _deblock_inter(pplan.recon, qp, h, w, min(size, 32),
                                       pplan.field, pplan.cbf_y_unit,
                                       deblocking)
            t += 1

    return SequenceResult(bytes(stream), recons, per_frame)
