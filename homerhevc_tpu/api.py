"""Public encoder API — the framework's equivalent of the reference's
6-function C API (homer_hevc_enc_api.h:169-174: HOMER_enc_init /
enc_control / enc_encode / enc_get_coded_frame / enc_write_annex_b_output /
enc_close), re-shaped as a streaming Python session.

    enc = HomerEncoder(EncoderConfig(width=1280, height=720, qp=32))
    for y, u, v in frames:
        au = enc.encode_frame(y, u, v)     # Annex-B bytes for one AU
        recon = enc.last_recon             # decoder-identical output frame
    enc.close()

Arbitrary even frame sizes are supported: planes are padded to the CTU grid
internally and the SPS conformance window crops on the decoder side (same
mechanism as the reference's pict conformance handling).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .config import (BitrateMode, EncoderConfig, MEPrecision,
                     PerformanceMode)
from .entropy import headers
from .pipeline import assemble


SCENE_SAD_PER_PIXEL = 25.0     # mean best-ME-cost per pixel => scene cut


def _pad_to(a: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - a.shape[0], w - a.shape[1]
    if ph == 0 and pw == 0:
        return a
    return np.pad(a, ((0, ph), (0, pw)), mode="edge")



def _tree_decisions(depth_u, mv_u, nz_u, ctu_log2: int, n_cand: int = 5,
                    pred_intra_u=None):
    """Merge/skip/AMVP decision walk: native C++ when available, Python
    golden twin otherwise (bit-identical; tests/test_native_entropy.py)."""
    from .entropy import native_backend
    dec = native_backend.derive_tree_decisions_native(
        depth_u, mv_u, nz_u, ctu_log2, n_cand, pred_intra_u=pred_intra_u)
    if dec is None:
        from .ops.inter_golden import derive_tree_decisions
        dec, _ = derive_tree_decisions(depth_u, mv_u, nz_u, ctu_log2, n_cand,
                                       pred_intra_u=pred_intra_u)
    return dec

class HomerEncoder:
    """Streaming HEVC encoder session (IDR + P low-delay structure)."""

    def __init__(self, cfg: EncoderConfig, *, backend: str = "jax",
                 profiler=None, fetch_recon: bool = True, mesh=None):
        if backend not in ("golden", "jax"):
            raise ValueError(f"unknown backend {backend!r}")
        from .utils.profiler import NULL
        self.prof = profiler if profiler is not None else NULL
        self.fetch_recon = fetch_recon
        self.cfg = cfg.validate()
        self.backend = backend
        c = self.cfg
        # Multi-chip: a jax Mesh with a 'band' axis row-shards every frame
        # plane (jax.sharding.NamedSharding); the SAME pipeline jits then
        # compile as SPMD partitioned programs (XLA inserts the ME-halo /
        # deblock / SAO collectives automatically), so the stream is
        # byte-identical to the single-device encoder by construction.
        # cfg.wpp_shards > 1 builds a default mesh over the visible devices.
        self._mesh = mesh
        if mesh is None and c.wpp_shards > 1 and backend == "jax":
            import jax
            from jax.sharding import Mesh
            devs = jax.devices()[:c.wpp_shards]
            if len(devs) == c.wpp_shards:
                self._mesh = Mesh(np.array(devs), ("band",))
        self._shard = None
        if self._mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            def _put(a):
                import jax
                return jax.device_put(
                    a, NamedSharding(self._mesh, P("band")))

            self._shard = _put
        self.ctu_log2 = c.ctu_size.bit_length() - 1
        # intra always codes at 32 max (HEVC intra prediction cap); a 64 CTU
        # holds a forced quadtree level (decoder z-order handled on device).
        self.intra_b = min(c.ctu_size, 32)
        self.ctu64 = c.ctu_size == 64
        self.intra_split = (c.performance_mode
                            != PerformanceMode.FASTEST_COMPUTATION)
        # FULL/FAST: P frames RD-search the inter CU quadtree (CTU..16);
        # FASTER/FASTEST: fixed CU = CTU grid (the Pallas fast path).
        self.inter_split = (c.performance_mode
                            <= PerformanceMode.FAST_COMPUTATION)
        # FULL only: the quadtree descends one level further to 8x8 inter
        # CUs — four independent MVs per 16x16, the spec-legal carrier of
        # the reference's PART_NxN inter role (with min_cu 8 in the SPS,
        # 7.4.9.5 forbids inter NxN itself); hmr_motion_inter.c:2507.
        self.inter_cu8 = (c.performance_mode
                          == PerformanceMode.FULL_COMPUTATION)
        if self.ctu64 and backend != "jax":
            raise ValueError("cu_size=64 requires the jax backend "
                             "(z-order intra availability)")
        self.pw = c.padded_width
        self.ph = c.padded_height
        self.params = headers.StreamParams(
            width=c.width, height=c.height,
            pad_right=self.pw - c.width, pad_bottom=self.ph - c.height,
            ctu_log2=self.ctu_log2,
            min_cu_log2=(3 if self.intra_split
                         else self.intra_b.bit_length() - 1),
            max_tu_log2=min(5, self.ctu_log2),
            # intra residual quadtree: one split level RD-searched by the
            # two-pass pipeline (reference: hmr_motion_intra.c:1229-1632)
            max_tr_depth_intra=(1 if (self.intra_split
                                      and c.max_intra_tr_depth >= 1)
                                else 0),
            max_tr_depth_inter=(1 if (self.inter_split
                                      and c.max_inter_tr_depth >= 1)
                                else 0),
            init_qp=c.qp, sign_hiding=c.sign_hiding,
            deblocking_disabled=not c.deblocking,
            num_ref_frames=(2 if c.gop_size >= 2 else 1),
            wpp_enabled=c.wpp, sao_enabled=c.sample_adaptive_offset,
            cb_qp_offset=c.chroma_qp_offset, cr_qp_offset=c.chroma_qp_offset,
            **({} if c.gop_size < 2 else dict(
                num_reorder_pics=1,
                rps_list=(headers.StRefPicSet(delta_pocs=(2,), used=(True,)),
                          headers.StRefPicSet(delta_pocs=(1,), used=(True,),
                                              pos_delta_pocs=(1,),
                                              pos_used=(True,)),
                          headers.StRefPicSet(delta_pocs=(1,),
                                              used=(True,))))))
        self.poc = 0
        self.last_idr = 0
        self._ref = None          # host planes (golden) or device (jax)
        self.last_recon = None    # cropped decoder-identical output
        self.last_qp = c.qp
        self.frame_bytes = []
        self.chunk_overflows = 0
        self._disp = 0                 # display-order index (gop_size >= 2)
        self._b_pend = None            # buffered B awaiting its anchor
        # rate control (host-side scalar state; hmr_rate_control.c role)
        self._rc = None
        if c.bitrate_mode != BitrateMode.FIXED_QP:
            from .rate_control import RateControl
            self._rc = RateControl(c)
        # per-CTU-row QP (cu_qp_delta): active whenever rate control runs
        # on the quadtree path (any CTU size, WPP or not). Row plans come
        # from the consumed-bits controller (RateControl.plan_rows):
        # previous frame's measured bits distributed per row + VBV.
        self._row_qp_on = bool(self._rc is not None and self.inter_split
                               and backend == "jax")
        self._prev_row_load = None
        self._prev_row_bits = None
        if self._row_qp_on:
            self.params = dataclasses.replace(
                self.params, cu_qp_delta_enabled=True, cu_qp_delta_depth=0)
        # background wire-fetch worker for the chunked pipeline: forcing the
        # fetch off-thread starts the (lazily executed) device program right
        # at dispatch and overlaps transfer with host CABAC.
        self._fetch_pool = None
        if backend == "jax":
            import concurrent.futures
            self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="homer-fetch")

    # ------------------------------------------------------------------
    def seed_reference(self, ref_planes, *, poc: int,
                       last_idr: int | None = None) -> None:
        """Continue a P chain started elsewhere: install reconstructed
        reference planes (padded Y/U/V uint8) + the next POC. The
        multi-host GOP pipeline uses this when a span's reference was
        produced by another process (role of the reference's cross-engine
        reconstruction-window handoff, hmr_encoder_lib.c:3179-3189).
        `last_idr` carries the IDR anchor so slice POCs and the
        intra-period cadence stay identical to a single-process encode."""
        ry, ru, rv = (np.asarray(p, np.uint8) for p in ref_planes)
        assert ry.shape == (self.ph, self.pw), "seed ref must be padded"
        assert ru.shape == rv.shape == (self.ph // 2, self.pw // 2), \
            "seed ref chroma planes must be padded to (ph/2, pw/2)"
        if self.backend == "jax":
            import jax
            self._ref = tuple(jax.device_put(p) for p in (ry, ru, rv))
        else:
            self._ref = (ry, ru, rv)
        self.poc = int(poc)
        if last_idr is not None:
            self.last_idr = int(last_idr)
        elif self.cfg.intra_period > 0:
            # without an explicit anchor, only span-aligned cadences are
            # safe — reject configs that would silently diverge
            assert self.poc % self.cfg.intra_period == 0, \
                "seed_reference needs last_idr when poc is not a multiple " \
                "of intra_period"

    # ------------------------------------------------------------------
    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     *, force_idr: bool = False) -> bytes:
        c = self.cfg
        assert y.shape == (c.height, c.width), "frame size mismatch"
        yp = _pad_to(np.asarray(y, np.uint8), self.ph, self.pw)
        up = _pad_to(np.asarray(u, np.uint8), self.ph // 2, self.pw // 2)
        vp = _pad_to(np.asarray(v, np.uint8), self.ph // 2, self.pw // 2)

        is_idr = (self.poc == 0 or force_idr
                  or (c.intra_period > 0
                      and (self.poc - self.last_idr) % c.intra_period == 0))
        qp = self._rc.frame_qp(is_idr) if self._rc else c.qp
        qp = int(np.clip(qp, 0, 51))
        self.last_qp = qp

        self._scene_idr = False
        if self.backend == "jax":
            au, recon_padded = self._encode_jax(yp, up, vp, is_idr, qp)
        else:
            au, recon_padded = self._encode_golden(yp, up, vp, is_idr, qp)
        if self._scene_idr:
            is_idr = True

        if is_idr:
            self.last_idr = self.poc
        self.poc += 1
        self.frame_bytes.append(len(au))
        if self._rc:
            self._rc.end_frame(len(au) * 8, is_idr)
        if recon_padded is None:
            self.last_recon = None
        else:
            self.last_recon = tuple(
                p[:h, :w] for p, (h, w) in zip(
                    recon_padded, ((c.height, c.width),
                                   (c.height // 2, c.width // 2),
                                   (c.height // 2, c.width // 2))))
        return au

    def _requery_idr_qp(self, qp: int) -> int:
        """Scene-cut re-encode: re-query RC at I-frame settings so the IDR
        is coded at the intended (finer) QP and the RC target bookkeeping
        reflects an I frame (reference: hmr_rc_change_pic_mode,
        hmr_rate_control.c:49-87, runs before the intra re-encode)."""
        if self._rc is None:
            return qp
        qp = int(np.clip(self._rc.frame_qp(True), 0, 51))
        self.last_qp = qp
        return qp

    # ------------------------------------------------------------------
    def _encode_jax(self, yp, up, vp, is_idr, qp):
        import jax.numpy as jnp

        from .entropy import native_backend
        from .ops.inter_golden import derive_block_decisions_fast
        from .pipeline import intra_jax, p_jax

        c = self.cfg
        size = 1 << self.ctu_log2
        deblk = c.deblocking
        with self.prof.probe("upload"):
            if self._shard is not None:
                ydev, udev, vdev = (self._shard(yp), self._shard(up),
                                    self._shard(vp))
            else:
                ydev, udev, vdev = (jnp.asarray(yp), jnp.asarray(up),
                                    jnp.asarray(vp))
        self._cur_dev = (ydev, udev, vdev)
        if is_idr:
            # row-QP history does not survive an IDR (new consumption regime)
            self._prev_row_load = None
            self._prev_row_bits = None
            ib = self.intra_b
            tu_depth = self.params.max_tr_depth_intra
            if self.ctu64:
                with self.prof.probe("intra.device"):
                    out = intra_jax.encode_frame_intra_ctu64(
                        ydev, udev, vdev, qp=qp, sign_hiding=c.sign_hiding,
                        split_rdo=self.intra_split,
                        rd_mode=int(c.rd_mode), tu_depth=tu_depth)
                depth_offset = 1        # units are relative to 32-containers
            else:
                with self.prof.probe("intra.device"):
                    out = intra_jax.encode_frame_intra(
                        ydev, udev, vdev,
                        B=ib, qp=qp, sign_hiding=c.sign_hiding,
                        split_rdo=self.intra_split,
                        rd_mode=int(c.rd_mode), tu_depth=tu_depth)
                depth_offset = 0
            with self.prof.probe("intra.fetch+maps"):
                from .pipeline import intra_jax as ij
                from .pipeline import p_chunk
                wire_h = np.asarray(out["wire"])     # ONE compact fetch
                (cnt_i, mode_u8, depth_u8, part_u8, trd_u8, idx_i,
                 vals_i) = ij.unpack_intra_wire(wire_h, self.ph, self.pw)
                cap_i = ij.intra_wire_cap(self.ph, self.pw)
                if cnt_i <= cap_i:
                    res = native_backend.scatter_levels_native(
                        idx_i, vals_i, min(cnt_i, cap_i), self.ph, self.pw)
                    if res is not None:
                        lev_yp_i, lev_up_i, lev_vp_i, _ = res
                    else:
                        lev_yp_i, lev_up_i, lev_vp_i = p_chunk.scatter_levels(
                            idx_i, vals_i, min(cnt_i, cap_i), self.ph,
                            self.pw)
                else:                      # capacity overflow: dense fetch
                    self.chunk_overflows += 1
                    lev_yp_i, lev_up_i, lev_vp_i = (
                        out["lev_y"], out["lev_u"], out["lev_v"])
                maps = native_backend.maps_from_intra_units(
                    mode_u8, depth_u8, lev_yp_i, lev_up_i, lev_vp_i,
                    depth_offset=depth_offset,
                    part_units=(part_u8.astype(bool)
                                if self.intra_split else None),
                    tr_depth_units=(trd_u8 if tu_depth else None))
            if deblk:
                self._ref = p_jax.deblock_intra_device(
                    out["recon_y"], out["recon_u"], out["recon_v"],
                    B=ib, qp=qp, depth_units=out["depth_units"],
                    trd_units=(out.get("trd_units") if tu_depth else None))
            else:
                self._ref = (out["recon_y"], out["recon_u"], out["recon_v"])
            with self.prof.probe("sao"):
                sao_info = self._maybe_sao(yp, up, vp, qp)
            with self.prof.probe("entropy"):
                # VPS/SPS/PPS re-emitted on EVERY IDR for mid-stream random
                # access (reference: hmr_encoder_lib.c:3287-3306).
                au = assemble.assemble_idr_au_from_maps(
                    self.params, maps, slice_qp=qp,
                    include_parameter_sets=True, sao_info=sao_info)
        elif self.inter_split:
            au = self._encode_p_tree(yp, up, vp, qp)
            if au is None:       # scene cut: re-encode as IDR at I-frame QP
                qp = self._requery_idr_qp(qp)
                return self._encode_jax(yp, up, vp, True, qp)
        else:
            with self.prof.probe("p.device"):
                out = p_jax.p_frame_device(
                    ydev, udev, vdev,
                    *self._ref, B=size, qp=qp,
                    search=c.me_search_range,
                    me_precision=int(c.motion_estimation_precision),
                    deblock=deblk, sign_hiding=c.sign_hiding)
            with self.prof.probe("p.fetch"):
                nby, nbx = self.ph // size, self.pw // size
                B2 = size // 2
                ny = nby * nbx * size * size
                nc = nby * nbx * B2 * B2
                wire = np.asarray(out["wire"])       # ONE fetch RPC
                meta = np.ascontiguousarray(
                    wire[ny + 2 * nc:]).view(np.int32)
                mvs = meta[:nby * nbx * 2].reshape(nby, nbx, 2)
                sad = meta[nby * nbx * 2:].reshape(nby, nbx)
            if c.reinit_gop_on_scene_change:
                # >SCENE_SAD_PER_PIXEL mean ME cost => scene cut: re-encode
                # as IDR + GOP reinit (role of the reference's intra-ratio
                # detector, hmr_motion_inter.c:3791-3806).
                ms = float(sad.astype(np.int64).mean())
                if ms / (size * size) > SCENE_SAD_PER_PIXEL:
                    self._scene_idr = True
                    if self._rc:
                        self._rc.on_scene_change()
                    qp = self._requery_idr_qp(qp)
                    return self._encode_jax(yp, up, vp, True, qp)
            lev_y = wire[:ny].reshape(nby, nbx, size, size)
            lev_u = wire[ny:ny + nc].reshape(nby, nbx, B2, B2)
            lev_v = wire[ny + nc:ny + 2 * nc].reshape(nby, nbx, B2, B2)
            with self.prof.probe("p.decisions+maps"):
                has_resid = (np.any(lev_y, axis=(-1, -2))
                             | np.any(lev_u, axis=(-1, -2))
                             | np.any(lev_v, axis=(-1, -2)))
                dec, _ = derive_block_decisions_fast(mvs, has_resid, size, 5)
                maps = native_backend.maps_from_p_arrays(mvs, dec, lev_y,
                                                         lev_u, lev_v, size)
            key = "ref" if deblk else "recon"
            self._ref = (out[key + "_y"], out[key + "_u"], out[key + "_v"])
            with self.prof.probe("sao"):
                sao_info = self._maybe_sao(yp, up, vp, qp, slice_p=True)
            with self.prof.probe("entropy"):
                au = assemble.assemble_p_au_from_maps(
                    self.params, maps, poc=self.poc - self.last_idr,
                    slice_qp=qp, sao_info=sao_info)
        if self.fetch_recon:
            with self.prof.probe("ref.fetch"):
                recon = tuple(np.asarray(p) for p in self._ref)
        else:
            recon = None
        return au, recon

    # ------------------------------------------------------------------
    def push_frame(self, y, u, v) -> list:
        """Streaming input in DISPLAY order; returns 0+ Annex-B AUs in
        DECODE order. With gop_size >= 2 a B frame is buffered until its
        future anchor arrives (I0, P2, B1, P4, B3, ... — the reference's
        default IBP structure, hmr_encoder_lib.c:782-821); otherwise plain
        streaming IPPP (== encode_frame). A pending B whose next anchor is
        an IDR is emitted as a trailing P BEFORE the IDR (a TRAIL picture
        must not reference across an IDR)."""
        c = self.cfg
        if c.gop_size < 2 or self.backend != "jax":
            return [self.encode_frame(y, u, v)]
        d = self._disp
        self._disp += 1
        if d % 2 == 1:                       # B position: wait for anchor
            self._b_pend = (d, (y, u, v))
            return []
        out = []
        prev_ref = self._ref                 # previous anchor (device)
        is_idr = (d == 0 or (c.intra_period > 0
                             and (d - self.last_idr) % c.intra_period == 0))
        if is_idr and self._b_pend is not None:
            out.append(self._encode_p_explicit(self._b_pend, prev_ref))
            self._b_pend = None
        qp = int(np.clip(self._rc.frame_qp(is_idr) if self._rc else c.qp,
                         0, 51))
        yp = _pad_to(np.asarray(y, np.uint8), self.ph, self.pw)
        up = _pad_to(np.asarray(u, np.uint8), self.ph // 2, self.pw // 2)
        vp = _pad_to(np.asarray(v, np.uint8), self.ph // 2, self.pw // 2)
        self.poc = d
        self._scene_idr = False
        au, _ = self._encode_jax(yp, up, vp, is_idr, qp)
        if self._scene_idr:
            is_idr = True
        if is_idr:
            self.last_idr = d
        out.append(au)
        self.frame_bytes.append(len(au))
        if self._rc:
            self._rc.end_frame(len(au) * 8, is_idr)
        if self._b_pend is not None:
            pend, self._b_pend = self._b_pend, None
            if is_idr:                       # scene-cut IDR: no B across it
                # decode order requires the P before the IDR; reorder the
                # returned AUs (nothing between them has been emitted yet)
                out.insert(len(out) - 1,
                           self._encode_p_explicit(pend, prev_ref))
            else:
                out.append(self._encode_b(pend, prev_ref, self._ref))
        return out

    def flush(self) -> list:
        """Emit any buffered trailing frame (odd-length sequence: a plain P
        referencing the previous anchor, rps delta_poc = 1)."""
        if self._b_pend is None:
            return []
        pend, self._b_pend = self._b_pend, None
        return [self._encode_p_explicit(pend, self._ref)]

    def _encode_p_explicit(self, pend, ref) -> bytes:
        """P frame against EXPLICIT device reference planes (trailing /
        pre-IDR position, rps delta_poc = 1). Fixed CU grid — this is a
        rare structural frame."""
        import jax.numpy as jnp

        from .pipeline import assemble as asm
        from .pipeline import p_golden as pg
        from .pipeline import p_jax

        c = self.cfg
        d, (y, u, v) = pend
        qp = int(np.clip(self._rc.frame_qp(False) if self._rc else c.qp,
                         0, 51))
        yp = _pad_to(np.asarray(y, np.uint8), self.ph, self.pw)
        up = _pad_to(np.asarray(u, np.uint8), self.ph // 2, self.pw // 2)
        vp = _pad_to(np.asarray(v, np.uint8), self.ph // 2, self.pw // 2)
        out = p_jax.p_frame_device(
            jnp.asarray(yp), jnp.asarray(up), jnp.asarray(vp),
            ref[0], ref[1], ref[2], B=1 << self.ctu_log2, qp=qp,
            search=c.me_search_range,
            me_precision=int(c.motion_estimation_precision), deblock=False,
            sign_hiding=c.sign_hiding)
        plan = pg.build_p_plans(
            np.asarray(out["mvs"]), np.asarray(out["lev_y"]),
            np.asarray(out["lev_u"]), np.asarray(out["lev_v"]),
            tuple(np.asarray(out[k]) for k in ("recon_y", "recon_u",
                                               "recon_v")),
            size=1 << self.ctu_log2)
        au = asm.assemble_p_au(self.params, plan.ctu_plans,
                               poc=d - self.last_idr, slice_qp=qp,
                               rps_idx=2)
        self.frame_bytes.append(len(au))
        if self._rc:
            self._rc.end_frame(len(au) * 8, False)
        return au

    def _encode_b(self, pend, ref0, ref1) -> bytes:
        """One non-reference B frame between two device anchor recons."""
        import jax.numpy as jnp

        from .pipeline import assemble as asm
        from .pipeline import b_golden, b_jax

        c = self.cfg
        d, (y, u, v) = pend
        qp = int(np.clip(self._rc.frame_qp(False, is_b=True) if self._rc
                         else c.qp + 2, 0, 51))
        yp = _pad_to(np.asarray(y, np.uint8), self.ph, self.pw)
        up = _pad_to(np.asarray(u, np.uint8), self.ph // 2, self.pw // 2)
        vp = _pad_to(np.asarray(v, np.uint8), self.ph // 2, self.pw // 2)
        out = b_jax.b_frame_device(
            jnp.asarray(yp), jnp.asarray(up), jnp.asarray(vp),
            ref0[0], ref0[1], ref0[2], ref1[0], ref1[1], ref1[2],
            B=1 << self.ctu_log2, qp=qp, search=c.me_search_range,
            me_precision=int(c.motion_estimation_precision),
            sign_hiding=c.sign_hiding, vis=(c.height, c.width))
        plan = b_golden.build_b_plans(
            np.asarray(out["idc"]), np.asarray(out["mv0"]),
            np.asarray(out["mv1"]), np.asarray(out["lev_y"]),
            np.asarray(out["lev_u"]), np.asarray(out["lev_v"]),
            (None, None, None), size=1 << self.ctu_log2,
            poc=d - self.last_idr,
            poc_refs=(d - 1 - self.last_idr, d + 1 - self.last_idr))
        au = asm.assemble_p_au(self.params, plan.ctu_plans,
                               poc=d - self.last_idr, slice_qp=qp,
                               slice_type=headers.SLICE_B, rps_idx=1)
        self.frame_bytes.append(len(au))
        if self._rc:
            self._rc.end_frame(len(au) * 8, False, is_b=True)
        return au

    # ------------------------------------------------------------------
    def encode_frames(self, frames, *, chunk: int = 8) -> list:
        """Batched streaming encode: [(y, u, v), ...] -> [Annex-B AU, ...].

        Runs of P frames go through the chunked device pipeline
        (pipeline/p_chunk.py): ONE dispatch + ONE compact fetch per `chunk`
        frames, device-resident reference loop (deblock + SAO on device),
        and chunk-level software pipelining — frame k+1's chunk computes on
        the TPU while the host runs CABAC for chunk k. IDR frames (POC 0,
        intra_period boundaries, scene cuts) use the per-frame path.
        TPU-native role of the reference's frame-parallel engines
        (hmr_encoder_lib.c:3132, num_enc_engines)."""
        if self.backend != "jax":
            return [self.encode_frame(*f) for f in frames]
        c = self.cfg
        n = len(frames)
        poc0 = self.poc
        aus: list = [None] * n
        pending = None                      # (indices, qps, wires, denses)
        i = 0

        def is_idr_at(k):
            poc = poc0 + k
            return (poc == 0
                    or (c.intra_period > 0
                        and (poc - self.last_idr) % c.intra_period == 0))

        # frame_pipeline_depth D keeps up to D chunks in flight: each
        # dispatched chunk's wire fetch runs in a BACKGROUND thread, which
        # (a) forces the lazily-executed device program to start computing
        # immediately (the runtime executes on demand) and (b) overlaps the
        # device->host transfer and the next chunk's compute with this
        # chunk's host CABAC. Cost: D chunks of RC / scene-decision
        # staleness.
        depth = max(1, int(getattr(c, "frame_pipeline_depth", 1)))
        pend_q = []                     # FIFO of dispatched chunks
        while i < n or pend_q:
            while i < n and not is_idr_at(i) and len(pend_q) < depth:
                if c.intra_period > 0:
                    poc = poc0 + i
                    run_end = min(n, i + c.intra_period
                                  - (poc - self.last_idr) % c.intra_period)
                else:
                    run_end = n
                j = min(run_end, i + chunk)
                idxs = list(range(i, j))
                qps = []
                for _ in idxs:
                    q = self._rc.frame_qp(False) if self._rc else c.qp
                    qps.append(int(np.clip(q, 0, 51)))
                wires, denses, row_plans = self._dispatch_chunk(
                    [frames[k] for k in idxs], qps)
                fut = (self._fetch_pool.submit(np.asarray, wires)
                       if depth > 1 else None)
                pend_q.append((idxs, qps, wires, fut, denses, row_plans))
                i = j
            if pend_q:
                res = self._finish_chunk(pend_q.pop(0), aus, frames)
                if res == "scene":
                    # the fallback re-encode changed the reference chain:
                    # every dispatched-but-unprocessed chunk is invalid.
                    pend_q.clear()
                    i = next((k for k in range(n) if aus[k] is None), n)
            if not pend_q and i < n and is_idr_at(i):
                aus[i] = self.encode_frame(*frames[i])
                i += 1
        return aus

    # ------------------------------------------------------------------
    def _dispatch_chunk(self, fr, qps):
        import jax.numpy as jnp

        from .pipeline import p_chunk

        c = self.cfg
        ys = np.stack([_pad_to(np.asarray(f[0], np.uint8), self.ph, self.pw)
                       for f in fr])
        us = np.stack([_pad_to(np.asarray(f[1], np.uint8), self.ph // 2,
                               self.pw // 2) for f in fr])
        vs = np.stack([_pad_to(np.asarray(f[2], np.uint8), self.ph // 2,
                               self.pw // 2) for f in fr])
        with self.prof.probe("chunk.upload"):
            if self._mesh is not None:
                import jax
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                sh = NamedSharding(self._mesh, P(None, "band"))
                ysd = jax.device_put(ys, sh)
                usd = jax.device_put(us, sh)
                vsd = jax.device_put(vs, sh)
            else:
                import jax
                # device_put transfers EAGERLY (jnp.asarray defers the
                # upload into the next forcing fetch, where it would
                # serialize with the chunk's compute + wire download);
                # doing it here overlaps the upload with the in-flight
                # previous chunk's background fetch.
                ysd = jax.device_put(ys)
                usd = jax.device_put(us)
                vsd = jax.device_put(vs)
        ctu = 1 << self.ctu_log2
        qp_rows = None
        self._last_row_plans = None
        if self._row_qp_on:
            nrows = self.ph // ctu
            qp_rows = np.stack([
                self._rc.plan_rows(q, nrows, self._prev_row_load,
                                   self._prev_row_bits)
                for q in qps])
            self._last_row_plans = qp_rows
        with self.prof.probe("chunk.dispatch"):
            wires, denses, fy, fu, fv = p_chunk.p_chunk_device(
                ysd, usd, vsd, *self._ref, jnp.asarray(qps, jnp.int32),
                ctu=ctu, search=c.me_search_range,
                me_precision=int(c.motion_estimation_precision),
                sign_hiding=c.sign_hiding, deblock=c.deblocking,
                sao=c.sample_adaptive_offset,
                cap=self._chunk_cap, tree=self.inter_split,
                tr_split=(self.params.max_tr_depth_inter > 0),
                intra_in_p=(self.inter_split and ctu == 32),
                qp_rows=(None if qp_rows is None
                         else jnp.asarray(qp_rows, jnp.int32)),
                vis=(c.height, c.width), wpp=c.wpp, cu8=self.inter_cu8)
        self._ref = (fy, fu, fv)
        return wires, denses, self._last_row_plans

    @property
    def _chunk_cap(self):
        # capacity of the compacted coded-sub-block fetch: 1/32 of all 4x4s
        # (typical P frames code far fewer; overflow falls back to the dense
        # fetch, counted in chunk_overflows). The wire fetch rides a
        # ~25 MB/s tunnel in this deployment, so idx+vals dominate its cost.
        L4 = (self.ph // 4) * (self.pw // 4) * 3 // 2
        # 1/64 after the structure-aware RD costs (bench P frames code
        # ~300-600 sub-blocks; the cap'd vals buffer was 86% of the wire
        # and the tunnel serializes transfers with compute)
        return max(1024, L4 // 64)

    @property
    def _chunk_cap2(self):
        # escape-list capacity for |level| > 127 sub-blocks (wire int8 pack)
        return max(64, self._chunk_cap // 8)

    def _finish_chunk(self, pending, aus, frames):
        """Fetch + host-process one dispatched chunk. Returns None, or
        'scene' after a scene-cut fallback re-encode."""
        from .entropy import native_backend
        from .pipeline import p_chunk

        c = self.cfg
        ctu = 1 << self.ctu_log2
        idxs, qps, wires, fut, denses, row_plans = pending
        with self.prof.probe("chunk.fetch"):
            wires_h = fut.result() if fut is not None else np.asarray(wires)
        cap = self._chunk_cap
        for row_i, (fi, qp) in enumerate(zip(idxs, qps)):
            w = p_chunk.unpack_wire(wires_h[row_i], self.ph, self.pw, ctu,
                                    cap, fine=self.inter_cu8)
            if c.reinit_gop_on_scene_change:
                ms = float(w["sad"].astype(np.int64).mean())
                if ms / (ctu * ctu) > SCENE_SAD_PER_PIXEL:
                    # scene cut: this frame and everything after in this
                    # chunk is invalid — re-encode from here per-frame
                    # (IDR first), caller restarts chunking after.
                    if self._rc:
                        self._rc.on_scene_change()
                    for k in idxs[row_i:]:
                        aus[k] = self.encode_frame(*frames[k],
                                                   force_idr=(k == fi))
                    return "scene"
            cnt = int(w["cnt"][0])
            nz = None
            with self.prof.probe("chunk.scatter"):
                if cnt <= cap and int(w["cnt2"][0]) <= self._chunk_cap2:
                    res = native_backend.scatter_levels_native(
                        w["idx"], w["vals"], min(cnt, cap), self.ph, self.pw)
                    if res is not None:
                        lev_y, lev_u, lev_v, nz = res
                    else:
                        lev_y, lev_u, lev_v = p_chunk.scatter_levels(
                            w["idx"], w["vals"], min(cnt, cap), self.ph,
                            self.pw)
                else:                      # capacity overflow: dense fetch
                    self.chunk_overflows += 1
                    d = np.asarray(denses[row_i])
                    npix = self.ph * self.pw
                    lev_y = d[:npix].reshape(self.ph, self.pw).astype(np.int32)
                    lev_u = (d[npix:npix + npix // 4]
                             .reshape(self.ph // 2, self.pw // 2)
                             .astype(np.int32))
                    lev_v = (d[npix + npix // 4:npix + npix // 2]
                             .reshape(self.ph // 2, self.pw // 2)
                             .astype(np.int32))
            uh, uw = self.ph // 4, self.pw // 4
            g = w["gran"]
            depth_u = np.repeat(np.repeat(w["depth16"], g, 0), g, 1)
            trd_u = np.repeat(np.repeat(w["trd16"], g, 0), g, 1)
            intra_u = np.repeat(np.repeat(w["intra16"], g, 0), g, 1)
            mv_u = np.repeat(np.repeat(w["mv16"], g, 0), g, 1)
            if nz is None:
                nz_y = np.any(lev_y.reshape(uh, 4, uw, 4) != 0, axis=(1, 3))
                nz_u = np.any(lev_u.reshape(uh, 2, uw, 2) != 0, axis=(1, 3))
                nz_v = np.any(lev_v.reshape(uh, 2, uw, 2) != 0, axis=(1, 3))
                nz = nz_y | nz_u | nz_v
            with self.prof.probe("chunk.decisions"):
                imode_u = np.where(intra_u.astype(bool), mv_u[..., 0], 1)
                dec = _tree_decisions(depth_u, mv_u, nz, self.ctu_log2, 5,
                                      pred_intra_u=intra_u)
                # intra-in-P CUs code TU=CU: the inter TU-split flag must
                # not leak into their (intra) transform tree now that
                # max_tr_depth_intra can be > 0
                trd_p = np.where(intra_u.astype(bool), 0, trd_u)
                maps = native_backend.maps_from_p_units(depth_u, dec, lev_y,
                                                        lev_u, lev_v,
                                                        tr_depth=trd_p,
                                                        pred_intra=intra_u,
                                                        intra_mode=imode_u)
                if row_plans is not None:
                    nbx = self.pw // ctu
                    maps["qp_ctu"] = np.repeat(
                        row_plans[row_i][:, None], nbx, 1).astype(np.int8)
                    # feedforward load signal for the next frame's plan
                    rows = self.ph // ctu
                    self._prev_row_load = (
                        (lev_y != 0).reshape(rows, ctu, -1).sum((1, 2)))
            sao_info = None
            if c.sample_adaptive_offset:
                pp = w["sao_pp"]
                luma, ml, mu = p_chunk._unpk_params(pp[0])
                cb, _, _ = p_chunk._unpk_params(pp[1])
                cr, _, _ = p_chunk._unpk_params(pp[2])
                sao_info = dict(luma=luma, cb=cb, cr=cr,
                                merge_left=ml, merge_up=mu,
                                sao_luma=True, sao_chroma=True)
            with self.prof.probe("chunk.entropy"):
                au = assemble.assemble_p_au_from_maps(
                    self.params, maps, poc=self.poc - self.last_idr,
                    slice_qp=qp, sao_info=sao_info)
            aus[fi] = au
            self.last_qp = qp
            self.poc += 1
            self.frame_bytes.append(len(au))
            if row_plans is not None and self._prev_row_load is not None:
                # measured per-row consumption: the frame's real bits
                # distributed by the coded coefficient load per row
                load = self._prev_row_load.astype(np.float64)
                tot = max(load.sum(), 1.0)
                self._prev_row_bits = len(au) * 8 * load / tot
            if self._rc:
                self._rc.end_frame(len(au) * 8, False)
        return None

    # ------------------------------------------------------------------
    def _encode_p_tree(self, yp, up, vp, qp):
        """P frame through the inter CU quadtree device stage. Returns the
        AU, or None on a detected scene cut (caller re-encodes as IDR)."""
        from .entropy import native_backend
        from .pipeline import p_jax

        c = self.cfg
        ctu = 1 << self.ctu_log2
        deblk = c.deblocking
        ydev, udev, vdev = self._cur_dev
        qp_rows = None
        if self._row_qp_on:
            import jax.numpy as jnp
            qp_rows = self._rc.plan_rows(qp, self.ph // ctu,
                                         self._prev_row_load,
                                         self._prev_row_bits)
        with self.prof.probe("p.device"):
            out = p_jax.p_frame_tree_device(
                ydev, udev, vdev, *self._ref, ctu=ctu, qp=qp,
                search=c.me_search_range,
                me_precision=int(c.motion_estimation_precision),
                deblock=deblk, sign_hiding=c.sign_hiding,
                tr_split=(self.params.max_tr_depth_inter > 0),
                intra_in_p=(ctu == 32), vis=(c.height, c.width),
                qp_rows=(None if qp_rows is None
                         else jnp.asarray(qp_rows, jnp.int32)),
                wpp=c.wpp, cu8=self.inter_cu8)
        uh, uw = self.ph // 4, self.pw // 4
        nby, nbx = self.ph // ctu, self.pw // ctu
        npix = self.ph * self.pw
        with self.prof.probe("p.fetch"):
            wire = np.asarray(out["wire"])           # ONE fetch RPC
            meta = np.ascontiguousarray(
                wire[npix + npix // 2:]).view(np.int32)
            o = 0
            depth_u = meta[o:o + uh * uw].reshape(uh, uw); o += uh * uw
            mv_u = meta[o:o + uh * uw * 2].reshape(uh, uw, 2); o += uh * uw * 2
            nz_u = meta[o:o + uh * uw].reshape(uh, uw).astype(bool)
            o += uh * uw
            trd_u = meta[o:o + uh * uw].reshape(uh, uw); o += uh * uw
            intra_u = meta[o:o + uh * uw].reshape(uh, uw); o += uh * uw
            sad = meta[o:].reshape(nby, nbx)
        if c.reinit_gop_on_scene_change:
            ms = float(sad.astype(np.int64).mean())
            if ms / (ctu * ctu) > SCENE_SAD_PER_PIXEL:
                self._scene_idr = True
                if self._rc:
                    self._rc.on_scene_change()
                return None
        lev_yp = wire[:npix].reshape(self.ph, self.pw)
        lev_up = wire[npix:npix + npix // 4].reshape(self.ph // 2,
                                                     self.pw // 2)
        lev_vp = wire[npix + npix // 4:npix + npix // 2].reshape(
            self.ph // 2, self.pw // 2)
        with self.prof.probe("p.decisions+maps"):
            imode_u = np.where(intra_u.astype(bool), mv_u[..., 0], 1)
            dec = _tree_decisions(depth_u, mv_u, nz_u, self.ctu_log2, 5,
                                  pred_intra_u=intra_u)
            # intra-in-P CUs code TU=CU (see _finish_chunk note)
            trd_p = np.where(intra_u.astype(bool), 0, trd_u)
            maps = native_backend.maps_from_p_units(depth_u, dec, lev_yp,
                                                    lev_up, lev_vp,
                                                    tr_depth=trd_p,
                                                    pred_intra=intra_u,
                                                    intra_mode=imode_u)
            if qp_rows is not None:
                maps["qp_ctu"] = np.repeat(qp_rows[:, None], nbx,
                                           1).astype(np.int8)
                self._prev_row_load = (
                    (lev_yp != 0).reshape(nby, ctu, -1).sum((1, 2)))
        key = "ref" if deblk else "recon"
        self._ref = (out[key + "_y"], out[key + "_u"], out[key + "_v"])
        with self.prof.probe("sao"):
            sao_info = self._maybe_sao(yp, up, vp, qp, slice_p=True)
        with self.prof.probe("entropy"):
            au = assemble.assemble_p_au_from_maps(
                self.params, maps, poc=self.poc - self.last_idr,
                slice_qp=qp, sao_info=sao_info)
            if qp_rows is not None and self._prev_row_load is not None:
                load = self._prev_row_load.astype(np.float64)
                self._prev_row_bits = (len(au) * 8 * load
                                       / max(load.sum(), 1.0))
            return au

    # ------------------------------------------------------------------
    def _encode_golden(self, yp, up, vp, is_idr, qp):
        from .pipeline import gop as gop_mod
        from .pipeline import intra_golden, p_golden

        c = self.cfg
        size = 1 << self.ctu_log2
        h, w = yp.shape
        if is_idr:
            plan = intra_golden.encode_intra_frame(
                yp, up, vp, qp=qp, ctu_log2=self.ctu_log2,
                sign_hiding=c.sign_hiding)
            self._ref = gop_mod._deblock_intra(plan.recon, qp, h, w,
                                               min(size, 32), c.deblocking)
            sao_info = self._maybe_sao(yp, up, vp, qp)
            au = assemble.assemble_idr_au(
                self.params, plan.ctu_plans, slice_qp=qp,
                include_parameter_sets=True, sao_info=sao_info)
        else:
            pplan = p_golden.encode_p_frame(
                yp, up, vp, self._ref, qp=qp, ctu_log2=self.ctu_log2,
                search=c.me_search_range,
                me_precision=int(c.motion_estimation_precision),
                sign_hiding=c.sign_hiding)
            if c.reinit_gop_on_scene_change:
                ms = float(np.asarray(pplan.sad, np.int64).mean())
                if ms / (size * size) > SCENE_SAD_PER_PIXEL:
                    self._scene_idr = True
                    if self._rc:
                        self._rc.on_scene_change()
                    qp = self._requery_idr_qp(qp)
                    return self._encode_golden(yp, up, vp, True, qp)
            self._ref = gop_mod._deblock_inter(pplan.recon, qp, h, w,
                                               min(size, 32), pplan.field,
                                               pplan.cbf_y_unit, c.deblocking)
            sao_info = self._maybe_sao(yp, up, vp, qp, slice_p=True)
            au = assemble.assemble_p_au(self.params, pplan.ctu_plans,
                                        poc=self.poc - self.last_idr,
                                        slice_qp=qp, sao_info=sao_info)
        return au, self._ref

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def _maybe_sao(self, yp, up, vp, qp, slice_p=False):
        # SAO stage on the loop-filtered reference; updates self._ref to the
        # SAO output (the decoder-side reference picture).
        if not self.cfg.sample_adaptive_offset:
            return None
        from . import tables
        qp_c = int(tables.chroma_qp_from_luma(qp))
        size = 1 << self.ctu_log2
        if self.backend == "jax":
            from .ops.sao import sao_stage_device
            info, filt = sao_stage_device(self._cur_dev, self._ref, size,
                                          qp, qp_c, slice_p=slice_p)
            self._ref = filt              # stays on device
        else:
            from .ops.sao import sao_stage
            info, self._ref = sao_stage((yp, up, vp), self._ref, size, qp,
                                        qp_c)
        return info

    def close(self) -> None:
        self._ref = None
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=False)
            self._fetch_pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_annex_b(path: str, aus: list[bytes]) -> None:
    """Role of HOMER_enc_write_annex_b_output (hmr_encoder_lib.c:2196):
    AUs already carry start codes; this just concatenates to a file."""
    with open(path, "wb") as f:
        for au in aus:
            f.write(au)
