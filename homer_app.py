#!/usr/bin/env python3
"""HomerHEVC-TPU console app — role of the reference's homer_app
(/root/reference/src/homer_app/homer_app.c:80-557): reads a YUV420 8-bit
file, drives the encoder API, writes an Annex-B .265 file (and optionally
the reconstructed YUV), prints per-frame stats and final fps.

Flags mirror the reference CLI (homer_app.c:126-304) where the feature
exists; TPU-specific extras are documented in --help.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_args(argv):
    ap = argparse.ArgumentParser(prog="homer_app", description=__doc__)
    ap.add_argument("-i", dest="input", required=True, help="input YUV420 file")
    ap.add_argument("-o", dest="output", help="output .265 file")
    ap.add_argument("-o-raw", dest="output_raw", help="write reconstructed YUV")
    ap.add_argument("-widthxheight", dest="size", default="1280x720")
    ap.add_argument("-frame_rate", type=float, default=25.0)
    ap.add_argument("-cu_size", type=int, default=32, choices=(16, 32, 64))
    ap.add_argument("-intra_period", type=int, default=100)
    ap.add_argument("-gop_size", type=int, default=1,
                    help="0: all intra, 1: IPPP, 2: IBP (one B between anchors)")
    ap.add_argument("-qp", type=int, default=32)
    ap.add_argument("-motion_estimation_precision", type=int, default=2,
                    choices=(0, 1, 2))
    ap.add_argument("-chroma_qp_offset", type=int, default=0)
    ap.add_argument("-sign_hiding", type=int, default=0)
    ap.add_argument("-sao", type=int, default=0)
    ap.add_argument("-deblocking", type=int, default=1)
    ap.add_argument("-bitrate_mode", type=int, default=0,
                    help="0=FIXED_QP 1=CBR 2=VBR")
    ap.add_argument("-bitrate", type=int, default=1250, help="kbps")
    ap.add_argument("-vbv_size", type=float, default=1.0,
                    help="in units of bitrate (seconds)")
    ap.add_argument("-vbv_init", type=float, default=0.35,
                    help="in units of vbv_size")
    ap.add_argument("-n_wpp_threads", type=int, default=0,
                    help="0: no WPP; >0: per-CTU-row entropy substreams")
    ap.add_argument("-search_range", type=int, default=16)
    ap.add_argument("-rd", "-rd_mode", dest="rd_mode", type=int, default=1,
                    help="0=DIST_ONLY 1=FULL 2=FAST (HOMER_RD_MODES)")
    ap.add_argument("-performance_mode", type=int, default=1,
                    help="0=FULL (8x8 inter CUs) 1=FAST 2=FASTER 3=FASTEST")
    ap.add_argument("-max_intra_tr_depth", type=int, default=1)
    ap.add_argument("-max_inter_tr_depth", type=int, default=1)
    ap.add_argument("-n_frames", type=int, default=1000)
    ap.add_argument("-skipped_frames", type=int, default=0)
    ap.add_argument("-backend", default="jax", choices=("jax", "golden"))
    ap.add_argument("-metrics", action="store_true",
                    help="print per-frame PSNR (role of COMPUTE_METRICS)")
    ap.add_argument("-profiling", action="store_true",
                    help="print stage timing breakdown (role of _TIME_PROFILING_)")
    return ap.parse_args(argv)


def read_yuv_frames(path, w, h, n, skip=0):
    fsize = w * h * 3 // 2
    with open(path, "rb") as f:
        f.seek(skip * fsize)
        for _ in range(n):
            data = f.read(fsize)
            if len(data) < fsize:
                return
            y = np.frombuffer(data, np.uint8, w * h).reshape(h, w)
            u = np.frombuffer(data, np.uint8, w * h // 4,
                              w * h).reshape(h // 2, w // 2)
            v = np.frombuffer(data, np.uint8, w * h // 4,
                              w * h * 5 // 4).reshape(h // 2, w // 2)
            yield y, u, v


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    w, h = map(int, args.size.lower().split("x"))

    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import (BitrateMode, EncoderConfig, MEPrecision,
                                      PerformanceMode, RDMode)

    cfg = EncoderConfig(
        width=w, height=h, frame_rate=args.frame_rate, cu_size=args.cu_size,
        intra_period=(1 if args.gop_size == 0 else args.intra_period),
        gop_size=args.gop_size, qp=args.qp,
        chroma_qp_offset=args.chroma_qp_offset,
        bitrate_mode=BitrateMode(args.bitrate_mode), bitrate=args.bitrate,
        vbv_size=int(args.vbv_size * args.bitrate),
        vbv_init=int(args.vbv_init * args.vbv_size * args.bitrate),
        sign_hiding=bool(args.sign_hiding),
        sample_adaptive_offset=bool(args.sao),
        deblocking=bool(args.deblocking),
        motion_estimation_precision=MEPrecision(args.motion_estimation_precision),
        me_search_range=args.search_range,
        rd_mode=RDMode(args.rd_mode),
        performance_mode=PerformanceMode(args.performance_mode),
        max_intra_tr_depth=args.max_intra_tr_depth,
        max_inter_tr_depth=args.max_inter_tr_depth,
        wpp=args.n_wpp_threads > 0)

    if args.gop_size >= 2 and args.backend == "jax":
        # Streaming IBP: push_frame buffers one B until its anchor arrives
        # (decode-order output); RC / metrics / SAO(anchors) all supported.
        from homerhevc_tpu.utils.profiler import Profiler
        prof = Profiler(enabled=args.profiling)
        enc = HomerEncoder(cfg, backend="jax", profiler=prof,
                           fetch_recon=bool(args.output_raw or args.metrics))
        out_f = open(args.output, "wb") if args.output else None
        n_in, n_out, total = 0, 0, 0
        t0 = time.time()
        frames_iter = read_yuv_frames(args.input, w, h, args.n_frames,
                                      args.skipped_frames)
        for y, u, v in frames_iter:
            n_in += 1
            for au in enc.push_frame(y, u, v):
                total += len(au)
                if out_f:
                    out_f.write(au)
                n_out += 1
        for au in enc.flush():
            total += len(au)
            if out_f:
                out_f.write(au)
            n_out += 1
        dt = max(time.time() - t0, 1e-9)
        print(f"{n_out} frames in {dt * 1000:.0f} milliseconds:"
              f" {n_out / dt:f} fps ({total * 8 * 25 / max(n_out,1) / 1000:.1f}"
              f" kbps est)")
        if args.profiling:
            print(prof.report())
        if out_f:
            out_f.close()
        return

    if args.gop_size >= 2:
        # golden backend: IBP via the offline batch sequence.
        return main_ibp(args, cfg, w, h)

    from homerhevc_tpu.utils.profiler import Profiler
    prof = Profiler(enabled=args.profiling)
    enc = HomerEncoder(cfg, backend=args.backend, profiler=prof)
    out_f = open(args.output, "wb") if args.output else None
    raw_f = open(args.output_raw, "wb") if args.output_raw else None

    n = 0
    t0 = time.time()
    for y, u, v in read_yuv_frames(args.input, w, h, args.n_frames,
                                   args.skipped_frames):
        au = enc.encode_frame(y, u, v)
        if out_f:
            out_f.write(au)
        if raw_f:
            for p in enc.last_recon:
                raw_f.write(np.ascontiguousarray(p).tobytes())
        psnr_txt = ""
        if args.metrics:
            from homerhevc_tpu.utils.psnr import psnr
            ry, ru, rv = enc.last_recon
            psnr_txt = (f", PSNR Y:{psnr(y, ry):.2f} U:{psnr(u, ru):.2f}"
                        f" V:{psnr(v, rv):.2f}")
        ptype = 'I' if n == enc.last_idr else 'P'
        print(f"POC:{n}, {ptype}, bits:{len(au) * 8}, qp: {enc.last_qp}"
              f"{psnr_txt}", flush=True)
        n += 1
    dt = time.time() - t0
    if out_f:
        out_f.close()
    if raw_f:
        raw_f.close()
    enc.close()
    print(f"{n} frames in {dt*1000:.0f} milliseconds: {n/dt:f} fps")
    if args.profiling:
        print(prof.report())
    return 0


def main_ibp(args, cfg, w, h):
    from homerhevc_tpu.pipeline import gop as gop_mod

    frames = list(read_yuv_frames(args.input, w, h, args.n_frames,
                                  args.skipped_frames))
    # pad to CTU grid
    ph, pw = cfg.padded_height, cfg.padded_width
    padded = [tuple(np.pad(p, ((0, t - p.shape[0]), (0, tw - p.shape[1])),
                           mode="edge")
                    for p, (t, tw) in zip(f, ((ph, pw), (ph // 2, pw // 2),
                                              (ph // 2, pw // 2))))
              for f in frames]
    t0 = time.time()
    res = gop_mod.encode_ibp(padded, qp=cfg.qp,
                             ctu_log2=cfg.cu_size.bit_length() - 1,
                             deblocking=cfg.deblocking,
                             search=cfg.me_search_range,
                             me_precision=int(cfg.motion_estimation_precision),
                             sign_hiding=cfg.sign_hiding)
    dt = time.time() - t0
    if args.output:
        with open(args.output, "wb") as f:
            f.write(res.stream)
    if args.output_raw:
        with open(args.output_raw, "wb") as f:
            for rec in res.recons:
                for p, (t, tw) in zip(rec, ((cfg.height, cfg.width),
                                            (cfg.height // 2, cfg.width // 2),
                                            (cfg.height // 2, cfg.width // 2))):
                    f.write(np.ascontiguousarray(p[:t, :tw]).tobytes())
    n = len(frames)
    for i, b in enumerate(res.per_frame_bytes):
        ptype = "I" if i == 0 else ("B" if i % 2 == 1 and i < n - (n % 2 == 0)
                                    else "P")
        print(f"POC:{i}, {ptype}, bits:{b * 8}, qp: {cfg.qp}", flush=True)
    print(f"{n} frames in {dt*1000:.0f} milliseconds: {n/dt:f} fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
