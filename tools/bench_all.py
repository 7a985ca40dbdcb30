"""Benchmark ALL five BASELINE.md configs: ours on the TPU vs the
reference binary (SSE4.2 Release) on the eval host, SAME clips and
operating points, both decoded with libde265 for PSNR-Y.

Writes RESULTS.json and RESULTS.md at the repo root.

Usage: python tools/bench_all.py [--frames 64] [--configs 1,2,3,4,5]
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REF_BIN = "/tmp/refbuild/build/Linux/homer_app/Release/homer_app"


def psnr_y(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def clip_cached(w, h, n, seed):
    from homerhevc_tpu.utils.synth import synth_clip
    from homerhevc_tpu.utils.yuv import write_yuv_frame
    frames = list(synth_clip(w, h, n, seed=seed))
    path = f"/tmp/benchall_{w}x{h}_s{seed}_{n}.yuv"
    if not os.path.exists(path):
        with open(path, "wb") as f:
            for y, u, v in frames:
                write_yuv_frame(f, y, u, v)
    return frames, path


def decode_stats(data, frames, w, h):
    from homerhevc_tpu.validate import de265
    dec = de265.decode_annexb(data)
    ps = [psnr_y(frames[i][0], dec[i][0][:h, :w]) for i in range(len(dec))]
    return len(dec), float(np.mean(ps))


def run_ref(yuv, w, h, n, extra):
    out = "/tmp/benchall_ref.265"
    cmd = [REF_BIN, "-i", yuv, "-o", out, "-widthxheight", f"{w}x{h}",
           "-frame_rate", "25", "-n_wpp_threads", "0", "-n_enc_engines",
           "1", "-n_frames", str(n)] + extra
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    dt = time.time() - t0
    fps = None
    for line in (p.stdout + p.stderr).splitlines():
        if "fps" in line:
            try:
                fps = float(line.split("fps")[0].split()[-1])
            except Exception:
                pass
    with open(out, "rb") as f:
        data = f.read()
    return data, (fps if fps else n / dt)


def run_ours(frames, cfg, *, chunked, n_warm=2):
    """Encode with warm-up excluded from the timed window: warm on the
    first n_warm frames with a THROWAWAY encoder, then time a fresh
    encoder over the full clip (all shapes compiled)."""
    from homerhevc_tpu.api import HomerEncoder
    warm = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    if chunked:
        warm.encode_frames(frames[:1 + 8], chunk=8)
    else:
        for f in frames[:n_warm]:
            warm.encode_frame(*f)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    t0 = time.perf_counter()
    if chunked:
        aus = enc.encode_frames(frames, chunk=8)
    else:
        aus = [enc.encode_frame(*f) for f in frames]
    dt = time.perf_counter() - t0
    return b"".join(aus), len(frames) / dt


def build_configs(n):
    from homerhevc_tpu.config import (BitrateMode, EncoderConfig,
                                      PerformanceMode, RDMode)
    c720 = (1280, 720, 0)
    c1080 = (1920, 1080, 1)
    return {
        "intra_fast": dict(
            geom=c720, chunked=False,
            ref=["-intra_period", "1", "-gop_size", "0", "-b_frames", "0",
                 "-qp", "32", "-bitrate_mode", "0", "-cu_size", "64",
                 "-performance_mode", "1", "-rd", "2", "-sao", "0",
                 "-sign_hiding", "1"],
            ours=EncoderConfig(width=1280, height=720, qp=32, cu_size=64,
                               intra_period=1, rd_mode=RDMode.FAST,
                               sample_adaptive_offset=False,
                               sign_hiding=True)),
        "intra_full": dict(
            geom=c720, chunked=False,
            ref=["-intra_period", "1", "-gop_size", "0", "-b_frames", "0",
                 "-qp", "32", "-bitrate_mode", "0", "-cu_size", "64",
                 "-performance_mode", "1", "-rd", "1",
                 "-max_intra_tr_depth", "3", "-sao", "1",
                 "-sign_hiding", "1"],
            ours=EncoderConfig(width=1280, height=720, qp=32, cu_size=64,
                               intra_period=1, rd_mode=RDMode.FULL,
                               max_intra_tr_depth=1,
                               sample_adaptive_offset=True,
                               sign_hiding=True)),
        "ippp_720": dict(
            geom=c720, chunked=True,
            ref=["-intra_period", "100", "-gop_size", "1", "-b_frames",
                 "0", "-qp", "32", "-bitrate_mode", "0", "-cu_size", "64",
                 "-performance_mode", "1", "-rd", "2", "-sao", "1",
                 "-sign_hiding", "1"],
            ours=EncoderConfig(width=1280, height=720, qp=32, cu_size=32,
                               intra_period=100, me_search_range=64,
                               sample_adaptive_offset=True,
                               sign_hiding=True, frame_pipeline_depth=2)),
        "ippp_1080_cbr": dict(
            geom=c1080, chunked=True,
            ref=["-intra_period", "100", "-gop_size", "1", "-b_frames",
                 "0", "-bitrate_mode", "1", "-bitrate", "6000",
                 "-vbv_size", "6000", "-vbv_init", "3000", "-qp", "32",
                 "-cu_size", "64", "-performance_mode", "1", "-rd", "2",
                 "-sao", "1", "-sign_hiding", "1"],
            ours=EncoderConfig(width=1920, height=1080, qp=32, cu_size=32,
                               intra_period=100, me_search_range=64,
                               bitrate_mode=BitrateMode.CBR, bitrate=6000,
                               vbv_size=6000, vbv_init=3000,
                               sample_adaptive_offset=True,
                               sign_hiding=True, frame_pipeline_depth=2)),
        "ippp_1080_vbr": dict(
            geom=c1080, chunked=True,
            ref=["-intra_period", "100", "-gop_size", "1", "-b_frames",
                 "0", "-bitrate_mode", "2", "-bitrate", "5000",
                 "-vbv_size", "7500", "-vbv_init", "3750", "-qp", "32",
                 "-cu_size", "64", "-performance_mode", "1", "-rd", "2",
                 "-sao", "1", "-sign_hiding", "1"],
            ours=EncoderConfig(width=1920, height=1080, qp=32, cu_size=32,
                               intra_period=100, me_search_range=64,
                               bitrate_mode=BitrateMode.VBR, bitrate=5000,
                               vbv_size=7500, vbv_init=3750, wpp=True,
                               sample_adaptive_offset=True,
                               sign_hiding=True, frame_pipeline_depth=2)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()
    n = args.frames
    names = ["intra_fast", "intra_full", "ippp_720", "ippp_1080_cbr",
             "ippp_1080_vbr"]
    want = [names[int(i) - 1] for i in args.configs.split(",")]
    cfgs = build_configs(n)
    results = {}
    for name in want:
        spec = cfgs[name]
        w, h, seed = spec["geom"]
        frames, yuv = clip_cached(w, h, n, seed)
        row = {}
        if not args.skip_ref and os.path.exists(REF_BIN):
            data, fps = run_ref(yuv, w, h, n, spec["ref"])
            nd, ps = decode_stats(data, frames, w, h)
            row["ref"] = dict(fps=round(fps, 2), bytes=len(data),
                              kbps=round(len(data) * 8 * 25 / nd / 1000, 1),
                              psnr_y=round(ps, 3), n_decoded=nd)
            print(name, "REF :", row["ref"], flush=True)
        data, fps = run_ours(frames, spec["ours"], chunked=spec["chunked"])
        nd, ps = decode_stats(data, frames, w, h)
        row["ours"] = dict(fps=round(fps, 2), bytes=len(data),
                           kbps=round(len(data) * 8 * 25 / nd / 1000, 1),
                           psnr_y=round(ps, 3), n_decoded=nd)
        print(name, "OURS:", row["ours"], flush=True)
        results[name] = row
        with open("RESULTS.json", "w") as f:
            json.dump(results, f, indent=1)

    lines = [
        "# RESULTS — all five BASELINE.md configs, ours (TPU v5e chip) vs "
        "the reference (SSE4.2, eval-host CPU)",
        "",
        f"Same {n}-frame synthetic clips (utils.synth seeds 0/1), both "
        "streams decoded with libde265; PSNR-Y vs source. Encoder fps "
        "excludes one-time XLA compilation (warm-up encoder).",
        "",
        "| config | ref fps | ours fps | speedup | ref kbps | ours kbps |"
        " ref PSNR-Y | ours PSNR-Y |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, row in results.items():
        r = row.get("ref", {})
        o = row["ours"]
        sp = (f"{o['fps'] / r['fps']:.2f}x" if r else "—")
        lines.append(
            f"| {name} | {r.get('fps', '—')} | {o['fps']} | {sp} "
            f"| {r.get('kbps', '—')} | {o['kbps']} "
            f"| {r.get('psnr_y', '—')} | {o['psnr_y']} |")
    with open("RESULTS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RESULTS.md / RESULTS.json")


if __name__ == "__main__":
    main()
