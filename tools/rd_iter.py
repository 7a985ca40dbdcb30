"""Fast RD iteration loop: encode N frames through the chunked bench path
on TPU, print bytes / PSNR-Y / per-category CABAC bit breakdown.

Usage: python tools/rd_iter.py [--frames 17] [--qp 32] [--lam-p-num 2]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

W, H = 1280, 720


def psnr_y(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args()

    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import EncoderConfig, PerformanceMode
    from homerhevc_tpu.entropy import native_backend as nb_mod
    from homerhevc_tpu.utils.synth import synth_clip

    frames = list(synth_clip(W, H, args.frames, seed=args.seed))
    cfg = EncoderConfig(width=W, height=H, qp=args.qp, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=64, frame_pipeline_depth=2,
                        performance_mode=PerformanceMode.FAST_COMPUTATION)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    t0 = time.perf_counter()
    with nb_mod.bit_probe() as bp:
        aus = enc.encode_frames(frames, chunk=8)
        tot = bp.arr.copy()
    dt = time.perf_counter() - t0
    sizes = [len(a) for a in aus]
    p_sizes = sizes[1:]
    print(f"{dt:.1f}s  I={sizes[0]}B  P avg={np.mean(p_sizes):.0f}B "
          f"min={min(p_sizes)} max={max(p_sizes)}", flush=True)
    cats = {k: round(float(b) / 8, 1)
            for k, b in zip(nb_mod.BIT_CATS, tot) if b}
    print("  total breakdown (bytes):",
          dict(sorted(cats.items(), key=lambda kv: -kv[1])))
    if not args.no_decode:
        from homerhevc_tpu.validate import de265
        dec = de265.decode_annexb(b"".join(aus))
        ps = [psnr_y(frames[i][0], dec[i][0][:H, :W])
              for i in range(len(dec))]
        print(f"  decoded {len(dec)}  PSNR-Y avg={np.mean(ps):.3f} "
              f"I={ps[0]:.3f} P={np.mean(ps[1:]):.3f}")


if __name__ == "__main__":
    main()
