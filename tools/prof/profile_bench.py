"""Profiled bench: per-stage breakdown + per-frame wall times on TPU."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import EncoderConfig, PerformanceMode
    from homerhevc_tpu.utils.profiler import Profiler
    from homerhevc_tpu.utils.synth import synth_clip

    mode = sys.argv[1] if len(sys.argv) > 1 else "fastest"
    W, H, QP = 1280, 720, 32
    N_WARM, N_BENCH = 2, 8
    frames = list(synth_clip(W, H, N_WARM + N_BENCH, seed=0))

    pm = (PerformanceMode.FASTEST_COMPUTATION if mode == "fastest"
          else PerformanceMode.FAST_COMPUTATION)
    cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=16, performance_mode=pm)
    prof = Profiler()
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False,
                       profiler=prof)

    t_start = time.perf_counter()
    for i, f in enumerate(frames[:N_WARM]):
        t0 = time.perf_counter()
        n = len(enc.encode_frame(*f))
        print(f"warm  frame {i}: {time.perf_counter()-t0:7.3f}s {n}B",
              flush=True)
    print(f"warmup total {time.perf_counter()-t_start:.1f}s", flush=True)

    prof2 = Profiler()
    enc.prof = prof2
    per_frame = []
    t0 = time.perf_counter()
    for i, f in enumerate(frames[N_WARM:]):
        t1 = time.perf_counter()
        n = len(enc.encode_frame(*f))
        dt = time.perf_counter() - t1
        per_frame.append(dt)
        print(f"bench frame {i}: {dt:7.3f}s {n}B", flush=True)
    dt = time.perf_counter() - t0
    print(prof2.report())
    print(json.dumps({"fps": round(N_BENCH / dt, 3),
                      "per_frame_s": [round(t, 3) for t in per_frame]}))


if __name__ == "__main__":
    main()
