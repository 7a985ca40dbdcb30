"""Round-4 probe breakdown of the exact bench operating point.

Runs the bench config (720p IPPP, chunk=8, depth=2, FAST tree) for one
warm window + one timed window and prints per-probe totals so the
host-vs-device residue is attributable.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import EncoderConfig, PerformanceMode
    from homerhevc_tpu.utils.profiler import Profiler
    from homerhevc_tpu.utils.synth import synth_clip

    W, H, QP = 1280, 720, 32
    CHUNK = int(os.environ.get("B4_CHUNK", "8"))
    DEPTH = int(os.environ.get("B4_DEPTH", "2"))
    N_WARM, N_BENCH = 1 + CHUNK, 4 * CHUNK
    frames = list(synth_clip(W, H, N_WARM + N_BENCH, seed=0))

    cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=64, frame_pipeline_depth=DEPTH,
                        performance_mode=PerformanceMode.FAST_COMPUTATION)
    prof = Profiler()
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False, profiler=prof)

    t0 = time.perf_counter()
    enc.encode_frames(frames[:N_WARM], chunk=CHUNK)
    print(f"warm {time.perf_counter()-t0:.1f}s", flush=True)

    prof.acc.clear()
    prof.count.clear()
    t0 = time.perf_counter()
    aus = enc.encode_frames(frames[N_WARM:], chunk=CHUNK)
    dt = time.perf_counter() - t0
    print(f"timed {dt:.3f}s  {N_BENCH/dt:.2f} fps  "
          f"{dt/N_BENCH*1e3:.1f} ms/f", flush=True)
    try:
        rep = prof.report()
    except Exception:
        rep = getattr(prof, "totals", None) or vars(prof)
    print(rep)


if __name__ == "__main__":
    main()
