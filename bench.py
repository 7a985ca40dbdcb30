"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Headline: END-TO-END 720p IPPP frames/s on one chip through the public API
(device ME/MC/transform + host decisions + native CABAC + loop filters) —
BASELINE.md config #3. vs_baseline compares against the measured
HomerHEVC-SSE42 Release fps at the same operating point on the eval host
(BASELINE_MEASURED.json "ippp_720": 22.69 fps).

Every frame's Annex-B bytes are materialized on the host, so the timing is
immune to async-dispatch artifacts.
"""

import json
import os
import time

# Persistent compile cache: the first TPU run pays remote compiles; repeats
# (the driver's round-end run) hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.utils.synth import synth_clip

    W, H, QP = 1280, 720, 32
    N_WARM, N_BENCH = 2, 16
    frames = list(synth_clip(W, H, N_WARM + N_BENCH, seed=0))

    from homerhevc_tpu.config import PerformanceMode

    # FASTEST: the timed window is all-P (intra RDO depth only affects the
    # untimed warm IDR, but its one-off device compile is large — keep the
    # bench turnaround bounded).
    cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=16,
                        performance_mode=PerformanceMode.FASTEST_COMPUTATION)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)

    total_bytes = 0
    for f in frames[:N_WARM]:
        total_bytes += len(enc.encode_frame(*f))

    t0 = time.perf_counter()
    for f in frames[N_WARM:]:
        total_bytes += len(enc.encode_frame(*f))
    dt = time.perf_counter() - t0
    fps = N_BENCH / dt

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as fh:
            base = json.load(fh)["configs"]["ippp_720"]["fps"]
    except Exception:
        base = None
    print(json.dumps({
        "metric": "ippp_720p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3) if base else None,
    }))


if __name__ == "__main__":
    main()
