"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Headline: END-TO-END 720p IPPP frames/s on one chip through the public API
(BASELINE.md config #3: quarter-pel ME, inter CU quadtree / fast RD,
SAO + deblock + sign-hiding on). The encode runs through
HomerEncoder.encode_frames — the chunked device pipeline (K frames per
dispatch, device-resident reference loop, frame_pipeline_depth=2 so host
CABAC for chunk k overlaps device compute for chunk k+1). vs_baseline
compares against the measured HomerHEVC-SSE42 Release fps at the same
operating point on the eval host (BASELINE_MEASURED.json "ippp_720").

Robustness: the measurement runs in a CHILD process; the parent retries on
failure (the axon TPU tunnel drops and recovers on its own — round 2's
driver bench was lost to one such outage) and ALWAYS prints a single JSON
line, with an "error" field instead of a traceback on persistent failure.

Honesty: every frame's Annex-B bytes are materialized on the host (timing
immune to async-dispatch artifacts and the axon result cache — each frame's
content differs); the reported value is the MEDIAN of three identical timed
windows (flake policy: medians resist one-off tunnel stalls in either
direction; all runs recorded in BENCH_DETAIL.json).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
METRIC = "ippp_720p_fps"

# Persistent compile cache: the first TPU run pays remote compiles; repeats
# (the driver's round-end run) hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _baseline():
    try:
        with open(os.path.join(REPO, "BASELINE_MEASURED.json")) as fh:
            return json.load(fh)["configs"]["ippp_720"]["fps"]
    except Exception:
        return None


def _tunnel_mbps():
    """Measured device->host bandwidth (the TPU rides a shared tunnel
    whose bandwidth dips by ~10x at times; fps windows taken during a dip
    measure the tunnel's weather, not the encoder)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    a = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2_000_000,), np.uint8))
    jax.block_until_ready(a)
    b = a + np.uint8(1)
    t0 = time.perf_counter()
    np.asarray(b)
    return 2.0 / max(time.perf_counter() - t0, 1e-6)


def inner():
    """The actual measurement (runs in a child process)."""
    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import EncoderConfig, PerformanceMode
    from homerhevc_tpu.utils.synth import synth_clip

    W, H, QP = 1280, 720, 32
    CHUNK = 8
    N_WARM, N_BENCH = 1 + CHUNK, 4 * CHUNK
    frames = list(synth_clip(W, H, N_WARM + N_BENCH, seed=0))

    # Wait out tunnel-bandwidth dips (bounded): every timed window still
    # measures a complete, honest encode — this only picks WHEN to measure.
    probes = [round(_tunnel_mbps(), 1)]
    t_gate0 = time.time()
    gate_s = float(os.environ.get("BENCH_TUNNEL_GATE_S", "600"))
    while probes[-1] < 8.0 and time.time() - t_gate0 < gate_s:
        time.sleep(45)
        probes.append(round(_tunnel_mbps(), 1))

    cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32,
                        intra_period=100, sign_hiding=True,
                        sample_adaptive_offset=True, deblocking=True,
                        me_search_range=64, frame_pipeline_depth=2,
                        performance_mode=PerformanceMode.FAST_COMPUTATION)

    def run_window(enc, fr):
        t0 = time.perf_counter()
        aus = enc.encode_frames(fr, chunk=CHUNK)
        dt = time.perf_counter() - t0
        return sum(len(a) for a in aus), dt, [len(a) for a in aus]

    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    # Warm: the IDR + one full-size P chunk (compiles every shape the timed
    # window uses; .jax_cache makes repeats cheap).
    t_w0 = time.perf_counter()
    run_window(enc, frames[:N_WARM])
    warm_dt = time.perf_counter() - t_w0

    runs = []
    total_bytes = au_sizes = None
    for _ in range(3):
        enc2 = HomerEncoder(cfg, backend="jax", fetch_recon=False)
        run_window(enc2, frames[:N_WARM])          # rebuild the ref chain
        b, dt, sizes = run_window(enc2, frames[N_WARM:])
        runs.append(N_BENCH / dt)
        total_bytes, au_sizes = b, sizes
    fps = sorted(runs)[len(runs) // 2]

    base = _baseline()
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as fh:
            json.dump({"warm_s": round(warm_dt, 3),
                       "fps_runs": [round(r, 2) for r in runs],
                       "policy": "median of 3 identical timed windows; "
                                 "start gated on tunnel bandwidth >= 8 MB/s"
                                 " (bounded wait; probes recorded)",
                       "tunnel_mbps_probes": probes,
                       "bytes": total_bytes, "au_sizes": au_sizes,
                       "n_frames": N_BENCH, "chunk": CHUNK,
                       "pipeline_depth": 2, "mode": "FAST(tree)"}, fh)
    except Exception:
        pass

    print(json.dumps({
        "metric": METRIC,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3) if base else None,
    }))


def outer():
    """Retry wrapper: the axon tunnel can be down for minutes at a time;
    keep retrying the child until a JSON line appears or the deadline."""
    deadline = time.time() + float(os.environ.get("BENCH_DEADLINE_S", 2700))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", 1800))
    errors = []
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.time()
        if budget <= 60 and attempt > 1:
            break
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                capture_output=True, text=True,
                timeout=max(min(attempt_timeout, budget), 300))
            for line in reversed(p.stdout.strip().splitlines()):
                try:
                    obj = json.loads(line)
                except Exception:
                    continue
                if obj.get("metric") == METRIC and obj.get("value"):
                    print(line)
                    return
            tail = (p.stderr or p.stdout or "").strip().splitlines()[-1:]
            errors.append(f"attempt {attempt} rc={p.returncode}: "
                          f"{tail[0][:200] if tail else 'no output'}")
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {attempt}: timeout")
        if time.time() + 90 > deadline:
            break
        time.sleep(60)      # tunnel outages recover on their own
    base = _baseline()
    print(json.dumps({
        "metric": METRIC, "value": None, "unit": "frames/s",
        "vs_baseline": None,
        "error": "TPU backend unavailable for the whole bench window; "
                 + " | ".join(errors[-3:]),
    }))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner()
    else:
        outer()
