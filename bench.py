"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Headline today: all-intra 720p device-pipeline frames/s on one chip
(BASELINE.md config #1). vs_baseline compares against the measured
HomerHEVC-SSE42 Release fps on the eval host (BASELINE_MEASURED.json,
intra_fast = same operating point).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from homerhevc_tpu.pipeline.intra_jax import encode_frame_intra
    from homerhevc_tpu.utils.synth import synth_clip

    B, QP = 32, 32
    W, H = 1280, 720
    HP = -(-H // B) * B           # padded height (736)
    N_WARM, N_BENCH = 2, 16

    frames = []
    for y, u, v in synth_clip(W, H, N_WARM + N_BENCH, seed=0):
        yp = np.zeros((HP, W), np.uint8)
        yp[:H] = y
        yp[H:] = y[H - 1]
        up = np.zeros((HP // 2, W // 2), np.uint8)
        up[:H // 2] = u
        up[H // 2:] = u[H // 2 - 1]
        vp = np.zeros_like(up)
        vp[:H // 2] = v
        vp[H // 2:] = v[H // 2 - 1]
        frames.append((jnp.asarray(yp), jnp.asarray(up), jnp.asarray(vp)))

    def step(y, u, v):
        return encode_frame_intra(y, u, v, B=B, qp=QP)

    for f in frames[:N_WARM]:
        jax.block_until_ready(step(*f))

    t0 = time.perf_counter()
    outs = [step(*f) for f in frames[N_WARM:]]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = N_BENCH / dt

    try:
        with open("BASELINE_MEASURED.json") as fh:
            base = json.load(fh)["configs"]["intra_fast"]["fps"]
    except Exception:
        base = None
    print(json.dumps({
        "metric": "intra_720p_device_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3) if base else None,
    }))


if __name__ == "__main__":
    main()
