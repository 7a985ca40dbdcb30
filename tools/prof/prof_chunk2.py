import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.utils.profiler import Profiler
from homerhevc_tpu.utils.synth import synth_clip

W, H, QP = 1280, 720, 32
CHUNK = 8
N = 4 * CHUNK
frames = list(synth_clip(W, H, 1 + CHUNK + N, seed=0))
cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32,
                    intra_period=100, sign_hiding=True,
                    sample_adaptive_offset=True, deblocking=True,
                    me_search_range=64,
                    performance_mode=PerformanceMode.FAST_COMPUTATION)
prof = Profiler()
enc = HomerEncoder(cfg, backend="jax", fetch_recon=False, profiler=prof)
enc.encode_frame(*frames[0])
enc.encode_frames(frames[1:1+CHUNK], chunk=CHUNK)   # warm
prof.acc.clear(); prof.count.clear()
t0 = time.perf_counter()
aus = enc.encode_frames(frames[1+CHUNK:], chunk=CHUNK)
dt = time.perf_counter() - t0
print("fps", round(N/dt, 2), "for", N, "frames", flush=True)
print(prof.report())
