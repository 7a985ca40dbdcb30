import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.utils.synth import synth_clip

W, H, QP = 1280, 720, 32
CHUNK = 8
frames = list(synth_clip(W, H, 1 + 2*CHUNK, seed=0))
cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32,
                    intra_period=100, sign_hiding=True,
                    sample_adaptive_offset=True, deblocking=True,
                    me_search_range=16,
                    performance_mode=PerformanceMode.FAST_COMPUTATION)
enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
t0=time.perf_counter(); enc.encode_frame(*frames[0]); print("IDR", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter(); aus = enc.encode_frames(frames[1:1+CHUNK], chunk=CHUNK); print("chunk1(compile)", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter(); aus = enc.encode_frames(frames[1+CHUNK:], chunk=CHUNK); dt=time.perf_counter()-t0
print("chunk2(warm)", round(dt,3), "fps", round(CHUNK/dt,2), flush=True)
