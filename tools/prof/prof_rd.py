import os, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265
from homerhevc_tpu.utils.psnr import psnr

W, H = 1280, 720
frames = list(synth_clip(W, H, 64, seed=0))
import sys
QP = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = EncoderConfig(width=W, height=H, qp=QP, cu_size=32, intra_period=100,
                    sign_hiding=True, sample_adaptive_offset=True,
                    deblocking=True, me_search_range=64,
                    performance_mode=PerformanceMode.FAST_COMPUTATION)
enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
t0 = time.perf_counter()
aus = enc.encode_frames(frames, chunk=8)
dt = time.perf_counter() - t0
stream = b"".join(aus)
n_bytes = len(stream)
kbps = n_bytes * 8 * 25 / 64 / 1000
dec = de265.decode_annexb(stream)
ps = [psnr(f[0], d[0]) for f, d in zip(frames, dec)]
sizes = [len(a) for a in aus]
print("frame sizes:", sizes)
print(json.dumps({"qp": QP, "bytes": n_bytes, "kbps": round(kbps, 1),
                  "psnr_y": round(float(np.mean(ps)), 3),
                  "fps": round(64 / dt, 2),
                  "ref": {"kbps": 1408.6, "psnr_y": 30.563, "fps": 22.69}}))
