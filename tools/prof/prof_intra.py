import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from homerhevc_tpu.pipeline import intra_jax
from homerhevc_tpu.utils.synth import synth_clip
y, u, v = next(synth_clip(1280, 736, 1))
for split in (True, False):
    t0 = time.perf_counter()
    out = intra_jax.encode_frame_intra(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v), B=32, qp=32,
                                       sign_hiding=True, split_rdo=split)
    np.asarray(out["recon_y"])
    t1 = time.perf_counter()
    ts = []
    for i in range(3):
        y2 = jnp.asarray(np.asarray(y) ^ np.uint8(i+1))
        np.asarray(y2[:1,:1])
        t0 = time.perf_counter()
        o = intra_jax.encode_frame_intra(y2, jnp.asarray(u), jnp.asarray(v),
                                         B=32, qp=32, sign_hiding=True,
                                         split_rdo=split)
        np.asarray(o["recon_y"])
        ts.append(time.perf_counter()-t0)
    print(f"split_rdo={split}: compile+first {t1:.1f}s warm {min(ts)*1e3:.0f} ms")
