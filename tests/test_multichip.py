"""Multi-chip encoder integration: a 'band' Mesh row-shards every plane and
the SAME pipeline jits run as GSPMD-partitioned programs — the stream must
be BYTE-identical to the single-device encoder (both the per-frame and the
chunked paths). Conftest provides 8 virtual CPU devices."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.utils.synth import synth_clip


def _mesh(n):
    import jax
    from jax.sharding import Mesh
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]), ("band",))


def _cfg(mode):
    return EncoderConfig(width=160, height=128, qp=32, cu_size=32,
                         intra_period=100, me_search_range=8,
                         sign_hiding=True, sample_adaptive_offset=True,
                         deblocking=True, performance_mode=mode)


@pytest.mark.parametrize("mode", [PerformanceMode.FASTEST_COMPUTATION,
                                  PerformanceMode.FAST_COMPUTATION])
def test_band_sharded_stream_byte_identical(mode):
    frames = list(synth_clip(160, 128, 4, 0))
    cfg = _cfg(mode)
    single = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    want = [single.encode_frame(*f) for f in frames]
    multi = HomerEncoder(cfg, backend="jax", fetch_recon=False,
                         mesh=_mesh(4))
    got = [multi.encode_frame(*f) for f in frames]
    assert want == got


def test_band_sharded_chunked_byte_identical():
    frames = list(synth_clip(160, 128, 7, 1))
    cfg = _cfg(PerformanceMode.FAST_COMPUTATION)
    single = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    want = single.encode_frames(frames, chunk=3)
    multi = HomerEncoder(cfg, backend="jax", fetch_recon=False,
                         mesh=_mesh(4))
    got = multi.encode_frames(frames, chunk=3)
    assert want == got


def test_wpp_shards_builds_mesh():
    """cfg.wpp_shards > 1 builds the band mesh implicitly (the round-1
    'dead knob' finding): stream still byte-identical."""
    frames = list(synth_clip(128, 96, 3, 2))
    base = EncoderConfig(width=128, height=96, qp=32, cu_size=32,
                         intra_period=100, me_search_range=8,
                         performance_mode=PerformanceMode.FAST_COMPUTATION)
    single = HomerEncoder(base, backend="jax", fetch_recon=False)
    want = [single.encode_frame(*f) for f in frames]
    import dataclasses
    sharded_cfg = dataclasses.replace(base, wpp_shards=4)
    multi = HomerEncoder(sharded_cfg, backend="jax", fetch_recon=False)
    assert multi._mesh is not None, "wpp_shards did not build a mesh"
    got = [multi.encode_frame(*f) for f in frames]
    assert want == got
