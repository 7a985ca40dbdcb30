"""Device B-frame pipeline: bit-identical to the golden B encoder, byte-
identical IBP streams, and streaming (push_frame) IBP through the public
API — decode-verified via libde265."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.pipeline import b_golden, b_jax, gop
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def test_b_device_matches_golden_arrays():
    import jax.numpy as jnp
    frames = list(synth_clip(96, 64, 3, seed=1))
    (y0, u0, v0), (y1, u1, v1), (y2, u2, v2) = frames
    gp = b_golden.encode_b_frame(y1, u1, v1, frames[0], frames[2], qp=32,
                                 ctu_log2=5, search=8, me_precision=2,
                                 sign_hiding=True, poc=1, poc_refs=(0, 2))
    out = b_jax.b_frame_device(
        jnp.asarray(y1), jnp.asarray(u1), jnp.asarray(v1),
        jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(v0),
        jnp.asarray(y2), jnp.asarray(u2), jnp.asarray(v2),
        B=32, qp=32, search=8, me_precision=2, sign_hiding=True)
    rec = (np.asarray(out["rec_y"]).transpose(0, 2, 1, 3)
           .reshape(64, 96).astype(np.uint8))
    assert np.array_equal(rec, gp.recon[0])
    plan = b_golden.build_b_plans(
        np.asarray(out["idc"]), np.asarray(out["mv0"]),
        np.asarray(out["mv1"]), np.asarray(out["lev_y"]),
        np.asarray(out["lev_u"]), np.asarray(out["lev_v"]), gp.recon,
        size=32, poc=1, poc_refs=(0, 2))
    for pa, pb in zip(plan.ctu_plans, gp.ctu_plans):
        for k in ("coeff_y", "skip", "merge_flag", "merge_idx", "mvd",
                  "mvp_idx", "inter_dir", "mvd_l1", "mvp_idx_l1"):
            assert np.array_equal(getattr(pa, k), getattr(pb, k)), k


@needs_decoder
def test_ibp_jax_backend_byte_identical():
    frames = list(synth_clip(96, 64, 6, seed=1))
    a = gop.encode_ibp(frames, qp=32, ctu_log2=5, deblocking=True, search=8,
                       sign_hiding=True, backend="golden")
    b = gop.encode_ibp(frames, qp=32, ctu_log2=5, deblocking=True, search=8,
                       sign_hiding=True, backend="jax")
    assert a.stream == b.stream
    dec = de265.decode_annexb(b.stream)
    assert len(dec) == 6
    for k in range(6):
        assert np.array_equal(dec[k][0], b.recons[k][0]), k


@needs_decoder
@pytest.mark.parametrize("intra_period", [0, 4])
def test_streaming_ibp_decodes(intra_period):
    W, H = 128, 96
    frames = list(synth_clip(W, H, 9, seed=2))     # odd -> flush trailing P
    cfg = EncoderConfig(width=W, height=H, qp=32, cu_size=32, gop_size=2,
                        intra_period=intra_period, sign_hiding=True,
                        sample_adaptive_offset=False, deblocking=True,
                        me_search_range=8,
                        performance_mode=PerformanceMode.FASTEST_COMPUTATION)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    aus = []
    for f in frames:
        aus.extend(enc.push_frame(*f))
    aus.extend(enc.flush())
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == len(frames)


@needs_decoder
def test_streaming_ibp_b_bits_ratio():
    """RC B rule: with rate control on, B frames should average well under
    the anchor P frames (reference rule ~avg/2, hmr_rate_control.c:89)."""
    from homerhevc_tpu.config import BitrateMode
    W, H = 128, 96
    frames = list(synth_clip(W, H, 13, seed=0))
    cfg = EncoderConfig(width=W, height=H, qp=32, cu_size=32, gop_size=2,
                        intra_period=0, sign_hiding=True,
                        sample_adaptive_offset=False, deblocking=True,
                        me_search_range=8, bitrate_mode=BitrateMode.VBR,
                        bitrate=400_000, frame_rate=25,
                        performance_mode=PerformanceMode.FASTEST_COMPUTATION)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    p_sizes, b_sizes = [], []
    disp = 0
    for f in frames:
        for au in enc.push_frame(*f):
            pass
        disp += 1
    # frame_bytes records in decode order: I, P, B, P, B ...
    fb = enc.frame_bytes
    anchors = fb[1::2][:4]
    bs = fb[2::2][:4]
    dec = de265.decode_annexb(b"".join([]))  # no-op guard
    assert np.mean(bs) < np.mean(anchors), (anchors, bs)
