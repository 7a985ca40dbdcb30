"""Public API + CLI: streaming session, conformance-window padding, rate
control, and the console app surface."""

import os
import subprocess
import sys

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import BitrateMode, EncoderConfig
from homerhevc_tpu.utils.synth import synth_clip, write_yuv
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


@needs_decoder
def test_streaming_session_odd_size():
    """Non-CTU-multiple frame size: conformance window crop must hold."""
    w, h = 120, 52            # not multiples of 32
    cfg = EncoderConfig(width=w, height=h, cu_size=32, qp=30, intra_period=0)
    frames = list(synth_clip(w, h, 4, 2))
    enc = HomerEncoder(cfg, backend="jax")
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    recons = []
    for f in frames:
        pass
    dec = de265.decode_annexb(stream)
    assert len(dec) == 4
    assert dec[0][0].shape == (h, w)


@needs_decoder
def test_streaming_matches_recon():
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, cu_size=32, qp=32, intra_period=0)
    frames = list(synth_clip(w, h, 3, 0))
    enc = HomerEncoder(cfg, backend="jax")
    aus, recs = [], []
    for f in frames:
        aus.append(enc.encode_frame(*f))
        recs.append(enc.last_recon)
    dec = de265.decode_annexb(b"".join(aus))
    for df, rf in zip(dec, recs):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)


@needs_decoder
def test_rate_control_cbr():
    w, h = 96, 64
    kbps = 200
    cfg = EncoderConfig(width=w, height=h, cu_size=32, frame_rate=25,
                        bitrate_mode=BitrateMode.CBR, bitrate=kbps,
                        vbv_size=kbps, vbv_init=kbps // 2, intra_period=0)
    frames = list(synth_clip(w, h, 20, 1))
    enc = HomerEncoder(cfg, backend="jax")
    aus = [enc.encode_frame(*f) for f in frames]
    de265.decode_annexb(b"".join(aus))          # must stay conformant
    total_bits = sum(len(a) * 8 for a in aus)
    achieved_kbps = total_bits * 25 / len(aus) / 1000
    assert 0.5 * kbps < achieved_kbps < 2.0 * kbps, achieved_kbps


@needs_decoder
def test_cli_app(tmp_path):
    w, h, n = 96, 64, 3
    yuv = tmp_path / "in.yuv"
    write_yuv(str(yuv), w, h, n, seed=4)
    out = tmp_path / "out.265"
    raw = tmp_path / "rec.yuv"
    r = subprocess.run(
        [sys.executable, "homer_app.py", "-i", str(yuv), "-o", str(out),
         "-o-raw", str(raw), "-widthxheight", f"{w}x{h}", "-qp", "33",
         "-cu_size", "32", "-n_frames", str(n), "-backend", "jax"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fps" in r.stdout
    dec = de265.decode_annexb(out.read_bytes())
    assert len(dec) == n
    rec = np.fromfile(raw, np.uint8)
    assert rec.size == n * w * h * 3 // 2
    # decoder output == recon dump
    first = rec[:w * h].reshape(h, w)
    assert np.array_equal(dec[0][0], first)
