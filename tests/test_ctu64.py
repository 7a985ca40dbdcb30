"""CTU-64 (the reference's default cu_size): inter CUs at 64 with implicit
TU splitting, intra 32/16 quadtree inside 64-CTUs with decoder z-order
availability. All decoder-validated."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def run(w, h, n, qp, seed=0, **cfg_kw):
    cfg = EncoderConfig(width=w, height=h, cu_size=64, qp=qp, intra_period=0,
                        **cfg_kw)
    frames = list(synth_clip(w, h, n, seed))
    enc = HomerEncoder(cfg, backend="jax")
    aus, recs = [], []
    for f in frames:
        aus.append(enc.encode_frame(*f))
        recs.append(enc.last_recon)
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == n
    for t, (df, rf) in enumerate(zip(dec, recs)):
        for name, d, r in zip("yuv", df, rf):
            assert np.array_equal(d, r), f"frame {t} {name}"
    return aus


@needs_decoder
def test_ctu64_intra_only():
    run(128, 128, 1, 32, seed=3, deblocking=False,
        sample_adaptive_offset=False)


@needs_decoder
def test_ctu64_ippp_deblock():
    run(128, 128, 4, 32, seed=1, deblocking=True,
        sample_adaptive_offset=False)


@needs_decoder
def test_ctu64_all_tools():
    run(192, 128, 3, 33, seed=5, deblocking=True, sign_hiding=True,
        sample_adaptive_offset=True)


@needs_decoder
def test_ctu64_smaller_bits_on_static():
    # static content: 64-CTUs quarter the skip-flag count vs 32
    frames = [next(synth_clip(128, 128, 1, 0))] * 4
    outs = {}
    for cu in (32, 64):
        cfg = EncoderConfig(width=128, height=128, cu_size=cu, qp=32,
                            intra_period=0, deblocking=True)
        enc = HomerEncoder(cfg, backend="jax")
        outs[cu] = sum(len(enc.encode_frame(*f)) for f in frames[1:]
                       if not enc.poc or True) if False else None
        enc2 = HomerEncoder(cfg, backend="jax")
        aus = [enc2.encode_frame(*f) for f in frames]
        outs[cu] = sum(len(a) for a in aus[1:])      # P frames only
    assert outs[64] <= outs[32]
