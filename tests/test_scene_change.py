"""Scene-change detection: a hard cut mid-sequence forces an IDR + GOP
reinit (role of hmr_motion_inter.c:3791-3806 + hmr_rc_change_pic_mode)."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def cut_clip(w, h):
    a = list(synth_clip(w, h, 3, seed=0))
    rng = np.random.default_rng(99)
    b = []
    for y, u, v in synth_clip(w, h, 2, seed=7):
        # radically different content: inverted + noise
        y2 = np.clip(255 - y.astype(np.int32)
                     + rng.integers(-30, 31, y.shape), 0, 255).astype(np.uint8)
        b.append((y2, u[::-1].copy(), v[::-1].copy()))
    return a + b


@needs_decoder
def test_scene_cut_forces_idr():
    w, h = 96, 64
    frames = cut_clip(w, h)
    cfg = EncoderConfig(width=w, height=h, cu_size=32, qp=32, intra_period=0,
                        reinit_gop_on_scene_change=True)
    enc = HomerEncoder(cfg, backend="jax")
    aus, recs, nals = [], [], []
    for f in frames:
        aus.append(enc.encode_frame(*f))
        recs.append(enc.last_recon)
        # NAL type of the slice NALU (last NAL in the AU)
        nals.append(aus[-1][-len(aus[-1]) + aus[-1].rfind(b"\x00\x00\x00\x01") + 4] >> 1)
    assert nals[0] == 19                  # first frame IDR
    assert nals[3] == 19, nals            # cut frame re-encoded as IDR
    assert all(n == 1 for n in (nals[1], nals[2], nals[4])), nals
    dec = de265.decode_annexb(b"".join(aus))
    assert len(dec) == len(frames)
    for df, rf in zip(dec, recs):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)


@needs_decoder
def test_no_false_positive_on_pan():
    w, h = 96, 64
    frames = list(synth_clip(w, h, 4, seed=1))
    cfg = EncoderConfig(width=w, height=h, cu_size=32, qp=32, intra_period=0,
                        reinit_gop_on_scene_change=True)
    enc = HomerEncoder(cfg, backend="jax")
    aus = [enc.encode_frame(*f) for f in frames]
    nal_types = []
    for au in aus:
        p = au.rfind(b"\x00\x00\x00\x01")
        nal_types.append(au[p + 4] >> 1)
    assert nal_types[0] == 19
    assert all(t == 1 for t in nal_types[1:]), nal_types
