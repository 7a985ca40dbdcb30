"""Intra one-level CU quadtree RDO: conformance (decoder walks the signaled
quadtree and must reproduce our recon) and quality improvement."""

import numpy as np
import pytest

from homerhevc_tpu.pipeline import gop
from homerhevc_tpu.utils.psnr import psnr
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


@needs_decoder
def test_split_conformance_with_deblock():
    frames = list(synth_clip(96, 64, 1, 3))
    res = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=True,
                          intra_period=1, intra_split_rdo=True, backend="jax")
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == 1
    for name, d, r in zip("yuv", dec[0], res.recons[0]):
        assert np.array_equal(d, r), name


@needs_decoder
def test_split_actually_splits_and_improves():
    # sharp diagonal structure: 16x16 CUs with per-quadrant modes must win
    # somewhere and quality-per-bit should not regress.
    frames = list(synth_clip(128, 96, 1, 11))
    on = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=False,
                         intra_period=1, intra_split_rdo=True, backend="jax")
    off = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=False,
                          intra_period=1, intra_split_rdo=False,
                          backend="jax")
    de265.decode_annexb(on.stream)
    y = frames[0][0]
    p_on = psnr(y, on.recons[0][0])
    p_off = psnr(y, off.recons[0][0])
    # split must help distortion (it can spend more bits; cost-controlled)
    assert p_on >= p_off - 0.01, (p_on, p_off)


@needs_decoder
def test_split_ippp_and_sbh():
    frames = list(synth_clip(96, 64, 3, 5))
    res = gop.encode_ippp(frames, qp=30, ctu_log2=5, deblocking=True,
                          search=8, sign_hiding=True, intra_split_rdo=True,
                          backend="jax")
    dec = de265.decode_annexb(res.stream)
    for df, rf in zip(dec, res.recons):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)
