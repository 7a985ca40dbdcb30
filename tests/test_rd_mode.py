"""rd_mode (reference HOMER_RD_MODES, homer_hevc_enc_api.h:60-64):
RD_FULL all-35-mode search, RD_FAST coarse battery + angular refinement
(hmr_motion_intra.c:1084-1180), RD_DIST_ONLY distortion-only decisions.
All three must stay decoder-exact; FAST should land near FULL's RD point
and DIST_ONLY should spend more bits (no lambda pruning)."""

import numpy as np
import pytest

from homerhevc_tpu.api import HomerEncoder
from homerhevc_tpu.config import EncoderConfig, RDMode
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def _encode(rd, w=128, h=64, cu=32):
    y, u, v = next(synth_clip(w, h, 1, seed=5))
    cfg = EncoderConfig(width=w, height=h, qp=32, cu_size=cu, rd_mode=rd,
                        sign_hiding=True, sample_adaptive_offset=True)
    enc = HomerEncoder(cfg, backend="jax")
    au = enc.encode_frame(y, u, v)
    return au, enc.last_recon, y


@needs_decoder
@pytest.mark.parametrize("rd", [RDMode.FULL, RDMode.FAST, RDMode.DIST_ONLY])
def test_rd_mode_conformant(rd):
    au, recon, y = _encode(rd)
    dec = de265.decode_annexb(au)
    assert np.array_equal(dec[0][0], recon[0])


@needs_decoder
def test_rd_mode_ordering():
    sizes = {}
    for rd in (RDMode.FULL, RDMode.FAST, RDMode.DIST_ONLY):
        au, _, _ = _encode(rd)
        sizes[rd] = len(au)
    # FAST within 15% of FULL's bits; DIST_ONLY strictly above FULL
    assert sizes[RDMode.FAST] <= sizes[RDMode.FULL] * 1.15, sizes
    assert sizes[RDMode.DIST_ONLY] > sizes[RDMode.FULL], sizes
