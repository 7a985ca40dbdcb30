"""Cross-pipeline determinism: the batched JAX P pipeline and the numpy
golden P encoder must produce bit-identical streams (SURVEY.md §4: sharded/
batched paths validated against the single-device oracle)."""

import numpy as np
import pytest

from homerhevc_tpu.pipeline import gop
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265


def test_jax_matches_golden_stream():
    frames = list(synth_clip(96, 64, 4, 0))
    a = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=True,
                        search=8, backend="golden")
    b = gop.encode_ippp(frames, qp=32, ctu_log2=5, deblocking=True,
                        search=8, backend="jax")
    assert a.stream == b.stream
    for ra, rb in zip(a.recons, b.recons):
        for pa, pb in zip(ra, rb):
            assert np.array_equal(pa, pb)


@pytest.mark.skipif(not de265.available(), reason="libde265 missing")
def test_jax_backend_conformance():
    frames = list(synth_clip(64, 64, 3, 4))
    res = gop.encode_ippp(frames, qp=27, ctu_log2=5, deblocking=True,
                          search=8, backend="jax")
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == 3
    for df, rf in zip(dec, res.recons):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)
