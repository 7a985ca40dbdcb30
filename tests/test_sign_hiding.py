"""Sign-data hiding: JAX twin equals golden, and SBH streams decode
bit-exactly (libde265 applies the normative sign inference — a full
cross-check of parity forcing + syntax hiding)."""

import numpy as np
import pytest

from homerhevc_tpu import tables
from homerhevc_tpu.ops import golden
from homerhevc_tpu.pipeline import gop
from homerhevc_tpu.utils.synth import synth_clip
from homerhevc_tpu.validate import de265

needs_decoder = pytest.mark.skipif(not de265.available(),
                                   reason="libde265 missing")


def test_jax_matches_golden_random():
    import jax.numpy as jnp

    from homerhevc_tpu.ops import quant as quant_ops

    rng = np.random.default_rng(0)
    for log2 in (4, 5):
        n = 1 << log2
        qp = 30
        coeff = rng.integers(-20000, 20000, size=(6, n, n)).astype(np.int32)
        # sparsify so groups have realistic gaps
        coeff[rng.random(coeff.shape) < 0.85] = 0
        lev = golden.quantize(coeff, qp, log2, is_intra=False)
        scan = tables.coeff_scan(log2, tables.SCAN_DIAG)
        want = np.zeros_like(lev)
        for b in range(lev.shape[0]):
            ls = lev[b].reshape(-1)[scan]
            cs = coeff[b].reshape(-1)[scan]
            adj = golden.sign_bit_hiding(ls, cs, qp, log2, is_intra=False)
            flat = np.zeros(n * n, np.int32)
            flat[scan] = adj
            want[b] = flat.reshape(n, n)
        got = np.asarray(quant_ops.sign_bit_hiding(
            jnp.asarray(lev), jnp.asarray(coeff), qp, log2))
        assert np.array_equal(want, got), log2


@needs_decoder
def test_sbh_conformance_ippp():
    frames = list(synth_clip(96, 64, 4, 7))
    res = gop.encode_ippp(frames, qp=30, ctu_log2=5, deblocking=True,
                          search=8, sign_hiding=True, backend="jax")
    dec = de265.decode_annexb(res.stream)
    assert len(dec) == 4
    for df, rf in zip(dec, res.recons):
        for d, r in zip(df, rf):
            assert np.array_equal(d, r)


@needs_decoder
def test_sbh_backends_identical():
    frames = list(synth_clip(64, 64, 2, 2))
    a = gop.encode_ippp(frames, qp=26, ctu_log2=5, deblocking=False,
                        search=8, sign_hiding=True, backend="golden")
    b = gop.encode_ippp(frames, qp=26, ctu_log2=5, deblocking=False,
                        search=8, sign_hiding=True, backend="jax")
    assert a.stream == b.stream
    de265.decode_annexb(a.stream)
