import random

import numpy as np
import pytest

from homerhevc_tpu.entropy import bitstream as bs
from homerhevc_tpu.entropy import cabac, cabac_dec, headers


def test_bitwriter_basic():
    bw = bs.BitWriter()
    bw.write(0b101, 3)
    bw.write(0b11111, 5)
    assert bw.get_bytes() == bytes([0b10111111])


def test_ue_se_roundtrip():
    bw = bs.BitWriter()
    values = [0, 1, 2, 3, 7, 100, 255, 1023]
    for v in values:
        bw.write_ue(v)
    svalues = [0, 1, -1, 2, -2, 17, -100]
    for v in svalues:
        bw.write_se(v)
    bw.align_zero()
    br = cabac_dec.BitReader(bw.get_bytes())
    for v in values:
        assert br.read_ue() == v
    for v in svalues:
        assert br.read_se() == v


def test_ebsp_escape():
    assert bs.ebsp_escape(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert bs.ebsp_escape(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert bs.ebsp_escape(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert bs.ebsp_escape(b"\x00\x00\x02\x00\x00\x03") == b"\x00\x00\x03\x02\x00\x00\x03\x03"


def test_nal_header():
    nal = bs.nal_unit(bs.NAL_IDR_W_RADL, b"\x12")
    assert nal[0] == (19 << 1)
    assert nal[1] == 1


def test_context_init_range():
    for init_type in (0, 1, 2):
        for qp in (0, 22, 32, 51):
            cs = cabac.ContextSet(init_type, qp)
            assert (cs.state >= 0).all() and (cs.state <= 62).all()
            assert ((cs.mps == 0) | (cs.mps == 1)).all()


def test_cabac_roundtrip_random():
    """Encode random bins through random contexts; decode must reproduce."""
    rng = random.Random(1234)
    n = 5000
    ops = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.6:
            ops.append(("ctx", rng.randrange(cabac.NUM_CTX), rng.randint(0, 1)))
        else:
            ops.append(("ep", None, rng.randint(0, 1)))

    bw = bs.BitWriter()
    enc_ctx = cabac.ContextSet(0, 32)
    enc = cabac.CabacEncoder(bw)
    for kind, idx, b in ops:
        if kind == "ctx":
            enc.encode_bin(enc_ctx, idx, b)
        else:
            enc.encode_bypass(b)
    enc.encode_terminate(1)
    bw.align_zero()
    data = bw.get_bytes()

    dec_ctx = cabac.ContextSet(0, 32)
    dec = cabac_dec.CabacDecoder(cabac_dec.BitReader(data))
    for kind, idx, b in ops:
        if kind == "ctx":
            assert dec.decode_bin(dec_ctx, idx) == b
        else:
            assert dec.decode_bypass() == b
    assert dec.decode_terminate() == 1
    assert (dec_ctx.state == enc_ctx.state).all()


def test_cabac_counter_tracks_encoder_states():
    rng = random.Random(7)
    bw = bs.BitWriter()
    enc_ctx = cabac.ContextSet(1, 30)
    cnt_ctx = enc_ctx.copy()
    enc = cabac.CabacEncoder(bw)
    cnt = cabac.CabacCounter()
    for _ in range(2000):
        idx = rng.randrange(cabac.NUM_CTX)
        b = rng.randint(0, 1)
        enc.encode_bin(enc_ctx, idx, b)
        cnt.encode_bin(cnt_ctx, idx, b)
    enc.encode_terminate(1)
    bw.align_zero()
    assert (enc_ctx.state == cnt_ctx.state).all()
    real_bits = len(bw.get_bytes()) * 8
    # fractional estimate should be within a few percent of actual
    assert abs(cnt.bits - real_bits) / real_bits < 0.05


def test_headers_parse_shape():
    p = headers.StreamParams(width=64, height=64, ctu_log2=5, min_cu_log2=4)
    vps = headers.write_vps(p)
    sps = headers.write_sps(p)
    pps = headers.write_pps(p)
    assert len(vps) > 4 and len(sps) > 6 and len(pps) > 2
    sh = headers.write_slice_header(
        p, slice_type=headers.SLICE_I, is_idr=True, is_irap=True, poc=0,
        slice_qp=32)
    assert sh.byte_aligned


@pytest.mark.skipif(
    not __import__("homerhevc_tpu.validate.de265", fromlist=["available"]).available(),
    reason="libde265 unavailable")
def test_de265_loads():
    from homerhevc_tpu.validate import de265
    assert de265.available()
