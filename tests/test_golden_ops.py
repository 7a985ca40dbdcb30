import numpy as np

from homerhevc_tpu.ops import golden


def test_forward_inverse_transform_roundtrip():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        res = rng.integers(-255, 256, size=(n, n)).astype(np.int32)
        c = golden.forward_transform(res)
        rec = golden.inverse_transform(c)
        # The integer transform pair is near-lossless without quantisation
        # (not exactly orthogonal; worst-case error grows with size).
        assert np.abs(rec - res).max() <= 4, n


def test_dst_roundtrip():
    rng = np.random.default_rng(1)
    res = rng.integers(-255, 256, size=(4, 4)).astype(np.int32)
    c = golden.forward_transform(res, is_dst=True)
    rec = golden.inverse_transform(c, is_dst=True)
    assert np.abs(rec - res).max() <= 2


def test_quant_dequant_roundtrip():
    rng = np.random.default_rng(2)
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        res = rng.integers(-200, 201, size=(n, n)).astype(np.int32)
        c = golden.forward_transform(res)
        for qp in (0, 22, 32, 51):
            lev = golden.quantize(c, qp, log2, is_intra=True)
            deq = golden.dequantize(lev, qp, log2)
            # dequantised coefficient should approximate the original
            step = 2 ** (qp / 6)
            tol = max(64.0, step * 50)
            assert np.abs(deq - c).max() <= tol * 16, (log2, qp)


def test_quant_zero_at_high_qp():
    res = np.ones((8, 8), dtype=np.int32)
    c = golden.forward_transform(res)
    lev = golden.quantize(c, 51, 3, is_intra=True)
    assert np.abs(lev).sum() <= 1


def test_dc_prediction():
    top = np.full(16, 100, np.int32)
    left = np.full(16, 50, np.int32)
    pred = golden.predict_intra(8, 1, top, left, 80, 0)
    # interior DC = (8*100 + 8*50 + 8) >> 4 = 75
    assert pred[4, 4] == 75
    # filtered first row: (100 + 3*75 + 2) >> 2 = 81
    assert pred[0, 4] == 81


def test_planar_flat():
    top = np.full(16, 128, np.int32)
    left = np.full(16, 128, np.int32)
    pred = golden.predict_intra(8, 0, top, left, 128, 0)
    assert (pred == 128).all()


def test_angular_pure_vertical():
    top = np.arange(16, dtype=np.int32) * 3 + 10
    left = np.full(16, 7, np.int32)
    pred = golden.predict_intra(8, 26, top, left, 10, 1)  # chroma: no filter
    for y in range(8):
        assert (pred[y] == top[:8]).all()


def test_angular_pure_horizontal():
    top = np.full(16, 7, np.int32)
    left = np.arange(16, dtype=np.int32) * 2 + 5
    pred = golden.predict_intra(8, 10, top, left, 9, 1)
    for x in range(8):
        assert (pred[:, x] == left[:8]).all()


def test_angular_mode2_diag():
    # mode 2: angle +32, horizontal family -> pred[x][y] = left[x+y+1]
    top = np.full(16, 0, np.int32)
    left = np.arange(16, dtype=np.int32) * 5
    pred = golden.predict_intra(8, 2, top, left, 0, 1)
    for y in range(8):
        for x in range(8):
            assert pred[y, x] == left[x + y + 1]


def test_reference_substitution():
    top = np.zeros(8, np.int32)
    left = np.arange(8, dtype=np.int32) + 10
    t, l, c = golden.fill_reference_samples(
        4, top, left, 99,
        np.zeros(8, bool), np.ones(8, bool), False)
    # corner takes left[0]; top takes corner value propagated
    assert c == 10
    assert (t == 10).all()
    assert (l == left).all()


def test_reference_substitution_all_missing():
    t, l, c = golden.fill_reference_samples(
        4, np.zeros(8, np.int32), np.zeros(8, np.int32), 0,
        np.zeros(8, bool), np.zeros(8, bool), False)
    assert c == 128 and (t == 128).all() and (l == 128).all()
