import numpy as np

from homerhevc_tpu import tables


def test_dct4_matches_spec():
    expected = np.array([[64, 64, 64, 64],
                         [83, 36, -36, -83],
                         [64, -64, -64, 64],
                         [36, -83, 83, -36]])
    assert (tables.dct_matrix(4) == expected).all()


def test_dct8_matches_spec():
    expected = np.array([
        [64, 64, 64, 64, 64, 64, 64, 64],
        [89, 75, 50, 18, -18, -50, -75, -89],
        [83, 36, -36, -83, -83, -36, 36, 83],
        [75, -18, -89, -50, 50, 89, 18, -75],
        [64, -64, -64, 64, 64, -64, -64, 64],
        [50, -89, 18, 75, -75, -18, 89, -50],
        [36, -83, 83, -36, -36, 83, -83, 36],
        [18, -50, 75, -89, 89, -75, 50, -18]])
    assert (tables.dct_matrix(8) == expected).all()


def test_dct_nesting():
    """Spec 8.6.4.2: smaller matrices are row-subsampled from the 32-point."""
    t32 = tables.dct_matrix(32)
    for n in (4, 8, 16):
        tn = tables.dct_matrix(n)
        assert (tn == t32[:: 32 // n, :n]).all()


def test_dct_near_orthogonal():
    for n in (4, 8, 16, 32):
        t = tables.dct_matrix(n).astype(np.int64)
        g = t @ t.T
        # diagonal ~ n * 64^2 / (n/4)... just require strong diagonal dominance
        assert np.abs(g - np.diag(np.diag(g))).max() < np.diag(g).min() * 0.01


def test_diag_scan_4x4():
    s = tables.scan_order(4, tables.SCAN_DIAG)
    # spec 6.5.3 up-right diagonal: (0,0),(0,1),(1,0),(0,2),(1,1),(2,0),...
    assert s[:6].tolist() == [[0, 0], [0, 1], [1, 0], [0, 2], [1, 1], [2, 0]]
    assert len(np.unique(s[:, 1] * 4 + s[:, 0])) == 16


def test_coeff_scan_sizes():
    for log2 in (2, 3, 4, 5):
        for scan in (0, 1, 2):
            if log2 > 3 and scan != 0:
                continue
            cs = tables.coeff_scan(log2, scan)
            n = 1 << (2 * log2)
            assert len(cs) == n
            assert len(np.unique(cs)) == n


def test_zscan_roundtrip():
    for log2 in (1, 2, 3, 4):
        z2r = tables.zscan_to_raster(log2)
        r2z = tables.raster_to_zscan(log2)
        assert (r2z[z2r] == np.arange(len(z2r))).all()
    # 2x2: z-order is raster for the top row then bottom row
    assert tables.zscan_to_raster(1).tolist() == [0, 1, 2, 3]
    # 4x4 z-order first quad: 0,1,4,5
    assert tables.zscan_to_raster(2)[:4].tolist() == [0, 1, 4, 5]


def test_chroma_qp_table():
    assert tables.chroma_qp_from_luma(20) == 20
    assert tables.chroma_qp_from_luma(30) == 29
    assert tables.chroma_qp_from_luma(33) == 32
    assert tables.chroma_qp_from_luma(43) == 37
    assert tables.chroma_qp_from_luma(45) == 39


def test_intra_angles():
    assert tables.INTRA_PRED_ANGLE[2] == 32
    assert tables.INTRA_PRED_ANGLE[10] == 0
    assert tables.INTRA_PRED_ANGLE[18] == -32
    assert tables.INTRA_PRED_ANGLE[26] == 0
    assert tables.INTRA_PRED_ANGLE[34] == 32
    assert tables.INV_ANGLE[18] == -256
    assert tables.INV_ANGLE[11] == -4096
