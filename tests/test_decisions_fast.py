"""Vectorized decision derivation must equal the sequential reference walk
on randomized motion fields."""

import numpy as np

from homerhevc_tpu.ops.inter_golden import (derive_block_decisions,
                                            derive_block_decisions_fast)


def compare(nby, nbx, seed, zero_frac=0.3, dup_frac=0.3, resid_frac=0.5):
    rng = np.random.default_rng(seed)
    mvs = rng.integers(-67, 68, size=(nby, nbx, 2)).astype(np.int32)
    zm = rng.random((nby, nbx)) < zero_frac
    mvs[zm] = 0
    # duplicate some neighbors to exercise merge matches / pruning
    for r in range(nby):
        for c in range(1, nbx):
            if rng.random() < dup_frac:
                mvs[r, c] = mvs[r, c - 1]
    for r in range(1, nby):
        for c in range(nbx):
            if rng.random() < dup_frac:
                mvs[r, c] = mvs[r - 1, c]
    has_resid = rng.random((nby, nbx)) < resid_frac

    a, fa = derive_block_decisions(mvs, has_resid, 32, 5)
    b, fb = derive_block_decisions_fast(mvs, has_resid, 32, 5)
    for k in a:
        assert np.array_equal(a[k], b[k]), k
    assert np.array_equal(fa.mv, fb.mv)
    assert np.array_equal(fa.ref_idx, fb.ref_idx)


def test_random_fields():
    for seed in range(8):
        compare(6, 9, seed)


def test_all_zero_mvs():
    compare(4, 4, 0, zero_frac=1.0, resid_frac=0.0)


def test_large_field():
    compare(23, 40, 1)
