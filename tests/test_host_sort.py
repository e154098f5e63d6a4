"""Native radix argsort / lexsort parity vs numpy.

The native kernels must be bit-identical to ``np.argsort(kind='stable')``
/ ``np.lexsort`` on any valid input (both are stable sorts), including
above the native crossover (32768 elements) where the radix path runs.
"""

import numpy as np
import pytest

from pytorch_sparse_tpu.csrc import bindings
from pytorch_sparse_tpu.utils.host_sort import (
    lexsort2,
    lexsort2_decode,
    stable_argsort,
)


@pytest.mark.parametrize("n", [0, 1, 2, 1000, 32768, 200_001])
@pytest.mark.parametrize("hi", [1, 3, 2**17, 2**34])
def test_stable_argsort_matches_numpy(n, hi):
    rng = np.random.RandomState(n % 7 + hi % 5)
    keys = rng.randint(0, hi, n).astype(np.int64)
    got = stable_argsort(keys)
    exp = np.argsort(keys, kind="stable")
    assert got.dtype.kind in "iu"
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("n", [0, 1, 1000, 40_000, 150_000])
@pytest.mark.parametrize("m", [1, 2, 97, 100_000])
def test_lexsort2_matches_numpy(n, m):
    rng = np.random.RandomState(3)
    row = rng.randint(0, m, n).astype(np.int64)
    col = rng.randint(0, m, n).astype(np.int64)
    got = lexsort2(row, col)
    exp = np.lexsort((col, row))
    assert np.array_equal(got, exp)
    # With the range hint (the construction-path form).
    got2 = lexsort2(row, col, secondary_range=m)
    assert np.array_equal(got2, exp)


def test_lexsort2_all_ties_is_identity():
    row = np.zeros(50_000, np.int64)
    col = np.zeros(50_000, np.int64)
    assert np.array_equal(lexsort2(row, col), np.arange(50_000))


def test_negative_keys_fall_back():
    keys = np.array([3, -1, 2, -5] * 20_000, np.int64)
    got = stable_argsort(keys)
    assert np.array_equal(got, np.argsort(keys, kind="stable"))


@pytest.mark.parametrize("n", [0, 1, 1000, 40_000, 150_000])
@pytest.mark.parametrize("m", [1, 97, 100_000])
def test_lexsort2_decode_matches_gather(n, m):
    rng = np.random.RandomState(11)
    row = rng.randint(0, m, n).astype(np.int64)
    col = rng.randint(0, m, n).astype(np.int64)
    perm, row_s, col_s = lexsort2_decode(row, col)
    exp = np.lexsort((col, row))
    assert np.array_equal(perm, exp)
    assert np.array_equal(row_s, row[exp])
    assert np.array_equal(col_s, col[exp])


def test_lexsort2_decode_preserves_dtype():
    rng = np.random.RandomState(5)
    row = rng.randint(0, 40, 50_000).astype(np.int32)
    col = rng.randint(0, 40, 50_000).astype(np.int32)
    perm, row_s, col_s = lexsort2_decode(row, col)
    assert row_s.dtype == np.int32 and col_s.dtype == np.int32
    assert np.array_equal(row_s, row[perm])


@pytest.mark.skipif(not bindings.available(), reason="native lib missing")
@pytest.mark.parametrize("n,m", [(0, 5), (1, 5), (1000, 9), (50_000, 40),
                                 (200_001, 300)])
def test_native_coalesce_family(n, m):
    rng = np.random.RandomState(n % 13 + m % 7)
    row = np.sort(rng.randint(0, m, n)).astype(np.int64)
    col = rng.randint(0, m, n).astype(np.int64)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    if n:
        keep = np.concatenate(
            [[True], (row[1:] != row[:-1]) | (col[1:] != col[:-1])]
        )
    else:
        keep = np.zeros(0, bool)
    assert bindings.sorted_has_dup(row, col) == bool((~keep[1:]).any()
                                                     if n else False)
    row2, col2, starts, seg = bindings.coalesce_fill(row, col, want_seg=True)
    assert np.array_equal(row2, row[keep])
    assert np.array_equal(col2, col[keep])
    assert np.array_equal(
        starts, np.concatenate([np.flatnonzero(keep), [n]])
    )
    assert np.array_equal(
        seg, np.cumsum(keep) - 1 if n else np.zeros(0, np.int64)
    )
    st = starts[:-1]
    for mode in ["sum", "mean", "min", "max"]:
        for shape in [(), (4,)]:
            v = rng.rand(n, *shape).astype(np.float32)
            got = bindings.segment_reduce_val(v, starts, mode)
            if n == 0:
                assert got.shape[0] == 0
                continue
            if mode == "sum":
                exp = np.add.reduceat(v, st, axis=0)
            elif mode == "mean":
                cnt = np.diff(starts).reshape((-1,) + (1,) * (v.ndim - 1))
                exp = (np.add.reduceat(v.astype(np.float64), st, axis=0)
                       / cnt).astype(v.dtype)
            elif mode == "min":
                exp = np.minimum.reduceat(v, st, axis=0)
            else:
                exp = np.maximum.reduceat(v, st, axis=0)
            assert np.allclose(got, exp, atol=1e-5), (mode, shape)


@pytest.mark.skipif(not bindings.available(), reason="native lib missing")
def test_native_radix_direct():
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 2**45, 100_000).astype(np.uint64)
    got = bindings.radix_argsort(keys)
    assert np.array_equal(got, np.argsort(keys, kind="stable"))


@pytest.mark.skipif(not bindings.available(), reason="native lib missing")
def test_segment_reduce_val_propagates_nan():
    """min/max must propagate NaN like np.minimum/np.maximum.reduceat
    (std::min/max would silently drop a NaN update)."""
    n = 40_000
    row = np.repeat(np.arange(n // 4), 4).astype(np.int64)
    col = np.zeros(n, np.int64)
    v = np.linspace(-4.0, 4.0, n).astype(np.float32)
    v[5] = np.nan     # inside segment 1 (not its first slot)
    v[8] = np.nan     # FIRST slot of segment 2
    _, _, starts, _ = bindings.coalesce_fill(row, col)
    for mode, ref in [("min", np.minimum), ("max", np.maximum)]:
        got = bindings.segment_reduce_val(v, starts, mode)
        exp = ref.reduceat(v, starts[:-1])
        assert np.isnan(got[1]) and np.isnan(got[2])
        np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
        mask = ~np.isnan(exp)
        np.testing.assert_array_equal(got[mask], exp[mask])
