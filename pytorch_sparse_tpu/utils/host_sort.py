"""Host-side stable sorts backed by the native radix kernels.

``np.lexsort`` is the hottest host operation on the construction /
csr2csc / hybrid-build paths (full-Reddit construction spends minutes
in it); the native 11-bit LSD radix argsort (csrc/native.cpp
``radix_argsort_u64`` / ``lexsort_i64_pair``) is 7-9x faster on one
core, OpenMP-scaled on real hosts, and bit-identical (both sorts are
stable).  The reference accelerates the same operation with optional
``pyg_lib.ops.index_sort`` (``torch_sparse/utils.py:14-21``).

All helpers fall back to numpy when the shared object is missing, the
input is small (native crossover ~32K elements), the dtype is not
integral, or any value is negative.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..csrc import bindings as _b

# Below this, numpy's sort wins (ctypes + histogram setup overhead).
_NATIVE_MIN = 32768


def stable_argsort(keys: np.ndarray) -> np.ndarray:
    """``np.argsort(keys, kind="stable")`` for integer keys."""
    if (
        _b.available()
        and keys.ndim == 1
        and keys.shape[0] >= _NATIVE_MIN
        and keys.dtype.kind in "iu"
        and (keys.dtype.kind == "u" or int(keys.min()) >= 0)
    ):
        return _b.radix_argsort(keys.astype(np.uint64, copy=False))
    return np.argsort(keys, kind="stable")


def _pair_range(
    primary: np.ndarray,
    secondary: np.ndarray,
    secondary_range: Optional[int],
) -> Optional[int]:
    """Validated exclusive bound for the combined radix key, or None if
    the native key encoding does not apply (negatives / overflow)."""
    if secondary_range is None:
        smin = int(secondary.min())
        srange = int(secondary.max()) + 1
    else:
        smin = 0 if secondary.dtype.kind == "u" else int(secondary.min())
        srange = int(secondary_range)
    pmin = 0 if primary.dtype.kind == "u" else int(primary.min())
    pmax = int(primary.max())
    # Combined key pmax*srange + (srange-1) must fit uint64.
    if (
        smin >= 0
        and pmin >= 0
        and srange > 0
        and pmax <= ((1 << 64) - srange) // srange
    ):
        return srange
    return None


def lexsort2(
    primary: np.ndarray,
    secondary: np.ndarray,
    secondary_range: Optional[int] = None,
) -> np.ndarray:
    """``np.lexsort((secondary, primary))``: stable order by ``primary``,
    ties by ``secondary``, for non-negative integer arrays.

    ``secondary_range`` (exclusive upper bound on ``secondary``, e.g. the
    column count N) skips one max-scan when the caller already knows it.
    """
    n = primary.shape[0]
    if (
        _b.available()
        and n >= _NATIVE_MIN
        and primary.dtype.kind in "iu"
        and secondary.dtype.kind in "iu"
    ):
        srange = _pair_range(primary, secondary, secondary_range)
        if srange is not None:
            return _b.lexsort_pair(primary, secondary, srange)
    return np.lexsort((secondary, primary))


def lexsort2_decode(
    primary: np.ndarray,
    secondary: np.ndarray,
    secondary_range: Optional[int] = None,
):
    """``lexsort2`` + the sorted arrays: returns
    ``(perm, primary[perm], secondary[perm])``.

    On the native path the sorted arrays are DECODED from the sorted
    radix keys — one sequential sweep instead of two random gathers
    (memory-latency-bound, ~16 s each at 160M edges); output dtypes
    follow the inputs.
    """
    n = primary.shape[0]
    if (
        _b.available()
        and n >= _NATIVE_MIN
        and primary.dtype.kind in "iu"
        and secondary.dtype.kind in "iu"
    ):
        srange = _pair_range(primary, secondary, secondary_range)
        if srange is not None:
            perm, p_s, s_s = _b.lexsort_pair_decode(
                primary, secondary, srange
            )
            return (
                perm,
                p_s.astype(primary.dtype, copy=False),
                s_s.astype(secondary.dtype, copy=False),
            )
    perm = np.lexsort((secondary, primary))
    return perm, primary[perm], secondary[perm]
