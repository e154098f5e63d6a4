"""Index-format conversion primitives.

TPU-native equivalents of the reference's native ``ind2ptr`` / ``ptr2ind`` ops
(reference: ``csrc/convert.cpp:46-48``, ``csrc/cpu/convert_cpu.cpp:22-57``,
``csrc/cuda/convert_cuda.cu:9-67``).  On TPU these are pure XLA: ``ind2ptr`` is
a ``searchsorted`` over the sorted row index array and ``ptr2ind`` is its
inverse (the reference's own benchmark notes the bucketize formulation,
``benchmark/ptr2ind.py:57-65``) — no Pallas kernel needed, XLA lowers both to
vectorized comparisons.
"""

from __future__ import annotations

import jax.numpy as jnp

INDEX_DTYPE = jnp.int32


def ind2ptr(ind: jnp.ndarray, M: int) -> jnp.ndarray:
    """Sorted COO row indices -> CSR row pointer of length ``M + 1``.

    ``ptr[i]`` is the first position ``p`` with ``ind[p] >= i`` (matching the
    reference CPU kernel ``csrc/cpu/convert_cpu.cpp:22-35``: empty rows repeat
    the previous pointer, leading gaps are 0, trailing gaps are ``len(ind)``).

    ``method='sort'``: the default binary-search lowering does log(E)
    serial 4-byte-gather passes on TPU (measured 6x slower).
    """
    ind = jnp.asarray(ind)
    targets = jnp.arange(M + 1, dtype=ind.dtype)
    return jnp.searchsorted(
        ind, targets, side="left", method="sort"
    ).astype(INDEX_DTYPE)


def ptr2ind(ptr: jnp.ndarray, E: int) -> jnp.ndarray:
    """CSR row pointer -> COO row indices of length ``E`` (inverse of
    :func:`ind2ptr`; reference ``csrc/cpu/convert_cpu.cpp:37-57``).

    Scatter M row-start markers and prefix-sum: ``row[e] = #{r >= 1 :
    ptr[r] <= e}``.  Duplicated pointers (empty rows) accumulate, so the
    count jumps past them, matching the searchsorted semantics at ~7x
    less TPU time than a binary-search lowering.
    """
    ptr = jnp.asarray(ptr)
    marks = jnp.zeros(E + 1, INDEX_DTYPE).at[ptr[1:-1]].add(1)
    return jnp.cumsum(marks[:E]).astype(INDEX_DTYPE)


def to_index_array(x):
    """Device index array via a host-side numpy cast.

    Casting with an eager device ``astype`` compiles a convert op per
    shape, which wrecks host sampling pipelines whose output sizes vary
    per batch; numpy-cast first, then a pure ``device_put``.
    """
    import numpy as _np

    if isinstance(x, jnp.ndarray):
        return x if x.dtype == INDEX_DTYPE else x.astype(INDEX_DTYPE)
    return jnp.asarray(_np.asarray(x, dtype=INDEX_DTYPE))
