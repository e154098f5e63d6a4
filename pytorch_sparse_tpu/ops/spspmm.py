"""Legacy tuple-API SpSpMM (reference ``torch_sparse/spspmm.py:6-33``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..tensor import SparseTensor
from .matmul import matmul


def spspmm(
    indexA: jnp.ndarray,
    valueA: Optional[jnp.ndarray],
    indexB: jnp.ndarray,
    valueB: Optional[jnp.ndarray],
    m: int,
    k: int,
    n: int,
    coalesced: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Matrix product of two COO sparse matrices."""
    A = SparseTensor(
        row=indexA[0], col=indexA[1], value=valueA, sparse_sizes=(m, k),
        is_sorted=not coalesced,
    )
    B = SparseTensor(
        row=indexB[0], col=indexB[1], value=valueB, sparse_sizes=(k, n),
        is_sorted=not coalesced,
    )
    C = matmul(A, B)
    row, col, value = C.coo()
    return jnp.stack([row, col], axis=0), value
