"""Broadcast / sparse-sparse (intersection) multiplication
(reference ``torch_sparse/mul.py``).

Sparse * sparse keeps only positions present in *both* operands: concat the
two coalesced COO lists, stable-sort by (row, col), and multiply adjacent
duplicates (reference ``mul.py:42-80``).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from ..tensor import SparseTensor
from ..utils.index_sort import lexsort_rows
from .add import _broadcast_nnz
from ..utils.host_sort import lexsort2_decode


def mul(
    src: SparseTensor, other: Union[jnp.ndarray, SparseTensor]
) -> SparseTensor:
    if isinstance(other, SparseTensor):
        if not src.is_coalesced():
            raise ValueError("sparse*sparse mul needs a coalesced `src` "
                             "(call src.coalesce() first)")
        if not other.is_coalesced():
            raise ValueError("sparse*sparse mul needs a coalesced `other` "
                             "(call other.coalesce() first)")

        valueA = src.storage.value()
        valueB = other.storage.value()
        if valueA is None or valueB is None:
            raise ValueError("sparse*sparse mul needs explicit values on "
                             "both operands")

        M = max(src.sparse_size(0), other.sparse_size(0))
        N = max(src.sparse_size(1), other.sparse_size(1))

        hrA = src.storage.numpy_view_cached("row")
        hcA = src.storage.numpy_view_cached("col")
        hrB = other.storage.numpy_view_cached("row")
        hcB = other.storage.numpy_view_cached("col")
        if all(a is not None for a in (hrA, hcA, hrB, hcB)):
            # Intersection on host views; one device gather pair for the
            # value product (remote-TPU: device sorts recompile per shape).
            import numpy as np

            row = np.concatenate([hrA, hrB])
            col = np.concatenate([hcA, hcB])
            perm, row, col = lexsort2_decode(row, col)
            dup = np.concatenate(
                [[False], (row[1:] == row[:-1]) & (col[1:] == col[:-1])]
            )
            idx = np.flatnonzero(dup)
            value_cat = jnp.concatenate([valueA, valueB])
            vleft = value_cat[jnp.asarray(perm[idx - 1])]
            vright = value_cat[jnp.asarray(perm[idx])]
            return SparseTensor(
                row=row[idx], col=col[idx], value=vleft * vright,
                sparse_sizes=(M, N), is_sorted=True, trust_data=True,
            )

        rowA, colA, _ = src.coo()
        rowB, colB, _ = other.coo()
        row = jnp.concatenate([rowA, rowB])
        col = jnp.concatenate([colA, colB])
        value = jnp.concatenate([valueA, valueB])

        perm = lexsort_rows(row, col)
        row, col, value = row[perm], col[perm], value[perm]
        # Duplicate detection: position i duplicates i-1 -> present in both.
        dup = jnp.concatenate(
            [jnp.zeros((1,), bool),
             (row[1:] == row[:-1]) & (col[1:] == col[:-1])]
        )
        idx = jnp.nonzero(dup)[0]  # eager: data-dependent size
        return SparseTensor(
            row=row[idx], col=col[idx], value=value[idx - 1] * value[idx],
            sparse_sizes=(M, N), is_sorted=True, trust_data=True,
        )

    per_nnz = _broadcast_nnz(src, other)
    value = src.storage.value()
    if value is not None:
        value = per_nnz.astype(value.dtype) * value
    else:
        value = per_nnz
    return src.set_value(value, layout="coo")


mul_ = mul


def mul_nnz(
    src: SparseTensor, other: jnp.ndarray, layout: Optional[str] = None
) -> SparseTensor:
    value = src.storage.value()
    other = jnp.asarray(other)
    if value is not None:
        value = value * other.astype(value.dtype)
    else:
        value = other
    return src.set_value(value, layout=layout)


mul_nnz_ = mul_nnz

SparseTensor.mul = lambda self, other: mul(self, other)
SparseTensor.mul_ = lambda self, other: mul_(self, other)
SparseTensor.mul_nnz = lambda self, other, layout=None: mul_nnz(
    self, other, layout)
SparseTensor.mul_nnz_ = lambda self, other, layout=None: mul_nnz_(
    self, other, layout)
SparseTensor.__mul__ = SparseTensor.mul
SparseTensor.__rmul__ = SparseTensor.mul
SparseTensor.__imul__ = SparseTensor.mul_
