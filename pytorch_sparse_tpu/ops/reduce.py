"""Reductions over a sparse matrix (reference ``torch_sparse/reduce.py``).

``dim=None`` reduces over all values; ``dim=0`` segment-reduces by column;
``dim=1`` segment-reduces by row; ``dim>1`` reduces dense value dims.
Empty-segment semantics follow ``ops/segment.py`` (mean divides by
``max(count, 1)``; min/max yield 0), matching torch_scatter's contract the
reference inherits.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..tensor import SparseTensor
from .segment import segment_reduce


def reduction(
    src: SparseTensor, dim: Optional[int] = None, reduce: str = "sum"
) -> jnp.ndarray:
    value = src.storage.value()

    if dim is None:
        if value is not None:
            if reduce in ("sum", "add"):
                return value.sum()
            elif reduce == "mean":
                return value.mean()
            elif reduce == "min":
                return value.min()
            elif reduce == "max":
                return value.max()
            raise ValueError(f"Unknown reduce mode: {reduce!r}")
        else:
            if reduce in ("sum", "add"):
                return jnp.asarray(src.nnz(), dtype=jnp.float32)
            elif reduce in ("mean", "min", "max"):
                return jnp.asarray(1, dtype=jnp.float32)
            raise ValueError(f"Unknown reduce mode: {reduce!r}")

    if dim < 0:
        dim = src.dim() + dim

    if dim == 0 and value is not None:
        col = src.storage.col()
        return segment_reduce(value, col, src.sparse_size(1), reduce)
    elif dim == 0 and value is None:
        if reduce in ("sum", "add"):
            return src.storage.colcount().astype(jnp.float32)
        elif reduce in ("mean", "min", "max"):
            return jnp.ones((src.sparse_size(1),), dtype=jnp.float32)
        raise ValueError(f"Unknown reduce mode: {reduce!r}")
    elif dim == 1 and value is not None:
        row = src.storage.row()
        return segment_reduce(
            value, row, src.sparse_size(0), reduce, indices_are_sorted=True
        )
    elif dim == 1 and value is None:
        if reduce in ("sum", "add"):
            return src.storage.rowcount().astype(jnp.float32)
        elif reduce in ("mean", "min", "max"):
            return jnp.ones((src.sparse_size(0),), dtype=jnp.float32)
        raise ValueError(f"Unknown reduce mode: {reduce!r}")
    elif dim > 1 and value is not None:
        if reduce in ("sum", "add"):
            return value.sum(axis=dim - 1)
        elif reduce == "mean":
            return value.mean(axis=dim - 1)
        elif reduce == "min":
            return value.min(axis=dim - 1)
        elif reduce == "max":
            return value.max(axis=dim - 1)
        raise ValueError(f"Unknown reduce mode: {reduce!r}")
    raise ValueError(f"Cannot reduce dim {dim} without values")


def sum(src: SparseTensor, dim: Optional[int] = None) -> jnp.ndarray:
    return reduction(src, dim, reduce="sum")


def mean(src: SparseTensor, dim: Optional[int] = None) -> jnp.ndarray:
    return reduction(src, dim, reduce="mean")


def min(src: SparseTensor, dim: Optional[int] = None) -> jnp.ndarray:
    return reduction(src, dim, reduce="min")


def max(src: SparseTensor, dim: Optional[int] = None) -> jnp.ndarray:
    return reduction(src, dim, reduce="max")


SparseTensor.sum = lambda self, dim=None: sum(self, dim)
SparseTensor.mean = lambda self, dim=None: mean(self, dim)
SparseTensor.min = lambda self, dim=None: min(self, dim)
SparseTensor.max = lambda self, dim=None: max(self, dim)
