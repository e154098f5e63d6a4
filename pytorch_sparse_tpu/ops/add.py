"""Broadcast / sparse-sparse addition (reference ``torch_sparse/add.py``).

Row-wise (``(M, 1)``) and col-wise (``(1, N)``) dense vectors broadcast into
the nnz values; the reference's ``gather_csr(other, rowptr)`` is simply a
``other[row]`` gather here (same result, and XLA fuses the gather into the
elementwise add).  Sparse + sparse concatenates COO lists and coalesces with
``reduce='sum'`` (reference ``add.py:38-56``).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from ..tensor import SparseTensor


def _broadcast_nnz(src: SparseTensor, other: jnp.ndarray) -> jnp.ndarray:
    """Expand a (M, 1) or (1, N) dense operand to per-nnz values
    (reference ``add.py:24-31``)."""
    other = jnp.asarray(other)
    M, N = src.sparse_size(0), src.sparse_size(1)
    if other.ndim >= 2 and other.shape[0] == M and other.shape[1] == 1:
        row = src.storage.row()
        return jnp.reshape(other, (M,) + other.shape[2:])[row]
    elif other.ndim >= 2 and other.shape[0] == 1 and other.shape[1] == N:
        col = src.storage.col()
        return jnp.reshape(other, (N,) + other.shape[2:])[col]
    raise ValueError(
        f"broadcast operand of shape {other.shape} does not match the "
        f"sparse operand: need ({M}, 1, ...) for row-wise or "
        f"(1, {N}, ...) for col-wise broadcasting"
    )


def add(
    src: SparseTensor, other: Union[jnp.ndarray, SparseTensor]
) -> SparseTensor:
    if isinstance(other, SparseTensor):
        valueA = src.storage.value()
        valueB = other.storage.value()
        M = max(src.sparse_size(0), other.sparse_size(0))
        N = max(src.sparse_size(1), other.sparse_size(1))
        # Concatenate the index lists on the HOST when both operands
        # carry host views: the merge sort + dedupe then never touch the
        # device (one eager device sort per new shape costs a full
        # remote compile on the TPU tunnel; see storage._coalesce_host).
        hrA = src.storage.numpy_view_cached("row")
        hcA = src.storage.numpy_view_cached("col")
        hrB = other.storage.numpy_view_cached("row")
        hcB = other.storage.numpy_view_cached("col")
        if all(a is not None for a in (hrA, hcA, hrB, hcB)):
            import numpy as np

            row = np.concatenate([hrA, hrB])
            col = np.concatenate([hcA, hcB])
        else:
            rowA, colA, _ = src.coo()
            rowB, colB, _ = other.coo()
            row = jnp.concatenate([rowA, rowB])
            col = jnp.concatenate([colA, colB])
        value: Optional[jnp.ndarray] = None
        if valueA is not None and valueB is not None:
            value = jnp.concatenate([valueA, valueB])
        out = SparseTensor(
            row=row, col=col, value=value, sparse_sizes=(M, N)
        )
        return out.coalesce(reduce="sum")

    per_nnz = _broadcast_nnz(src, other)
    value = src.storage.value()
    if value is not None:
        value = per_nnz.astype(value.dtype) + value
    else:
        value = per_nnz + 1
    return src.set_value(value, layout="coo")


# JAX arrays are immutable: the in-place reference spellings return new
# tensors here (reference add.py:62-97).
add_ = add


def add_nnz(
    src: SparseTensor, other: jnp.ndarray, layout: Optional[str] = None
) -> SparseTensor:
    value = src.storage.value()
    other = jnp.asarray(other)
    if value is not None:
        value = value + other.astype(value.dtype)
    else:
        value = other + 1
    return src.set_value(value, layout=layout)


add_nnz_ = add_nnz

SparseTensor.add = lambda self, other: add(self, other)
SparseTensor.add_ = lambda self, other: add_(self, other)
SparseTensor.add_nnz = lambda self, other, layout=None: add_nnz(
    self, other, layout)
SparseTensor.add_nnz_ = lambda self, other, layout=None: add_nnz_(
    self, other, layout)
SparseTensor.__add__ = SparseTensor.add
SparseTensor.__radd__ = SparseTensor.add
SparseTensor.__iadd__ = SparseTensor.add_
