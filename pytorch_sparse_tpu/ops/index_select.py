"""Row/column gathers (reference ``torch_sparse/index_select.py``).

``dim=0`` walks the CSR structure: selected rows keep their nnz runs, so the
new edge list is a permutation-gather computed from rowptr arithmetic.
``dim=1`` walks the CSC view and re-sorts back to CSR order.  Output nnz is
data-dependent -> these run eagerly (mirroring that the reference uses them
at batch-assembly time, not inside compiled training steps).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..storage import SparseStorage, get_layout
from ..tensor import SparseTensor
from ..utils.host_sort import lexsort2


def index_select(src: SparseTensor, dim: int, idx) -> SparseTensor:
    dim = src.dim() + dim if dim < 0 else dim
    idx = np.asarray(idx)
    assert idx.ndim == 1

    if dim == 0:
        # Index math on host views (memoized; seeded by numpy
        # construction); only the value gather touches the device.
        old_rowptr = src.storage.numpy_view("rowptr")
        old_col = src.storage.numpy_view("col")
        value = src.storage.value()
        rowcount = np.diff(old_rowptr)[idx]

        rowptr = np.zeros(idx.shape[0] + 1, dtype=np.int64)
        np.cumsum(rowcount, out=rowptr[1:])
        E_new = int(rowptr[-1])

        row = np.repeat(np.arange(idx.shape[0], dtype=np.int64), rowcount)
        perm = np.arange(E_new) + (old_rowptr[idx] - rowptr[:-1])[row]

        if value is not None:
            value = value[jnp.asarray(perm)]

        storage = SparseStorage(
            row=row, rowptr=rowptr, col=old_col[perm],
            value=value, sparse_sizes=(idx.shape[0], src.sparse_size(1)),
            rowcount=rowcount, colptr=None, colcount=None,
            csr2csc=None, csc2csr=None, is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    elif dim == 1:
        hrow = src.storage.numpy_view("row")
        hcsr2csc = src.storage.numpy_view("csr2csc")
        old_colptr = src.storage.numpy_view("colptr")
        value = src.storage.value()
        row_csc = hrow[hcsr2csc]
        colcount = np.diff(old_colptr)[idx]

        colptr = np.zeros(idx.shape[0] + 1, dtype=np.int64)
        np.cumsum(colcount, out=colptr[1:])
        E_new = int(colptr[-1])

        col = np.repeat(np.arange(idx.shape[0], dtype=np.int64), colcount)
        perm = np.arange(E_new) + (old_colptr[idx] - colptr[:-1])[col]

        row = row_csc[perm]
        csc2csr = lexsort2(row, col)

        new_value: Optional[jnp.ndarray] = None
        if value is not None:
            # One device gather with the host-composed total permutation.
            total = hcsr2csc[perm][csc2csr]
            new_value = value[jnp.asarray(total)]

        storage = SparseStorage(
            row=row[csc2csr], rowptr=None, col=col[csc2csr],
            value=new_value,
            sparse_sizes=(src.sparse_size(0), idx.shape[0]), rowcount=None,
            colptr=colptr, colcount=colcount,
            csr2csc=None, csc2csr=csc2csr, is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    else:
        value = src.storage.value()
        if value is not None:
            return src.set_value(
                jnp.take(value, jnp.asarray(idx), axis=dim - 1), layout="coo"
            )
        raise ValueError("Cannot index-select dense dims without values")


def index_select_nnz(
    src: SparseTensor, idx, layout: Optional[str] = None
) -> SparseTensor:
    idx = jnp.asarray(idx)
    assert idx.ndim == 1
    if get_layout(layout) == "csc":
        idx = src.storage.csc2csr()[idx]
    row, col, value = src.coo()
    row, col = row[idx], col[idx]
    if value is not None:
        value = value[idx]
    return SparseTensor(
        row=row, rowptr=None, col=col, value=value,
        sparse_sizes=src.sparse_sizes(), is_sorted=True, trust_data=True,
    )


SparseTensor.index_select = lambda self, dim, idx: index_select(self, dim, idx)
SparseTensor.index_select_nnz = (
    lambda self, idx, layout=None: index_select_nnz(self, idx, layout)
)
