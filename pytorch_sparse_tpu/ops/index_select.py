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


def index_select(src: SparseTensor, dim: int, idx) -> SparseTensor:
    dim = src.dim() + dim if dim < 0 else dim
    idx = np.asarray(idx)
    assert idx.ndim == 1

    if dim == 0:
        old_rowptr, col, value = src.csr()
        old_rowptr = np.asarray(old_rowptr)
        rowcount = np.asarray(src.storage.rowcount())[idx]

        rowptr = np.zeros(idx.shape[0] + 1, dtype=np.int32)
        np.cumsum(rowcount, out=rowptr[1:])
        E_new = int(rowptr[-1])

        row = np.repeat(np.arange(idx.shape[0], dtype=np.int32), rowcount)
        perm = np.arange(E_new) + (old_rowptr[idx] - rowptr[:-1])[row]

        col = jnp.asarray(np.asarray(col)[perm])
        if value is not None:
            value = value[jnp.asarray(perm)]

        storage = SparseStorage(
            row=jnp.asarray(row), rowptr=jnp.asarray(rowptr), col=col,
            value=value, sparse_sizes=(idx.shape[0], src.sparse_size(1)),
            rowcount=jnp.asarray(rowcount), colptr=None, colcount=None,
            csr2csc=None, csc2csr=None, is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    elif dim == 1:
        old_colptr, row_csc, value_csc = src.csc()
        old_colptr = np.asarray(old_colptr)
        row_csc = np.asarray(row_csc)
        colcount = np.asarray(src.storage.colcount())[idx]

        colptr = np.zeros(idx.shape[0] + 1, dtype=np.int32)
        np.cumsum(colcount, out=colptr[1:])
        E_new = int(colptr[-1])

        col = np.repeat(np.arange(idx.shape[0], dtype=np.int32), colcount)
        perm = np.arange(E_new) + (old_colptr[idx] - colptr[:-1])[col]

        row = row_csc[perm]
        csc2csr = np.lexsort((col, row))
        new_row = jnp.asarray(row[csc2csr])
        new_col = jnp.asarray(col[csc2csr])

        value: Optional[jnp.ndarray] = None
        if value_csc is not None:
            value = value_csc[jnp.asarray(perm)][jnp.asarray(csc2csr)]

        storage = SparseStorage(
            row=new_row, rowptr=None, col=new_col, value=value,
            sparse_sizes=(src.sparse_size(0), idx.shape[0]), rowcount=None,
            colptr=jnp.asarray(colptr), colcount=jnp.asarray(colcount),
            csr2csc=None, csc2csr=jnp.asarray(csc2csr.astype(np.int32)),
            is_sorted=True, trust_data=True,
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
