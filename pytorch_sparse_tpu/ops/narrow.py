"""Row/column slicing (reference ``torch_sparse/narrow.py``).

``dim=0`` is O(1) metadata on the rowptr: the nnz of a contiguous row range
is a contiguous slice of the CSR arrays.  ``dim=1`` filters by column mask.
``__narrow_diag__`` inverts ``cat_diag`` for block-diagonal compositions
(reference ``narrow.py:81-130``), preserving every cache it can.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..storage import SparseStorage
from ..tensor import SparseTensor


def narrow(src: SparseTensor, dim: int, start: int, length: int) -> SparseTensor:
    if dim < 0:
        dim = src.dim() + dim
    if start < 0:
        start = src.size(dim) + start

    if dim == 0:
        # Index slicing on host views when available (device slices are
        # an eager compile per shape on the remote-TPU tunnel).
        hptr = src.storage.numpy_view_cached("rowptr")
        hcol = src.storage.numpy_view_cached("col")
        value = src.storage.value()
        if hptr is not None and hcol is not None:
            rowptr = hptr[start:start + length + 1]
            row_start = int(rowptr[0])
            rowptr = rowptr - row_start
            row_length = int(rowptr[-1])
            row = None
            if src.storage._row is not None:
                hrow = src.storage._np_cached("row")
                if hrow is not None:
                    row = hrow[row_start:row_start + row_length] - start
                else:
                    row = (src.storage._row[row_start:row_start + row_length]
                           - start)
            col = hcol[row_start:row_start + row_length]
            # keep the reference's observable cache contract: rowcount
            # only survives if it was already filled
            rowcount = (np.diff(rowptr)
                        if src.storage._rowcount is not None else None)
        else:
            rowptr, col, _ = src.csr()
            rowptr = rowptr[start:start + length + 1]
            row_start = int(rowptr[0])
            rowptr = rowptr - row_start
            row_length = int(rowptr[-1])
            row = src.storage._row
            if row is not None:
                row = row[row_start:row_start + row_length] - start
            col = col[row_start:row_start + row_length]
            rowcount = src.storage._rowcount
            if rowcount is not None:
                rowcount = rowcount[start:start + length]

        if value is not None:
            value = value[row_start:row_start + row_length]

        storage = SparseStorage(
            row=row, rowptr=rowptr, col=col, value=value,
            sparse_sizes=(length, src.sparse_size(1)), rowcount=rowcount,
            colptr=None, colcount=None, csr2csc=None, csc2csr=None,
            is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    elif dim == 1:
        # Faster than the CSC walk (reference narrow.py:44-45).
        hrow = src.storage.numpy_view_cached("row")
        hcol = src.storage.numpy_view_cached("col")
        value = src.storage.value()
        if hrow is not None and hcol is not None:
            mask = (hcol >= start) & (hcol < start + length)
            idx_np = np.nonzero(mask)[0]
            row = hrow[idx_np]
            col = hcol[idx_np] - start
            if value is not None:
                value = value[jnp.asarray(idx_np)]
        else:
            row, col, _ = src.coo()
            mask = np.asarray((col >= start) & (col < start + length))
            idx = jnp.asarray(np.nonzero(mask)[0])
            row = row[idx]
            col = col[idx] - start
            if value is not None:
                value = value[idx]

        colptr = src.storage._colptr
        if colptr is not None:
            colptr = colptr[start:start + length + 1]
            colptr = colptr - colptr[0]
        colcount = src.storage._colcount
        if colcount is not None:
            colcount = colcount[start:start + length]

        storage = SparseStorage(
            row=row, rowptr=None, col=col, value=value,
            sparse_sizes=(src.sparse_size(0), length), rowcount=None,
            colptr=colptr, colcount=colcount, csr2csc=None, csc2csr=None,
            is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    else:
        value = src.storage.value()
        if value is not None:
            sl = [slice(None)] * value.ndim
            sl[dim - 1] = slice(start, start + length)
            return src.set_value(value[tuple(sl)], layout="coo")
        raise ValueError("Cannot narrow dense dims without values")


def __narrow_diag__(
    src: SparseTensor, start: Tuple[int, int], length: Tuple[int, int]
) -> SparseTensor:
    """Inverse of ``cat_diag`` — only valid on diagonally-stacked matrices."""
    rowptr, col, value = src.csr()

    rowptr = rowptr[start[0]:start[0] + length[0] + 1]
    row_start = int(rowptr[0])
    rowptr = rowptr - row_start
    row_length = int(rowptr[-1])

    row = src.storage._row
    if row is not None:
        row = row[row_start:row_start + row_length] - start[0]

    col = col[row_start:row_start + row_length] - start[1]
    if value is not None:
        value = value[row_start:row_start + row_length]

    rowcount = src.storage._rowcount
    if rowcount is not None:
        rowcount = rowcount[start[0]:start[0] + length[0]]

    colptr = src.storage._colptr
    if colptr is not None:
        colptr = colptr[start[1]:start[1] + length[1] + 1]
        colptr = colptr - int(colptr[0])

    colcount = src.storage._colcount
    if colcount is not None:
        colcount = colcount[start[1]:start[1] + length[1]]

    csr2csc = src.storage._csr2csc
    if csr2csc is not None:
        csr2csc = csr2csc[row_start:row_start + row_length] - row_start

    csc2csr = src.storage._csc2csr
    if csc2csr is not None:
        csc2csr = csc2csr[row_start:row_start + row_length] - row_start

    storage = SparseStorage(
        row=row, rowptr=rowptr, col=col, value=value, sparse_sizes=length,
        rowcount=rowcount, colptr=colptr, colcount=colcount, csr2csc=csr2csc,
        csc2csr=csc2csr, is_sorted=True, trust_data=True,
    )
    return src.from_storage(storage)


SparseTensor.narrow = lambda self, dim, start, length: narrow(
    self, dim, start, length)
SparseTensor.__narrow_diag__ = lambda self, start, length: __narrow_diag__(
    self, start, length)
