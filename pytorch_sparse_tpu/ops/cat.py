"""Concatenation along rows / cols / diagonal / dense value dims
(reference ``torch_sparse/cat.py``), preserving as much cache as possible:
``cat_first`` keeps row/rowptr/rowcount, ``cat_second`` keeps colptr/colcount,
``cat_diag`` keeps everything (block-diagonal structure shifts all caches by
per-block offsets).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import jax.numpy as jnp

import numpy as np

from ..storage import SparseStorage
from ..tensor import SparseTensor


def _idx(storage, attr: str, name: str):
    """An index cache for concatenation: the host copy when one exists
    (keeps the concat + downstream sort/derive work off the device — one
    eager device op per new shape costs a remote compile on the TPU
    tunnel), else the device array."""
    arr = getattr(storage, attr)
    if arr is None:
        return None
    h = storage._np_cached(name)
    return h if h is not None else arr


def cat(
    tensors: List[SparseTensor], dim: Union[int, Tuple[int, int], List[int]]
) -> SparseTensor:
    assert len(tensors) > 0
    if isinstance(dim, int):
        dim = tensors[0].dim() + dim if dim < 0 else dim
        if dim == 0:
            return cat_first(tensors)
        elif dim == 1:
            return cat_second(tensors)
        elif dim > 1 and dim < tensors[0].dim():
            values = []
            for tensor in tensors:
                value = tensor.storage.value()
                assert value is not None
                values.append(value)
            value = jnp.concatenate(values, axis=dim - 1)
            return tensors[0].set_value(value, layout="coo")
        else:
            nd = tensors[0].dim()
            raise IndexError(
                f"cat dim {dim} is outside the valid range "
                f"[{-nd}, {nd - 1}] for {nd}-dimensional sparse tensors"
            )
    else:
        assert isinstance(dim, (tuple, list))
        assert len(dim) == 2
        assert sorted(dim) == [0, 1]
        return cat_diag(tensors)


def _cat_or_none(parts, n_tensors):
    if len(parts) != n_tensors:
        return None
    if all(isinstance(p, np.ndarray) for p in parts):
        return np.concatenate(parts, axis=0)
    return jnp.concatenate([jnp.asarray(p) for p in parts], axis=0)


def cat_first(tensors: List[SparseTensor]) -> SparseTensor:
    rows, rowptrs, cols, values, rowcounts = [], [], [], [], []
    M, N, nnz = 0, 0, 0
    for tensor in tensors:
        row = _idx(tensor.storage, "_row", "row")
        if row is not None:
            rows.append(row + M)
        rowptr = _idx(tensor.storage, "_rowptr", "rowptr")
        if rowptr is not None:
            rowptrs.append(rowptr[1:] + nnz if len(rowptrs) > 0 else rowptr)
        cols.append(_idx(tensor.storage, "_col", "col"))
        value = tensor.storage._value
        if value is not None:
            values.append(value)
        rowcount = tensor.storage._rowcount
        if rowcount is not None:
            rowcounts.append(rowcount)
        M += tensor.sparse_size(0)
        N = max(N, tensor.sparse_size(1))
        nnz += tensor.nnz()

    n = len(tensors)
    storage = SparseStorage(
        row=_cat_or_none(rows, n), rowptr=_cat_or_none(rowptrs, n),
        col=_cat_or_none(cols, n), value=_cat_or_none(values, n),
        sparse_sizes=(M, N), rowcount=_cat_or_none(rowcounts, n),
        colptr=None, colcount=None, csr2csc=None, csc2csr=None,
        is_sorted=True, trust_data=True,
    )
    return tensors[0].from_storage(storage)


def cat_second(tensors: List[SparseTensor]) -> SparseTensor:
    rows, cols, values, colptrs, colcounts = [], [], [], [], []
    M, N, nnz = 0, 0, 0
    for tensor in tensors:
        value = tensor.storage.value()
        hrow = tensor.storage.numpy_view_cached("row")
        rows.append(hrow if hrow is not None else tensor.storage.row())
        cols.append(_idx(tensor.storage, "_col", "col") + N)
        if value is not None:
            values.append(value)
        colptr = _idx(tensor.storage, "_colptr", "colptr")
        if colptr is not None:
            colptrs.append(colptr[1:] + nnz if len(colptrs) > 0 else colptr)
        colcount = tensor.storage._colcount
        if colcount is not None:
            colcounts.append(colcount)
        M = max(M, tensor.sparse_size(0))
        N += tensor.sparse_size(1)
        nnz += tensor.nnz()

    n = len(tensors)
    storage = SparseStorage(
        row=_cat_or_none(rows, n), rowptr=None,
        col=_cat_or_none(cols, n), value=_cat_or_none(values, n),
        sparse_sizes=(M, N), rowcount=None,
        colptr=_cat_or_none(colptrs, n), colcount=_cat_or_none(colcounts, n),
        csr2csc=None, csc2csr=None, is_sorted=False,
    )
    return tensors[0].from_storage(storage)


def cat_diag(tensors: List[SparseTensor]) -> SparseTensor:
    rows, rowptrs, cols, values = [], [], [], []
    rowcounts, colptrs, colcounts, csr2cscs, csc2csrs = [], [], [], [], []
    M, N, nnz = 0, 0, 0
    for tensor in tensors:
        row = _idx(tensor.storage, "_row", "row")
        if row is not None:
            rows.append(row + M)
        rowptr = _idx(tensor.storage, "_rowptr", "rowptr")
        if rowptr is not None:
            rowptrs.append(rowptr[1:] + nnz if len(rowptrs) > 0 else rowptr)
        cols.append(_idx(tensor.storage, "_col", "col") + N)
        value = tensor.storage._value
        if value is not None:
            values.append(value)
        rowcount = tensor.storage._rowcount
        if rowcount is not None:
            rowcounts.append(rowcount)
        colptr = tensor.storage._colptr
        if colptr is not None:
            colptrs.append(colptr[1:] + nnz if len(colptrs) > 0 else colptr)
        colcount = tensor.storage._colcount
        if colcount is not None:
            colcounts.append(colcount)
        csr2csc = _idx(tensor.storage, "_csr2csc", "csr2csc")
        if csr2csc is not None:
            csr2cscs.append(csr2csc + nnz)
        csc2csr = _idx(tensor.storage, "_csc2csr", "csc2csr")
        if csc2csr is not None:
            csc2csrs.append(csc2csr + nnz)
        M += tensor.sparse_size(0)
        N += tensor.sparse_size(1)
        nnz += tensor.nnz()

    n = len(tensors)
    storage = SparseStorage(
        row=_cat_or_none(rows, n), rowptr=_cat_or_none(rowptrs, n),
        col=_cat_or_none(cols, n), value=_cat_or_none(values, n),
        sparse_sizes=(M, N), rowcount=_cat_or_none(rowcounts, n),
        colptr=_cat_or_none(colptrs, n), colcount=_cat_or_none(colcounts, n),
        csr2csc=_cat_or_none(csr2cscs, n), csc2csr=_cat_or_none(csc2csrs, n),
        is_sorted=True, trust_data=True,
    )
    return tensors[0].from_storage(storage)
