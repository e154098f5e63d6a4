"""Diagonal ops (reference ``torch_sparse/diag.py`` + ``csrc/diag.cpp``).

``non_diag_mask`` — the reference's native kernel
(``csrc/cpu/diag_cpu.cpp:5-47``) — is pure index arithmetic here: for each
existing nnz, count how many inserted k-offset diagonal entries precede it
in row-major order.  Everything below is static-shape and jit-compatible
(the number of diagonal entries depends only on (M, N, k)).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..storage import SparseStorage
from ..tensor import SparseTensor
from ..utils.convert import INDEX_DTYPE


def _diag_count(M: int, N: int, k: int) -> int:
    return min(M + k, N) if k < 0 else min(M, N - k)


def non_diag_mask(
    row: jnp.ndarray, col: jnp.ndarray, M: int, N: int, k: int
) -> jnp.ndarray:
    """Boolean mask of length ``E + num_diag``: True at the positions the
    existing nnz occupy once a full k-offset diagonal is inserted
    (reference ``csrc/cpu/diag_cpu.cpp:5-47``)."""
    E = row.shape[0]
    num_diag = _diag_count(M, N, k)
    start = -k if k < 0 else 0

    # diag entry d lives at (start + d, start + d + k); it precedes nnz
    # (r, c) iff its row is above, or same row with smaller column.
    above = jnp.clip(row - start, 0, num_diag)
    same_row = (row >= start) & (row < start + num_diag) & (row + k < col)
    offset = above + same_row.astype(above.dtype)
    pos = jnp.arange(E, dtype=INDEX_DTYPE) + offset.astype(INDEX_DTYPE)

    mask = jnp.zeros((E + num_diag,), dtype=bool).at[pos].set(True)
    return mask


def remove_diag(src: SparseTensor, k: int = 0) -> SparseTensor:
    """Drop the k-offset diagonal, patching row/col counts
    (reference ``diag.py:10-33``).  Output nnz is data-dependent ->
    runs eagerly; index work stays on the host when host views exist
    (device boolean-mask ops recompile per shape on the TPU tunnel)."""
    import numpy as np

    hrow = src.storage.numpy_view_cached("row")
    hcol = src.storage.numpy_view_cached("col")
    rowcount = src.storage._rowcount
    colcount = src.storage._colcount
    if hrow is not None and hcol is not None:
        inv_np = hrow != hcol if k == 0 else hrow != (hcol - k)
        new_row, new_col = hrow[inv_np], hcol[inv_np]
        value = src.storage.value()
        if value is not None:
            value = value[jnp.asarray(np.flatnonzero(inv_np))]
        if rowcount is not None:
            rowcount = rowcount.at[jnp.asarray(hrow[~inv_np])].add(-1)
        if colcount is not None:
            colcount = colcount.at[jnp.asarray(hcol[~inv_np])].add(-1)
    else:
        row, col, value = src.coo()
        inv_mask = row != col if k == 0 else row != (col - k)
        new_row, new_col = row[inv_mask], col[inv_mask]
        if value is not None:
            value = value[inv_mask]
        if rowcount is not None or colcount is not None:
            mask = ~inv_mask
            if rowcount is not None:
                rowcount = rowcount.at[row[mask]].add(-1)
            if colcount is not None:
                colcount = colcount.at[col[mask]].add(-1)

    storage = SparseStorage(
        row=new_row, rowptr=None, col=new_col, value=value,
        sparse_sizes=src.sparse_sizes(), rowcount=rowcount, colptr=None,
        colcount=colcount, csr2csc=None, csc2csr=None, is_sorted=True,
        trust_data=True,
    )
    return src.from_storage(storage)


def set_diag(
    src: SparseTensor, values: Optional[jnp.ndarray] = None, k: int = 0
) -> SparseTensor:
    """Insert a full k-offset diagonal (reference ``diag.py:36-80``)."""
    src = remove_diag(src, k=k)
    value = src.storage.value()
    M, N = src.sparse_size(0), src.sparse_size(1)

    hrow = src.storage.numpy_view_cached("row")
    hcol = src.storage.numpy_view_cached("col")
    if hrow is not None and hcol is not None:
        # Host index math (same formula as non_diag_mask below).
        import numpy as np

        E = hrow.shape[0]
        num_diag = _diag_count(M, N, k)
        start = -k if k < 0 else 0
        above = np.clip(hrow - start, 0, num_diag)
        same_row = (
            (hrow >= start) & (hrow < start + num_diag) & (hrow + k < hcol)
        )
        pos_np = np.arange(E, dtype=np.int64) + above + same_row
        E_out = E + num_diag
        mask_np = np.zeros(E_out, bool)
        mask_np[pos_np] = True
        inv_pos_np = np.flatnonzero(~mask_np)
        diag_np = np.arange(start, start + num_diag, dtype=np.int64)
        new_row = np.zeros(E_out, np.int64)
        new_row[pos_np] = hrow
        new_row[inv_pos_np] = diag_np
        new_col = np.zeros(E_out, np.int64)
        new_col[pos_np] = hcol
        new_col[inv_pos_np] = diag_np + k
        pos, inv_pos = jnp.asarray(pos_np), jnp.asarray(inv_pos_np)
    else:
        row, col = src.storage.row(), src.storage.col()
        mask = non_diag_mask(row, col, M, N, k)
        E_out = mask.shape[0]
        num_diag = E_out - row.shape[0]
        start = -k if k < 0 else 0
        diag = jnp.arange(start, start + num_diag, dtype=INDEX_DTYPE)

        pos = jnp.nonzero(mask, size=row.shape[0])[0]
        inv_pos = jnp.nonzero(~mask, size=num_diag)[0]

        new_row = (
            jnp.zeros((E_out,), dtype=INDEX_DTYPE)
            .at[pos].set(row).at[inv_pos].set(diag)
        )
        new_col = (
            jnp.zeros((E_out,), dtype=INDEX_DTYPE)
            .at[pos].set(col).at[inv_pos].set(diag + k)
        )

    new_value: Optional[jnp.ndarray] = None
    if value is not None:
        if values is None:
            values = jnp.ones((num_diag,) + value.shape[1:], dtype=value.dtype)
        new_value = (
            jnp.zeros((E_out,) + value.shape[1:], dtype=value.dtype)
            .at[pos].set(value)
            .at[inv_pos].set(values.astype(value.dtype))
        )

    rowcount = src.storage._rowcount
    if rowcount is not None:
        rowcount = rowcount.at[start:start + num_diag].add(1)
    colcount = src.storage._colcount
    if colcount is not None:
        colcount = colcount.at[start + k:start + num_diag + k].add(1)

    storage = SparseStorage(
        row=new_row, rowptr=None, col=new_col, value=new_value,
        sparse_sizes=src.sparse_sizes(), rowcount=rowcount, colptr=None,
        colcount=colcount, csr2csc=None, csc2csr=None, is_sorted=True,
        trust_data=True,
    )
    return src.from_storage(storage)


def fill_diag(src: SparseTensor, fill_value: float, k: int = 0) -> SparseTensor:
    """Reference ``diag.py:83-94``."""
    num_diag = _diag_count(src.sparse_size(0), src.sparse_size(1), k)
    value = src.storage.value()
    if value is not None:
        sizes = (num_diag,) + tuple(value.shape[1:])
        return set_diag(src, jnp.full(sizes, fill_value, dtype=value.dtype), k)
    return set_diag(src, None, k)


def get_diag(src: SparseTensor) -> jnp.ndarray:
    """Reference ``diag.py:97-110``."""
    row, col, value = src.coo()
    if value is None:
        value = jnp.ones((row.shape[0],), dtype=jnp.float32)
    k = min(src.sparse_size(0), src.sparse_size(1))
    out = jnp.zeros((k,) + tuple(value.shape[1:]), dtype=value.dtype)
    mask = row == col
    # Scatter only matching entries; mismatches are routed out of range.
    idx = jnp.where(mask, row, k)
    return (
        jnp.zeros((k + 1,) + tuple(value.shape[1:]), dtype=value.dtype)
        .at[idx].set(jnp.where(
            mask.reshape((-1,) + (1,) * (value.ndim - 1)), value, 0
        ))[:k]
    ) if row.shape[0] > 0 else out


SparseTensor.remove_diag = lambda self, k=0: remove_diag(self, k)
SparseTensor.set_diag = lambda self, values=None, k=0: set_diag(self, values, k)
SparseTensor.fill_diag = lambda self, fill_value, k=0: fill_diag(
    self, fill_value, k)
SparseTensor.get_diag = lambda self: get_diag(self)
