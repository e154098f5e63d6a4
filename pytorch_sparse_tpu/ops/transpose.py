"""Transpose via the cached csr2csc permutation
(reference ``torch_sparse/transpose.py``).

``t()`` is O(nnz) gather: the CSC view of A *is* the CSR view of A^T, so the
new storage reuses ``colptr``/``colcount`` as ``rowptr``/``rowcount`` and
swaps the permutation caches (reference ``transpose.py:18-27``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..storage import SparseStorage
from ..tensor import SparseTensor


def t(src: SparseTensor) -> SparseTensor:
    sparse_sizes = src.storage.sparse_sizes()

    # Index work on the host when host views exist (device gathers are
    # an eager compile per shape on the TPU tunnel): one native
    # sort+decode yields csr2csc AND the transposed (row, col) without
    # the two random index gathers; the new storage re-seeds its own
    # host cache from the numpy arrays.
    decoded = src.storage.csr2csc_decode_host()
    csr2csc = src.storage.csr2csc()
    value = src.storage.value()
    if value is not None:
        value = value[csr2csc]
    if decoded is not None:
        _, new_row, new_col = decoded
    else:
        row, col = src.storage.row(), src.storage.col()
        new_row, new_col = col[csr2csc], row[csr2csc]

    storage = SparseStorage(
        row=new_row,
        rowptr=src.storage._colptr,
        col=new_col,
        value=value,
        sparse_sizes=(sparse_sizes[1], sparse_sizes[0]),
        rowcount=src.storage._colcount,
        colptr=src.storage._rowptr,
        colcount=src.storage._rowcount,
        csr2csc=src.storage._csc2csr,
        csc2csr=csr2csc,
        is_sorted=True,
        trust_data=True,
        _host_data_owned=True,  # decode/gather outputs are fresh arrays
    )
    return src.from_storage(storage)


SparseTensor.t = lambda self: t(self)


def transpose(
    index: jnp.ndarray,
    value: Optional[jnp.ndarray],
    m: int,
    n: int,
    coalesced: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Legacy tuple-API transpose (reference ``transpose.py:39-62``)."""
    row, col = index[1], index[0]

    if coalesced:
        storage = SparseStorage(
            row=row, col=col, value=value, sparse_sizes=(n, m),
            is_sorted=False,
        )
        storage = storage.coalesce()
        row, col, value = storage.row(), storage.col(), storage.value()

    return jnp.stack([row, col], axis=0), value
