"""Boolean-mask selection (reference ``torch_sparse/masked_select.py``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..storage import SparseStorage, get_layout
from ..tensor import SparseTensor
from ..utils.host_sort import lexsort2


def masked_select(src: SparseTensor, dim: int, mask) -> SparseTensor:
    dim = src.dim() + dim if dim < 0 else dim
    mask = np.asarray(mask)
    assert mask.ndim == 1

    if dim == 0:
        value = src.storage.value()
        row_np = src.storage.numpy_view("row")
        col_np = src.storage.numpy_view("col")
        rowcount = np.diff(src.storage.numpy_view("rowptr"))[mask]

        edge_mask = mask[row_np]
        new_row = np.repeat(
            np.arange(rowcount.shape[0], dtype=np.int32), rowcount
        )
        new_col = col_np[edge_mask]
        if value is not None:
            value = value[jnp.asarray(np.nonzero(edge_mask)[0])]

        storage = SparseStorage(
            row=new_row, rowptr=None, col=new_col, value=value,
            sparse_sizes=(rowcount.shape[0], src.sparse_size(1)),
            rowcount=rowcount, colptr=None, colcount=None,
            csr2csc=None, csc2csr=None, is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    elif dim == 1:
        value = src.storage.value()
        csr2csc = src.storage.numpy_view("csr2csc")
        row_csc = src.storage.numpy_view("row")[csr2csc]
        col_csc = src.storage.numpy_view("col")[csr2csc]
        colcount = np.bincount(
            src.storage.numpy_view("col"), minlength=src.sparse_size(1)
        )[mask]

        edge_mask = mask[col_csc]
        new_col = np.repeat(
            np.arange(colcount.shape[0], dtype=np.int32), colcount
        )
        new_row = row_csc[edge_mask]
        csc2csr = lexsort2(new_row, new_col)

        value_out: Optional[jnp.ndarray] = None
        if value is not None:
            sel = csr2csc[np.nonzero(edge_mask)[0]]
            value_out = value[jnp.asarray(sel)][jnp.asarray(csc2csr)]

        storage = SparseStorage(
            row=new_row[csc2csr], rowptr=None,
            col=new_col[csc2csr], value=value_out,
            sparse_sizes=(src.sparse_size(0), colcount.shape[0]),
            rowcount=None, colptr=None, colcount=np.asarray(colcount),
            csr2csc=None, csc2csr=csc2csr,
            is_sorted=True, trust_data=True,
        )
        return src.from_storage(storage)

    else:
        value = src.storage.value()
        if value is not None:
            idx = jnp.asarray(np.nonzero(mask)[0])
            return src.set_value(
                jnp.take(value, idx, axis=dim - 1), layout="coo"
            )
        raise ValueError("Cannot masked-select dense dims without values")


def masked_select_nnz(
    src: SparseTensor, mask, layout: Optional[str] = None
) -> SparseTensor:
    mask = np.asarray(mask)
    assert mask.ndim == 1
    if get_layout(layout) == "csc":
        mask = mask[np.asarray(src.storage.csc2csr())]

    idx = jnp.asarray(np.nonzero(mask)[0])
    row, col, value = src.coo()
    row, col = row[idx], col[idx]
    if value is not None:
        value = value[idx]
    return SparseTensor(
        row=row, rowptr=None, col=col, value=value,
        sparse_sizes=src.sparse_sizes(), is_sorted=True, trust_data=True,
    )


SparseTensor.masked_select = lambda self, dim, mask: masked_select(
    self, dim, mask)
SparseTensor.masked_select_nnz = (
    lambda self, mask, layout=None: masked_select_nnz(self, mask, layout)
)
