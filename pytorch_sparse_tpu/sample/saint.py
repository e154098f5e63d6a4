"""GraphSAINT node-induced subgraph (reference ``torch_sparse/saint.py`` +
``csrc/cpu/saint_cpu.cpp:5-49``): keep edges whose endpoints are both in
``node_idx``, relabeled by position in ``node_idx``."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor
from ..utils.convert import to_index_array
from ..utils.host_sort import lexsort2


def saint_subgraph(
    src: SparseTensor, node_idx: jnp.ndarray
) -> Tuple[SparseTensor, jnp.ndarray]:
    idx = np.ascontiguousarray(node_idx, np.int64)
    M = src.sparse_size(0)

    from ..csrc import bindings

    if bindings.available():
        rowptr = src.storage.numpy_view("rowptr")
        col = src.storage.numpy_view("col")
        new_row, new_col, e_id = bindings.saint_subgraph(rowptr, col, idx)
    else:
        row = src.storage.numpy_view("row")
        col = src.storage.numpy_view("col")
        assoc = np.full(M, -1, np.int64)
        assoc[idx] = np.arange(idx.shape[0])

        keep = (assoc[row] >= 0) & (assoc[col] >= 0)
        e_id = np.nonzero(keep)[0]
        new_row = assoc[row[e_id]]
        new_col = assoc[col[e_id]]

    order = lexsort2(new_row, new_col)
    new_row, new_col, e_id = new_row[order], new_col[order], e_id[order]

    value = src.storage.value()
    if value is not None:
        value = value[jnp.asarray(e_id)]

    out = SparseTensor(
        row=to_index_array(new_row),
        col=to_index_array(new_col), value=value,
        sparse_sizes=(idx.shape[0], idx.shape[0]),
        is_sorted=True, trust_data=True,
    )
    return out, to_index_array(e_id)


SparseTensor.saint_subgraph = lambda self, node_idx: saint_subgraph(
    self, node_idx)
