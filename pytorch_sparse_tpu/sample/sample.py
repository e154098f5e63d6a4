"""Per-row neighbor sampling (reference ``torch_sparse/sample.py``).

``sample`` is the reference's pure-tensor with-replacement draw
(``sample.py:7-24``) — device-native here with an explicit PRNGKey.
``sample_adj`` is the GraphSAGE one-hop bipartite sampler
(``csrc/cpu/sample_cpu.cpp``) — host-side with first-seen relabeling.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor
from ..utils.convert import INDEX_DTYPE, to_index_array
from ._common import Seed, as_generator, first_seen_relabel, sample_per_row
from ..utils.host_sort import lexsort2


def sample(
    src: SparseTensor, num_neighbors: int,
    subset: Optional[jnp.ndarray] = None, key: jax.Array = None,
) -> jnp.ndarray:
    """With-replacement uniform neighbor draw: (n, num_neighbors) col ids.
    Rows with degree 0 resample position ``rowptr[row]`` (same semantics
    as the reference's ``rand.mul_(rowcount)`` construction)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rowptr, col, _ = src.csr()
    rowcount = src.storage.rowcount()

    if subset is not None:
        subset = to_index_array(subset)
        rowcount = rowcount[subset]
        rowptr = rowptr[subset]
    else:
        rowptr = rowptr[:-1]

    rand = jax.random.uniform(key, (rowcount.shape[0], num_neighbors))
    rand = (rand * rowcount.astype(rand.dtype)[:, None]).astype(INDEX_DTYPE)
    rand = rand + rowptr[:, None]
    return jnp.take(col, rand)


def sample_adj(
    src: SparseTensor, subset: jnp.ndarray, num_neighbors: int,
    replace: bool = False, seed: Seed = None,
) -> Tuple[SparseTensor, jnp.ndarray]:
    """One-hop sampled bipartite adjacency ``(len(subset), len(n_id))``
    plus the node mapping ``n_id`` (subset first, then newly-seen cols in
    first-seen order); values carried through ``e_id``."""
    rowptr = src.storage.numpy_view("rowptr")
    col = src.storage.numpy_view("col")
    subset_np = np.ascontiguousarray(subset, np.int64)

    from ..csrc import bindings

    if bindings.available():
        native_seed = seed if isinstance(seed, int) else 0
        out_rowptr, local_col, e_id, n_id = bindings.sample_adj(
            rowptr, col, subset_np, num_neighbors, replace, native_seed
        )
    else:
        rng = as_generator(seed)
        counts = rowptr[subset_np + 1] - rowptr[subset_np]
        owner, offsets = sample_per_row(counts, num_neighbors, replace, rng)
        e_id = rowptr[subset_np[owner]] + offsets
        sampled_cols = col[e_id]

        n_id, local_col = first_seen_relabel(sampled_cols, subset_np)

        # Per-row sort by local col id (cpu/sample_cpu.cpp:125-137).
        order = lexsort2(owner, local_col)
        owner, local_col, e_id = owner[order], local_col[order], e_id[order]

        out_rowptr = np.zeros(subset_np.shape[0] + 1, np.int64)
        np.add.at(out_rowptr[1:], owner, 1)
        out_rowptr = np.cumsum(out_rowptr)

    value = src.storage.value()
    if value is not None:
        value = value[jnp.asarray(e_id)]

    out = SparseTensor(
        rowptr=to_index_array(out_rowptr), row=None,
        col=to_index_array(local_col), value=value,
        sparse_sizes=(subset_np.shape[0], n_id.shape[0]),
        is_sorted=True, trust_data=True,
    )
    return out, to_index_array(n_id)


SparseTensor.sample = (
    lambda self, num_neighbors, subset=None, key=None: sample(
        self, num_neighbors, subset, key)
)
SparseTensor.sample_adj = (
    lambda self, subset, num_neighbors, replace=False, seed=None: sample_adj(
        self, subset, num_neighbors, replace, seed)
)
