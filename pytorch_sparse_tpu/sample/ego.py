"""Ego-network sampling (reference ``csrc/cpu/ego_sample_cpu.cpp``):
per-seed k-hop BFS with a per-node neighbor cap, induced subgraph over the
*sorted* visited set, then block-diagonal stitching of all ego-nets."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor
from ..utils.convert import to_index_array
from ._common import Seed, as_generator, sample_per_row


def _one_ego(rowptr, col, seed_node, depth, num_neighbors, replace, rng):
    visited = {int(seed_node)}
    frontier = np.array([seed_node], np.int64)
    for _ in range(depth):
        counts = rowptr[frontier + 1] - rowptr[frontier]
        owner, offsets = sample_per_row(counts, num_neighbors, replace, rng)
        sampled = col[rowptr[frontier[owner]] + offsets]
        nxt = np.array(
            [w for w in sampled.tolist() if w not in visited], np.int64
        )
        visited.update(nxt.tolist())
        frontier = np.unique(nxt)
        if frontier.shape[0] == 0:
            break

    # Induced subgraph over the *sorted* visited set (the reference's
    # std::set iteration order, ego_sample_cpu.cpp:84-104).
    n_ids = np.array(sorted(visited), np.int64)
    assoc = {int(v): i for i, v in enumerate(n_ids)}
    root_local = assoc[int(seed_node)]

    rows, cols, e_ids = [], [], []
    sub_rowptr = [0]
    for local_v, v in enumerate(n_ids):
        for e in range(rowptr[v], rowptr[v + 1]):
            w = assoc.get(int(col[e]))
            if w is not None:
                rows.append(local_v)
                cols.append(w)
                e_ids.append(e)
        sub_rowptr.append(len(cols))
    return (
        np.asarray(sub_rowptr, np.int64), np.asarray(rows, np.int64),
        np.asarray(cols, np.int64), np.asarray(e_ids, np.int64),
        n_ids, root_local,
    )


def ego_k_hop_sample_adj(
    src: SparseTensor, idx: jnp.ndarray, depth: int, num_neighbors: int,
    replace: bool = False, seed: Seed = None,
) -> Tuple[SparseTensor, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (block-diagonal adj, n_id, e_id, ptr, root_n_id): one ego
    net per seed, stitched diagonally, with ``ptr`` delimiting each net's
    node range and ``root_n_id`` the seed's position in the stitched
    numbering."""
    rowptr = src.storage.numpy_view("rowptr")
    col = src.storage.numpy_view("col")
    idx_np = np.ascontiguousarray(idx, np.int64)

    from ..csrc import bindings

    if bindings.available():
        native_seed = seed if isinstance(seed, int) else 0
        row, colc, e_id, n_id, ptr, roots = bindings.ego_k_hop(
            rowptr, col, idx_np, depth, num_neighbors, replace, native_seed
        )
        node_off = int(n_id.shape[0])
    else:
        rng = as_generator(seed)
        all_rows, all_cols, all_eids, all_nids = [], [], [], []
        ptr = [0]
        roots = []
        node_off = 0
        for g in range(idx_np.shape[0]):
            _, rows, cols, e_ids, n_ids, root_local = _one_ego(
                rowptr, col, idx_np[g], depth, num_neighbors, replace, rng
            )
            all_rows.append(rows + node_off)
            all_cols.append(cols + node_off)
            all_eids.append(e_ids)
            all_nids.append(n_ids)
            roots.append(root_local + node_off)
            node_off += n_ids.shape[0]
            ptr.append(node_off)

        row = np.concatenate(all_rows) if all_rows else np.zeros(0, np.int64)
        colc = np.concatenate(all_cols) if all_cols else np.zeros(0, np.int64)
        e_id = np.concatenate(all_eids) if all_eids else np.zeros(0, np.int64)
        n_id = np.concatenate(all_nids) if all_nids else np.zeros(0, np.int64)

    value = src.storage.value()
    if value is not None:
        value = value[jnp.asarray(e_id)]

    out = SparseTensor(
        row=to_index_array(row),
        col=to_index_array(colc), value=value,
        sparse_sizes=(node_off, node_off), is_sorted=True, trust_data=True,
    )
    return (
        out,
        to_index_array(n_id),
        to_index_array(e_id),
        to_index_array(ptr),
        to_index_array(roots),
    )
