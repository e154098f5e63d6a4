"""Heterogeneous Graph Transformer layer-wise importance sampling
(reference ``csrc/cpu/hgt_sample_cpu.cpp``): per-type budgets of
inverse-degree scores (neighbor cap 50), weighted node sampling
proportional to budget^2 without replacement, then induced typed
adjacency reconstruction over the sampled node sets."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.convert import to_index_array
from ._common import Seed, as_generator

MAX_NEIGHBORS = 50  # reference hgt_sample_cpu.cpp:9


def _split_rel(rel: str) -> Tuple[str, str, str]:
    src, r, dst = rel.split("__")
    return src, r, dst


def _update_budget(budget, node_type, new_samples, to_local, colptr_np,
                   row_np, rng):
    """Add inverse-degree mass for unseen neighbors of ``new_samples``
    (reference ``update_budget_``, hgt_sample_cpu.cpp:24-76)."""
    if not new_samples:
        return
    for rel, cp in colptr_np.items():
        src_t, _, dst_t = _split_rel(rel)
        if node_type != dst_t:
            continue
        rw = row_np[rel]
        seen = to_local[src_t]
        src_budget = budget[src_t]
        for w in new_samples:
            start, endp = cp[w], cp[w + 1]
            count = endp - start
            if count > MAX_NEIGHBORS:
                picks = rng.choice(count, MAX_NEIGHBORS, replace=False)
                inv = 1.0 / MAX_NEIGHBORS
                cand = rw[start + picks]
            elif count > 0:
                inv = 1.0 / count
                cand = rw[start:endp]
            else:
                continue
            for v in cand.tolist():
                if v not in seen:
                    src_budget[v] = src_budget.get(v, 0.0) + inv


def _sample_from(budget: Dict[int, float], num: int, rng) -> List[int]:
    """Weighted sampling without replacement, weight = budget^2
    (reference ``sample_from``, hgt_sample_cpu.cpp:78-98)."""
    if not budget or num <= 0:
        return []
    indices = np.fromiter(budget.keys(), np.int64, len(budget))
    weights = np.fromiter(budget.values(), np.float64, len(budget)) ** 2
    num = min(num, len(indices))
    probs = weights / weights.sum()
    picks = rng.choice(len(indices), size=num, replace=False, p=probs)
    return indices[picks].tolist()


def hgt_sample(
    colptr_dict: Dict[str, jnp.ndarray],
    row_dict: Dict[str, jnp.ndarray],
    input_node_dict: Dict[str, jnp.ndarray],
    num_samples_dict: Dict[str, List[int]],
    num_hops: int,
    seed: Seed = None,
):
    """Returns (node_id dict, row dict, col dict, edge_id dict)."""
    colptr_np = {k: np.asarray(v, np.int64) for k, v in colptr_dict.items()}
    row_np = {k: np.asarray(v, np.int64) for k, v in row_dict.items()}

    node_types = set()
    for rel in colptr_np:
        src_t, _, dst_t = _split_rel(rel)
        node_types.update((src_t, dst_t))
    node_types.update(input_node_dict.keys())

    from ..csrc import bindings

    if bindings.available():
        native_seed = seed if isinstance(seed, int) else 0
        nts = sorted(node_types)
        rel_keys = sorted(colptr_np)
        samples_n, rows_n, cols_n, edges_n = bindings.hgt_sample(
            nts, rel_keys, colptr_np, row_np,
            {nt: np.asarray(v, np.int64)
             for nt, v in input_node_dict.items()},
            {nt: list(num_samples_dict.get(nt, [0] * num_hops))
             for nt in nts},
            num_hops, native_seed,
        )
        return (
            {nt: to_index_array(v) for nt, v in samples_n.items()},
            {k: to_index_array(v) for k, v in rows_n.items()},
            {k: to_index_array(v) for k, v in cols_n.items()},
            {k: to_index_array(v) for k, v in edges_n.items()},
        )

    rng = as_generator(seed)

    nodes = {nt: [] for nt in node_types}
    to_local = {nt: {} for nt in node_types}
    budget = {nt: {} for nt in node_types}

    for nt, inp in input_node_dict.items():
        for v in np.asarray(inp, np.int64).tolist():
            if v not in to_local[nt]:
                to_local[nt][v] = len(nodes[nt])
                nodes[nt].append(v)

    for nt in node_types:
        _update_budget(
            budget, nt, nodes[nt], to_local, colptr_np, row_np, rng
        )

    for ell in range(num_hops):
        samples_this_hop = {}
        for nt in node_types:
            num = num_samples_dict.get(nt, [0] * num_hops)[ell]
            samples = _sample_from(budget[nt], num, rng)
            samples_this_hop[nt] = samples
            for v in samples:
                to_local[nt][v] = len(nodes[nt])
                nodes[nt].append(v)
                budget[nt].pop(v, None)
        if ell < num_hops - 1:
            for nt, samples in samples_this_hop.items():
                _update_budget(
                    budget, nt, samples, to_local, colptr_np, row_np, rng
                )

    # Induced typed adjacency over the sampled sets
    # (hgt_sample_cpu.cpp:189-230).
    out_rows, out_cols, out_edges = {}, {}, {}
    for rel, cp in colptr_np.items():
        src_t, _, dst_t = _split_rel(rel)
        rw = row_np[rel]
        seen_src = to_local[src_t]
        rows, cols, edges = [], [], []
        for i, w in enumerate(nodes[dst_t]):
            for offset in range(cp[w], cp[w + 1]):
                v = int(rw[offset])
                loc = seen_src.get(v)
                if loc is not None:
                    rows.append(loc)
                    cols.append(i)
                    edges.append(offset)
        out_rows[rel] = to_index_array(rows)
        out_cols[rel] = to_index_array(cols)
        out_edges[rel] = to_index_array(edges)

    node_out = {
        nt: to_index_array(v)
        for nt, v in nodes.items()
    }
    return node_out, out_rows, out_cols, out_edges
