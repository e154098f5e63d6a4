"""Multi-hop neighbor sampling, CSC-driven (reference
``csrc/cpu/neighbor_sample_cpu.cpp``): the loader primitives behind PyG's
``NeighborLoader``.  Edge direction convention: an edge (src -> dst) is
stored with ``colptr`` over dst and ``row`` holding src — sampling walks
*incoming* edges of the current frontier.

Three variants, same shapes as the reference ops
(``csrc/neighbor_sample.cpp:20-66``):

* ``neighbor_sample``           -- homogeneous
* ``hetero_neighbor_sample``    -- typed nodes/edges, per-relation budgets
* ``hetero_temporal_neighbor_sample`` -- additionally constrains sampled
  sources to ``time[src] <= time[root seed]`` and keeps per-seed disjoint
  computation trees (reference keys its maps by (node, root)).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.convert import INDEX_DTYPE, to_index_array
from ._common import Seed, as_generator, sample_per_row


def _as_np(x):
    return np.asarray(x, np.int64)


def _sample_row_range(count, num, replace, rng):
    """Offsets to sample within one node's edge range, mirroring the
    reference's three branches (full / replace / without-replacement)."""
    if count == 0:
        return np.zeros(0, np.int64)
    if num < 0 or (not replace and num >= count):
        return np.arange(count)
    if replace:
        return rng.integers(0, count, num)
    return rng.choice(count, size=num, replace=False)


def neighbor_sample(
    colptr: jnp.ndarray,
    row: jnp.ndarray,
    input_node: jnp.ndarray,
    num_neighbors: List[int],
    replace: bool = False,
    directed: bool = True,
    seed: Seed = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (node_id, row_local, col_local, edge_id)."""
    colptr_np, row_np = _as_np(colptr), _as_np(row)
    inp = _as_np(input_node)

    from ..csrc import bindings

    if bindings.available():
        native_seed = seed if isinstance(seed, int) else 0
        nodes, rows, cols, edges = bindings.neighbor_sample(
            np.ascontiguousarray(colptr_np), np.ascontiguousarray(row_np),
            np.ascontiguousarray(inp),
            np.ascontiguousarray(num_neighbors, np.int64),
            replace, directed, native_seed,
        )
        return (
            to_index_array(nodes), to_index_array(rows),
            to_index_array(cols), to_index_array(edges),
        )

    rng = as_generator(seed)

    samples: List[int] = inp.tolist()
    to_local = {int(v): i for i, v in enumerate(samples)}
    rows, cols, edges = [], [], []

    begin, end = 0, len(samples)
    for num in num_neighbors:
        for i in range(begin, end):
            w = samples[i]
            start = colptr_np[w]
            count = colptr_np[w + 1] - start
            for off in _sample_row_range(count, num, replace, rng):
                offset = int(start + off)
                v = int(row_np[offset])
                loc = to_local.setdefault(v, len(samples))
                if loc == len(samples):
                    samples.append(v)
                if directed:
                    rows.append(loc)
                    cols.append(i)
                    edges.append(offset)
        begin, end = end, len(samples)

    if not directed:
        for i, w in enumerate(samples):
            for offset in range(colptr_np[w], colptr_np[w + 1]):
                v = int(row_np[offset])
                loc = to_local.get(v)
                if loc is not None:
                    rows.append(loc)
                    cols.append(i)
                    edges.append(offset)

    return (
        to_index_array(samples),
        to_index_array(rows),
        to_index_array(cols),
        to_index_array(edges),
    )


def _rel_key(edge_type) -> str:
    """'src__rel__dst' string key for an (src, rel, dst) edge type."""
    if isinstance(edge_type, str):
        return edge_type
    return "__".join(edge_type)


def _split_rel(rel: str) -> Tuple[str, str, str]:
    src, r, dst = rel.split("__")
    return src, r, dst


def hetero_neighbor_sample(
    node_types: List[str],
    edge_types: List,
    colptr_dict: Dict[str, jnp.ndarray],
    row_dict: Dict[str, jnp.ndarray],
    input_node_dict: Dict[str, jnp.ndarray],
    num_neighbors_dict: Dict[str, List[int]],
    num_hops: int,
    replace: bool = False,
    directed: bool = True,
    seed: Seed = None,
):
    """Returns dicts (node_id per node type; row/col/edge_id per edge
    type key 'src__rel__dst')."""
    colptr_np = {k: _as_np(v) for k, v in colptr_dict.items()}
    row_np = {k: _as_np(v) for k, v in row_dict.items()}

    from ..csrc import bindings

    if bindings.available():
        native_seed = seed if isinstance(seed, int) else 0
        rel_keys = [_rel_key(et) for et in edge_types]
        samples_n, rows_n, cols_n, edges_n = bindings.hetero_neighbor_sample(
            list(node_types), rel_keys, colptr_np, row_np,
            {nt: _as_np(v) for nt, v in input_node_dict.items()},
            {k: list(num_neighbors_dict[k]) for k in rel_keys},
            num_hops, replace, directed, native_seed,
        )
        return (
            {nt: to_index_array(v) for nt, v in samples_n.items()},
            {k: to_index_array(v) for k, v in rows_n.items()},
            {k: to_index_array(v) for k, v in cols_n.items()},
            {k: to_index_array(v) for k, v in edges_n.items()},
        )

    rng = as_generator(seed)
    samples = {nt: [] for nt in node_types}
    to_local = {nt: {} for nt in node_types}
    for nt, nodes in input_node_dict.items():
        for v in _as_np(nodes).tolist():
            to_local[nt].setdefault(v, len(samples[nt]))
            samples[nt].append(v)

    rows = {_rel_key(et): [] for et in edge_types}
    cols = {_rel_key(et): [] for et in edge_types}
    edges = {_rel_key(et): [] for et in edge_types}

    begin = {nt: 0 for nt in node_types}
    end = {nt: len(samples[nt]) for nt in node_types}

    for ell in range(num_hops):
        new_begin = {nt: len(samples[nt]) for nt in node_types}
        for et in edge_types:
            rel = _rel_key(et)
            src_t, _, dst_t = _split_rel(rel)
            budget = num_neighbors_dict[rel][ell]
            cp, rw = colptr_np[rel], row_np[rel]
            for i in range(begin[dst_t], end[dst_t]):
                w = samples[dst_t][i]
                start = cp[w]
                count = cp[w + 1] - start
                for off in _sample_row_range(count, budget, replace, rng):
                    offset = int(start + off)
                    v = int(rw[offset])
                    loc = to_local[src_t].setdefault(v, len(samples[src_t]))
                    if loc == len(samples[src_t]):
                        samples[src_t].append(v)
                    if directed:
                        rows[rel].append(loc)
                        cols[rel].append(i)
                        edges[rel].append(offset)
        for nt in node_types:
            begin[nt], end[nt] = end[nt], len(samples[nt])

    if not directed:
        for et in edge_types:
            rel = _rel_key(et)
            src_t, _, dst_t = _split_rel(rel)
            cp, rw = colptr_np[rel], row_np[rel]
            for i, w in enumerate(samples[dst_t]):
                for offset in range(cp[w], cp[w + 1]):
                    v = int(rw[offset])
                    loc = to_local[src_t].get(v)
                    if loc is not None:
                        rows[rel].append(loc)
                        cols[rel].append(i)
                        edges[rel].append(offset)

    node_out = {
        nt: to_index_array(s)
        for nt, s in samples.items()
    }
    to_arr = lambda d: {  # noqa: E731
        k: to_index_array(v)
        for k, v in d.items()
    }
    return node_out, to_arr(rows), to_arr(cols), to_arr(edges)


def hetero_temporal_neighbor_sample(
    node_types: List[str],
    edge_types: List,
    colptr_dict: Dict[str, jnp.ndarray],
    row_dict: Dict[str, jnp.ndarray],
    input_node_dict: Dict[str, jnp.ndarray],
    num_neighbors_dict: Dict[str, List[int]],
    node_time_dict: Dict[str, jnp.ndarray],
    num_hops: int,
    replace: bool = False,
    directed: bool = True,
    seed: Seed = None,
):
    """Temporal variant: a sampled source must satisfy
    ``time[src] <= time[root seed]`` (reference ``satisfy_time``,
    ``neighbor_sample_cpu.cpp:119-130``), and computation trees of
    different roots stay disjoint — node ids are keyed (node, root), so
    the same original node may appear once per seed."""
    colptr_np = {k: _as_np(v) for k, v in colptr_dict.items()}
    row_np = {k: _as_np(v) for k, v in row_dict.items()}
    time_np = {k: _as_np(v) for k, v in node_time_dict.items()}

    from ..csrc import bindings

    if bindings.available():
        native_seed = seed if isinstance(seed, int) else 0
        rel_keys = [_rel_key(et) for et in edge_types]
        out = bindings.hetero_temporal_neighbor_sample(
            list(node_types), rel_keys, colptr_np, row_np,
            {nt: _as_np(v) for nt, v in input_node_dict.items()},
            {k: list(num_neighbors_dict[k]) for k in rel_keys},
            time_np, num_hops, replace, directed, native_seed,
        )
        samples_n, rows_n, cols_n, edges_n = out
        return (
            {nt: to_index_array(v) for nt, v in samples_n.items()},
            {k: to_index_array(v) for k, v in rows_n.items()},
            {k: to_index_array(v) for k, v in cols_n.items()},
            {k: to_index_array(v) for k, v in edges_n.items()},
        )

    rng = as_generator(seed)
    # samples[nt]: list of (node, root_time); to_local keyed (node, root_id)
    samples = {nt: [] for nt in node_types}
    root_time = {nt: [] for nt in node_types}
    to_local = {nt: {} for nt in node_types}
    root_counter = 0
    for nt in node_types:  # fixed type order (matches the native kernel)
        for v in _as_np(input_node_dict.get(nt, np.zeros(0))).tolist():
            t = int(time_np[nt][v]) if nt in time_np else np.iinfo(np.int64).max
            to_local[nt][(v, root_counter)] = len(samples[nt])
            samples[nt].append(v)
            root_time[nt].append((t, root_counter))
            root_counter += 1

    rows = {_rel_key(et): [] for et in edge_types}
    cols = {_rel_key(et): [] for et in edge_types}
    edges = {_rel_key(et): [] for et in edge_types}

    begin = {nt: 0 for nt in node_types}
    end = {nt: len(samples[nt]) for nt in node_types}

    for ell in range(num_hops):
        for et in edge_types:
            rel = _rel_key(et)
            src_t, _, dst_t = _split_rel(rel)
            budget = num_neighbors_dict[rel][ell]
            cp, rw = colptr_np[rel], row_np[rel]
            for i in range(begin[dst_t], end[dst_t]):
                w = samples[dst_t][i]
                t_root, root = root_time[dst_t][i]
                start = cp[w]
                count = cp[w + 1] - start
                if count == 0:
                    continue
                # Filter candidate edges by the time constraint first,
                # then sample from the admissible set.
                cand = rw[start:start + count]
                if src_t in time_np:
                    ok = np.nonzero(time_np[src_t][cand] <= t_root)[0]
                else:
                    ok = np.arange(count)
                for off in _sample_row_range(
                    ok.shape[0], budget, replace, rng
                ):
                    offset = int(start + ok[off])
                    v = int(rw[offset])
                    key = (v, root)
                    loc = to_local[src_t].setdefault(key, len(samples[src_t]))
                    if loc == len(samples[src_t]):
                        samples[src_t].append(v)
                        root_time[src_t].append((t_root, root))
                    if directed:
                        rows[rel].append(loc)
                        cols[rel].append(i)
                        edges[rel].append(offset)
        for nt in node_types:
            begin[nt], end[nt] = end[nt], len(samples[nt])

    node_out = {
        nt: to_index_array(s)
        for nt, s in samples.items()
    }
    to_arr = lambda d: {  # noqa: E731
        k: to_index_array(v)
        for k, v in d.items()
    }
    return node_out, to_arr(rows), to_arr(cols), to_arr(edges)
