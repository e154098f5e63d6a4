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

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.convert import to_index_array
from ._common import Seed, as_generator
from ..utils.host_sort import stable_argsort


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


# Bound on the (rows x max-degree) random-key matrix used by the
# vectorized without-replacement draw; frontiers with hub nodes are
# processed in row chunks that respect it.
_WO_REPLACE_BUDGET = 1 << 24


def _expand_full(starts: np.ndarray, counts: np.ndarray):
    """All (frontier-row, edge-offset) pairs of a CSR-range frontier:
    returns (rix, offsets) with ``rix`` the frontier-row index of each
    edge and ``offsets`` absolute into the edge arrays, both grouped by
    row in ascending offset order (the loop formulation's order)."""
    total = int(counts.sum())
    rix = np.repeat(np.arange(counts.shape[0]), counts)
    off = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return rix, starts[rix] + off


def _sample_frontier(starts, counts, num, replace, rng):
    """Vectorized ``_sample_row_range`` over a whole frontier.

    Returns (rix, offsets) like :func:`_expand_full`.  The reference
    fallback looped Python per edge (O(E_sampled) interpreter overhead);
    this draws every row's sample in a handful of numpy ops.  RNG draws
    differ from the per-row loop but stay seeded-deterministic.
    """
    if num < 0:
        return _expand_full(starts, counts)
    if replace:
        sel = np.flatnonzero(counts > 0)
        if sel.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        draw = rng.integers(
            0, counts[sel][:, None], size=(sel.size, num)
        )
        rix = np.repeat(sel, num)
        return rix, (starts[sel][:, None] + draw).reshape(-1)
    # Without replacement: rows with count <= num take everything (in
    # offset order, matching the loop's full branch); the rest pick the
    # ``num`` smallest of per-edge random keys (uniform w/o replacement).
    full = counts <= num
    rix_f, off_f = _expand_full(starts[full], counts[full])
    rix_parts = [np.flatnonzero(full)[rix_f]]
    off_parts = [off_f]
    sel = np.flatnonzero(~full)
    pos = 0
    while pos < sel.size:
        maxc = int(counts[sel[pos:]].max())
        n_rows = max(1, _WO_REPLACE_BUDGET // maxc)
        chunk = sel[pos:pos + n_rows]
        pos += n_rows
        c = counts[chunk]
        maxc = int(c.max())
        keys = rng.random((chunk.size, maxc))
        keys[np.arange(maxc)[None, :] >= c[:, None]] = np.inf
        pick = np.argpartition(keys, num - 1, axis=1)[:, :num]
        rix_parts.append(np.repeat(chunk, num))
        off_parts.append((starts[chunk][:, None] + pick).reshape(-1))
    rix = np.concatenate(rix_parts)
    offs = np.concatenate(off_parts)
    # Regroup by frontier row (stable: full rows keep offset order).
    order = stable_argsort(rix)
    return rix[order], offs[order]


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

    # Vectorized fallback (SURVEY.md §3.5: unique/searchsorted replace
    # the reference's hash maps): per hop, one frontier-wide draw and an
    # O(1) array lookup instead of a per-edge Python loop.  Discovery
    # order of new nodes matches the loop formulation (edges grouped by
    # frontier row; first occurrence appends), so the deterministic
    # full-neighborhood outputs are bit-identical to the native kernel.
    n_total = colptr_np.shape[0] - 1
    local_of = np.full(n_total, -1, np.int64)
    local_of[inp] = np.arange(inp.shape[0])
    samples = [inp]
    n_samples = inp.shape[0]
    rows_l, cols_l, edges_l = [], [], []

    frontier = inp
    frontier_base = 0
    for num in num_neighbors:
        if frontier.shape[0] == 0:
            break
        starts = colptr_np[frontier]
        counts = colptr_np[frontier + 1] - starts
        rix, offsets = _sample_frontier(starts, counts, num, replace, rng)
        v = row_np[offsets]
        # Append unseen sources in first-occurrence order.
        unseen = local_of[v] < 0
        vi = v[unseen]
        uniq, first = np.unique(vi, return_index=True)
        new_nodes = uniq[np.argsort(first, kind="stable")]
        local_of[new_nodes] = n_samples + np.arange(new_nodes.shape[0])
        samples.append(new_nodes)
        if directed:
            rows_l.append(local_of[v])
            cols_l.append(frontier_base + rix)
            edges_l.append(offsets)
        frontier_base = n_samples
        n_samples += new_nodes.shape[0]
        frontier = new_nodes

    all_samples = (
        samples[0] if len(samples) == 1 else np.concatenate(samples)
    )
    if not directed:
        # Induced edges over the full sample set: scan every sampled
        # node's in-edges, keep those whose source was sampled.
        starts = colptr_np[all_samples]
        counts = colptr_np[all_samples + 1] - starts
        rix, offsets = _expand_full(starts, counts)
        v = row_np[offsets]
        keep = local_of[v] >= 0
        rows_l = [local_of[v[keep]]]
        cols_l = [rix[keep]]
        edges_l = [offsets[keep]]

    def _cat(parts):
        return (
            np.concatenate(parts) if parts else np.zeros(0, np.int64)
        )

    return (
        to_index_array(all_samples),
        to_index_array(_cat(rows_l)),
        to_index_array(_cat(cols_l)),
        to_index_array(_cat(edges_l)),
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

    # Vectorized like the homogeneous fallback: one frontier-wide draw
    # per (hop, edge type) and array-backed relabel maps sized from the
    # per-type id spaces (colptr for dst roles, row values for src).
    n_of = {nt: 0 for nt in node_types}
    for et in edge_types:
        rel = _rel_key(et)
        src_t, _, dst_t = _split_rel(rel)
        n_of[dst_t] = max(n_of[dst_t], colptr_np[rel].shape[0] - 1)
        if row_np[rel].size:
            n_of[src_t] = max(n_of[src_t], int(row_np[rel].max()) + 1)
    for nt, nodes in input_node_dict.items():
        arr = _as_np(nodes)
        if arr.size:
            n_of[nt] = max(n_of[nt], int(arr.max()) + 1)

    local_of = {nt: np.full(n_of[nt], -1, np.int64) for nt in node_types}
    samples = {}
    for nt in node_types:
        arr = _as_np(input_node_dict.get(nt, np.zeros(0, np.int64)))
        local_of[nt][arr] = np.arange(arr.shape[0])
        samples[nt] = arr

    rows = {_rel_key(et): [] for et in edge_types}
    cols = {_rel_key(et): [] for et in edge_types}
    edges = {_rel_key(et): [] for et in edge_types}

    begin = {nt: 0 for nt in node_types}
    end = {nt: samples[nt].shape[0] for nt in node_types}

    for ell in range(num_hops):
        for et in edge_types:
            rel = _rel_key(et)
            src_t, _, dst_t = _split_rel(rel)
            budget = num_neighbors_dict[rel][ell]
            cp, rw = colptr_np[rel], row_np[rel]
            frontier = samples[dst_t][begin[dst_t]:end[dst_t]]
            if frontier.shape[0] == 0:
                continue
            starts = cp[frontier]
            counts = cp[frontier + 1] - starts
            rix, offsets = _sample_frontier(
                starts, counts, budget, replace, rng
            )
            v = rw[offsets]
            unseen = local_of[src_t][v] < 0
            uniq, first = np.unique(v[unseen], return_index=True)
            new_nodes = uniq[np.argsort(first, kind="stable")]
            local_of[src_t][new_nodes] = (
                samples[src_t].shape[0] + np.arange(new_nodes.shape[0])
            )
            samples[src_t] = np.concatenate([samples[src_t], new_nodes])
            if directed:
                rows[rel].append(local_of[src_t][v])
                cols[rel].append(begin[dst_t] + rix)
                edges[rel].append(offsets)
        for nt in node_types:
            begin[nt], end[nt] = end[nt], samples[nt].shape[0]

    if not directed:
        for et in edge_types:
            rel = _rel_key(et)
            src_t, _, dst_t = _split_rel(rel)
            cp, rw = colptr_np[rel], row_np[rel]
            starts = cp[samples[dst_t]]
            counts = cp[samples[dst_t] + 1] - starts
            rix, offsets = _expand_full(starts, counts)
            v = rw[offsets]
            keep = local_of[src_t][v] >= 0
            rows[rel] = [local_of[src_t][v[keep]]]
            cols[rel] = [rix[keep]]
            edges[rel] = [offsets[keep]]

    node_out = {nt: to_index_array(s) for nt, s in samples.items()}
    to_arr = lambda d: {  # noqa: E731
        k: to_index_array(
            np.concatenate(v) if v else np.zeros(0, np.int64)
        )
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
