"""Typed ctypes wrappers over ``libsparse_tpu_native.so``.

Each wrapper returns plain numpy arrays; callers convert to jnp.  All
wrappers are optional — import ``lib`` from this package and check for
``None`` (the pure-numpy fallbacks in ``sample/`` implement identical
semantics, modulo RNG stream).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from . import lib

_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)


def _p(a: np.ndarray):
    return a.ctypes.data_as(_i64p)


def _pd(a: np.ndarray):
    return a.ctypes.data_as(_f64p)


if lib is not None:
    lib.sample_adj.restype = ctypes.c_int64
    lib.relabel_one_hop.restype = ctypes.c_int64
    lib.partition_refine.restype = ctypes.c_int64
    lib.partition_refine.argtypes = [
        _i64p, _i64p, ctypes.c_int64, _i64p, _f64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double,
    ]


def available() -> bool:
    return lib is not None


def multilevel_partition(
    rowptr: np.ndarray, col: np.ndarray, num_parts: int,
    node_weight: Optional[np.ndarray] = None, seed: int = 1,
    imbalance: float = 0.05, edge_weight: Optional[np.ndarray] = None,
    num_workers: int = 0,
) -> Tuple[np.ndarray, int]:
    """METIS-style multilevel k-way partition; returns (cluster, cut).

    ``edge_weight`` (int64, nnz) seeds heavy-edge matching + refinement
    gains (the METIS adjwgt analogue; reference ``weighted=True``).
    ``num_workers > 0`` routes to the threaded entry (the mt-metis
    analogue, reference csrc/metis.cpp:49-69): OpenMP streaming phases
    + CAS-claimed matching; nondeterministic under real concurrency."""
    n = rowptr.shape[0] - 1
    cluster = np.empty(n, np.int64)
    nw = (
        np.ascontiguousarray(node_weight, np.float64)
        if node_weight is not None else None
    )
    ew = (
        np.ascontiguousarray(edge_weight, np.int64)
        if edge_weight is not None else None
    )
    common = (
        _p(np.ascontiguousarray(rowptr, np.int64)),
        _p(np.ascontiguousarray(col, np.int64)),
        ctypes.c_int64(n),
        _pd(nw) if nw is not None else None,
        _p(ew) if ew is not None else None,
        ctypes.c_int64(num_parts), ctypes.c_uint64(seed),
        ctypes.c_double(imbalance),
    )
    if num_workers > 0:
        lib.multilevel_partition_mt.restype = ctypes.c_int64
        cut = lib.multilevel_partition_mt(
            *common, ctypes.c_int64(num_workers), _p(cluster)
        )
    else:
        lib.multilevel_partition_ew.restype = ctypes.c_int64
        cut = lib.multilevel_partition_ew(*common, _p(cluster))
    return cluster, int(cut)


def coarsen_clusters(
    rowptr: np.ndarray, col: np.ndarray, target_clusters: int,
    seed: int = 1, edge_weight: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int]:
    """Fine clusters from the multilevel COARSENING hierarchy alone:
    heavy-edge matching levels until ~``target_clusters`` coarse nodes
    remain; returns (cluster ids per node, n_clusters).  One O(E) pass
    per level — the cheap layout pass behind ``partition_fine`` at
    large fine_parts, where the k-way partitioner's init+refinement
    cost grows with k (native.cpp ``coarsen_clusters``)."""
    n = rowptr.shape[0] - 1
    cluster = np.empty(n, np.int64)
    ew = (
        np.ascontiguousarray(edge_weight, np.int64)
        if edge_weight is not None else None
    )
    lib.coarsen_clusters.restype = ctypes.c_int64
    nc = lib.coarsen_clusters(
        _p(np.ascontiguousarray(rowptr, np.int64)),
        _p(np.ascontiguousarray(col, np.int64)),
        ctypes.c_int64(n),
        _p(ew) if ew is not None else None,
        ctypes.c_int64(int(target_clusters)),
        ctypes.c_uint64(seed), _p(cluster),
    )
    return cluster, int(nc)


def sample_adj(
    rowptr: np.ndarray, col: np.ndarray, idx: np.ndarray,
    num_neighbors: int, replace: bool, seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    n_idx = idx.shape[0]
    deg = rowptr[idx + 1] - rowptr[idx]
    if num_neighbors < 0:
        e_out = int(deg.sum())
    elif replace:
        e_out = int(num_neighbors * (deg > 0).sum())
    else:
        e_out = int(np.minimum(deg, num_neighbors).sum())

    out_rowptr = np.empty(n_idx + 1, np.int64)
    out_col = np.empty(e_out, np.int64)
    out_eid = np.empty(e_out, np.int64)
    n_id = np.empty(n_idx + e_out, np.int64)
    n = lib.sample_adj(
        _p(rowptr), _p(col), ctypes.c_int64(rowptr.shape[0] - 1),
        _p(idx), ctypes.c_int64(n_idx), ctypes.c_int64(num_neighbors),
        ctypes.c_int32(1 if replace else 0), ctypes.c_uint64(seed),
        _p(out_rowptr), _p(out_col), _p(out_eid), _p(n_id),
    )
    return out_rowptr, out_col, out_eid, n_id[:n]


def neighbor_sample(
    colptr: np.ndarray, row: np.ndarray, input_node: np.ndarray,
    num_neighbors: np.ndarray, replace: bool, directed: bool, seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    counts = np.zeros(2, np.int64)
    args = (
        _p(colptr), _p(row), ctypes.c_int64(colptr.shape[0] - 1),
        _p(input_node), ctypes.c_int64(input_node.shape[0]),
        _p(num_neighbors), ctypes.c_int64(num_neighbors.shape[0]),
        ctypes.c_int32(1 if replace else 0),
        ctypes.c_int32(1 if directed else 0), ctypes.c_uint64(seed),
    )
    lib.neighbor_sample(*args, _p(counts), None, None, None, None)
    out_nodes = np.empty(counts[0], np.int64)
    out_rows = np.empty(counts[1], np.int64)
    out_cols = np.empty(counts[1], np.int64)
    out_edges = np.empty(counts[1], np.int64)
    lib.neighbor_sample(
        *args, _p(counts), _p(out_nodes), _p(out_rows), _p(out_cols),
        _p(out_edges),
    )
    return out_nodes, out_rows, out_cols, out_edges


def saint_subgraph(
    rowptr: np.ndarray, col: np.ndarray, idx: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    counts = np.zeros(1, np.int64)
    args = (
        _p(rowptr), _p(col), ctypes.c_int64(rowptr.shape[0] - 1),
        _p(idx), ctypes.c_int64(idx.shape[0]),
    )
    lib.saint_subgraph(*args, _p(counts), None, None, None)
    out_row = np.empty(counts[0], np.int64)
    out_col = np.empty(counts[0], np.int64)
    out_eid = np.empty(counts[0], np.int64)
    lib.saint_subgraph(
        *args, _p(counts), _p(out_row), _p(out_col), _p(out_eid)
    )
    return out_row, out_col, out_eid


def hetero_neighbor_sample(
    node_types, edge_types, colptr_dict, row_dict, input_dict,
    budget_dict, num_hops: int, replace: bool, directed: bool, seed: int,
):
    """Flattened-dict driver for the native typed-graph sampler.

    ``edge_types`` are relation keys 'src__rel__dst' in emission order;
    returns (samples per type, rows/cols/eids per relation) as numpy.
    """
    T, R = len(node_types), len(edge_types)
    tindex = {t: i for i, t in enumerate(node_types)}
    rel_src = np.empty(R, np.int64)
    rel_dst = np.empty(R, np.int64)
    colptr_off = np.zeros(R + 1, np.int64)
    row_off = np.zeros(R + 1, np.int64)
    cps, rws = [], []
    budgets = np.empty(R * num_hops, np.int64)
    for r, rel in enumerate(edge_types):
        src_t, _, dst_t = rel.split("__")
        rel_src[r], rel_dst[r] = tindex[src_t], tindex[dst_t]
        cps.append(np.ascontiguousarray(colptr_dict[rel], np.int64))
        rws.append(np.ascontiguousarray(row_dict[rel], np.int64))
        colptr_off[r + 1] = colptr_off[r] + cps[-1].shape[0]
        row_off[r + 1] = row_off[r] + rws[-1].shape[0]
        budgets[r * num_hops:(r + 1) * num_hops] = budget_dict[rel]
    colptr_cat = np.concatenate(cps) if cps else np.zeros(0, np.int64)
    row_cat = np.concatenate(rws) if rws else np.zeros(0, np.int64)

    inputs_off = np.zeros(T + 1, np.int64)
    inps = []
    for t, nt in enumerate(node_types):
        arr = np.ascontiguousarray(input_dict.get(nt, np.zeros(0)), np.int64)
        inps.append(arr)
        inputs_off[t + 1] = inputs_off[t] + arr.shape[0]
    inputs_cat = np.concatenate(inps) if inps else np.zeros(0, np.int64)

    counts = np.zeros(T + R, np.int64)
    args = (
        ctypes.c_int64(T), ctypes.c_int64(R), ctypes.c_int64(num_hops),
        _p(rel_src), _p(rel_dst), _p(colptr_cat), _p(colptr_off),
        _p(row_cat), _p(row_off), _p(inputs_cat), _p(inputs_off),
        _p(budgets), ctypes.c_int32(1 if replace else 0),
        ctypes.c_int32(1 if directed else 0), ctypes.c_uint64(seed),
    )
    lib.hetero_neighbor_sample(*args, _p(counts), None, None, None, None)
    n_total = int(counts[:T].sum())
    e_total = int(counts[T:].sum())
    nodes_cat = np.empty(n_total, np.int64)
    rows_cat = np.empty(e_total, np.int64)
    cols_cat = np.empty(e_total, np.int64)
    eids_cat = np.empty(e_total, np.int64)
    lib.hetero_neighbor_sample(
        *args, _p(counts), _p(nodes_cat), _p(rows_cat), _p(cols_cat),
        _p(eids_cat),
    )
    samples, rows, cols, eids = {}, {}, {}, {}
    npos = 0
    for t, nt in enumerate(node_types):
        samples[nt] = nodes_cat[npos:npos + counts[t]]
        npos += counts[t]
    epos = 0
    for r, rel in enumerate(edge_types):
        n = counts[T + r]
        rows[rel] = rows_cat[epos:epos + n]
        cols[rel] = cols_cat[epos:epos + n]
        eids[rel] = eids_cat[epos:epos + n]
        epos += n
    return samples, rows, cols, eids


def hgt_sample(
    node_types, edge_types, colptr_dict, row_dict, input_dict,
    num_samples_dict, num_hops: int, seed: int,
):
    """HGT layer-wise importance sampling; num_samples per node type."""
    T, R = len(node_types), len(edge_types)
    tindex = {t: i for i, t in enumerate(node_types)}
    rel_src = np.empty(R, np.int64)
    rel_dst = np.empty(R, np.int64)
    colptr_off = np.zeros(R + 1, np.int64)
    row_off = np.zeros(R + 1, np.int64)
    cps, rws = [], []
    for r, rel in enumerate(edge_types):
        src_t, _, dst_t = rel.split("__")
        rel_src[r], rel_dst[r] = tindex[src_t], tindex[dst_t]
        cps.append(np.ascontiguousarray(colptr_dict[rel], np.int64))
        rws.append(np.ascontiguousarray(row_dict[rel], np.int64))
        colptr_off[r + 1] = colptr_off[r] + cps[-1].shape[0]
        row_off[r + 1] = row_off[r] + rws[-1].shape[0]
    colptr_cat = np.concatenate(cps) if cps else np.zeros(0, np.int64)
    row_cat = np.concatenate(rws) if rws else np.zeros(0, np.int64)

    inputs_off = np.zeros(T + 1, np.int64)
    inps = []
    num_samples = np.zeros(T * num_hops, np.int64)
    for t, nt in enumerate(node_types):
        arr = np.ascontiguousarray(input_dict.get(nt, np.zeros(0)), np.int64)
        inps.append(arr)
        inputs_off[t + 1] = inputs_off[t] + arr.shape[0]
        ns = num_samples_dict.get(nt, [0] * num_hops)
        num_samples[t * num_hops:(t + 1) * num_hops] = ns
    inputs_cat = np.concatenate(inps) if inps else np.zeros(0, np.int64)

    counts = np.zeros(T + R, np.int64)
    args = (
        ctypes.c_int64(T), ctypes.c_int64(R), ctypes.c_int64(num_hops),
        _p(rel_src), _p(rel_dst), _p(colptr_cat), _p(colptr_off),
        _p(row_cat), _p(row_off), _p(inputs_cat), _p(inputs_off),
        _p(num_samples), ctypes.c_uint64(seed),
    )
    lib.hgt_sample(*args, _p(counts), None, None, None, None)
    n_total = int(counts[:T].sum())
    e_total = int(counts[T:].sum())
    nodes_cat = np.empty(n_total, np.int64)
    rows_cat = np.empty(e_total, np.int64)
    cols_cat = np.empty(e_total, np.int64)
    eids_cat = np.empty(e_total, np.int64)
    lib.hgt_sample(
        *args, _p(counts), _p(nodes_cat), _p(rows_cat), _p(cols_cat),
        _p(eids_cat),
    )
    samples, rows, cols, eids = {}, {}, {}, {}
    npos = 0
    for t, nt in enumerate(node_types):
        samples[nt] = nodes_cat[npos:npos + counts[t]]
        npos += counts[t]
    epos = 0
    for r, rel in enumerate(edge_types):
        n = counts[T + r]
        rows[rel] = rows_cat[epos:epos + n]
        cols[rel] = cols_cat[epos:epos + n]
        eids[rel] = eids_cat[epos:epos + n]
        epos += n
    return samples, rows, cols, eids


def hetero_temporal_neighbor_sample(
    node_types, edge_types, colptr_dict, row_dict, input_dict,
    budget_dict, time_dict, num_hops: int, replace: bool, directed: bool,
    seed: int,
):
    """Temporal variant: per-type node times; absent types get
    has_time=0 (no constraint)."""
    T, R = len(node_types), len(edge_types)
    tindex = {t: i for i, t in enumerate(node_types)}
    rel_src = np.empty(R, np.int64)
    rel_dst = np.empty(R, np.int64)
    colptr_off = np.zeros(R + 1, np.int64)
    row_off = np.zeros(R + 1, np.int64)
    cps, rws = [], []
    budgets = np.empty(R * num_hops, np.int64)
    for r, rel in enumerate(edge_types):
        src_t, _, dst_t = rel.split("__")
        rel_src[r], rel_dst[r] = tindex[src_t], tindex[dst_t]
        cps.append(np.ascontiguousarray(colptr_dict[rel], np.int64))
        rws.append(np.ascontiguousarray(row_dict[rel], np.int64))
        colptr_off[r + 1] = colptr_off[r] + cps[-1].shape[0]
        row_off[r + 1] = row_off[r] + rws[-1].shape[0]
        budgets[r * num_hops:(r + 1) * num_hops] = budget_dict[rel]
    colptr_cat = np.concatenate(cps) if cps else np.zeros(0, np.int64)
    row_cat = np.concatenate(rws) if rws else np.zeros(0, np.int64)

    inputs_off = np.zeros(T + 1, np.int64)
    inps = []
    time_off = np.zeros(T + 1, np.int64)
    times = []
    has_time = np.zeros(T, np.int32)
    for t, nt in enumerate(node_types):
        arr = np.ascontiguousarray(input_dict.get(nt, np.zeros(0)), np.int64)
        inps.append(arr)
        inputs_off[t + 1] = inputs_off[t] + arr.shape[0]
        tm = time_dict.get(nt)
        tm = (
            np.ascontiguousarray(tm, np.int64)
            if tm is not None else np.zeros(0, np.int64)
        )
        has_time[t] = 1 if tm.shape[0] else 0
        times.append(tm)
        time_off[t + 1] = time_off[t] + tm.shape[0]
    inputs_cat = np.concatenate(inps) if inps else np.zeros(0, np.int64)
    time_cat = np.concatenate(times) if times else np.zeros(0, np.int64)

    counts = np.zeros(T + R, np.int64)
    args = (
        ctypes.c_int64(T), ctypes.c_int64(R), ctypes.c_int64(num_hops),
        _p(rel_src), _p(rel_dst), _p(colptr_cat), _p(colptr_off),
        _p(row_cat), _p(row_off), _p(inputs_cat), _p(inputs_off),
        _p(budgets), _p(time_cat), _p(time_off),
        has_time.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(1 if replace else 0),
        ctypes.c_int32(1 if directed else 0), ctypes.c_uint64(seed),
    )
    lib.hetero_temporal_neighbor_sample(
        *args, _p(counts), None, None, None, None
    )
    n_total = int(counts[:T].sum())
    e_total = int(counts[T:].sum())
    nodes_cat = np.empty(n_total, np.int64)
    rows_cat = np.empty(e_total, np.int64)
    cols_cat = np.empty(e_total, np.int64)
    eids_cat = np.empty(e_total, np.int64)
    lib.hetero_temporal_neighbor_sample(
        *args, _p(counts), _p(nodes_cat), _p(rows_cat), _p(cols_cat),
        _p(eids_cat),
    )
    samples, rows, cols, eids = {}, {}, {}, {}
    npos = 0
    for t, nt in enumerate(node_types):
        samples[nt] = nodes_cat[npos:npos + counts[t]]
        npos += counts[t]
    epos = 0
    for r, rel in enumerate(edge_types):
        n = counts[T + r]
        rows[rel] = rows_cat[epos:epos + n]
        cols[rel] = cols_cat[epos:epos + n]
        eids[rel] = eids_cat[epos:epos + n]
        epos += n
    return samples, rows, cols, eids


def ego_k_hop(
    rowptr: np.ndarray, col: np.ndarray, seeds: np.ndarray, depth: int,
    num_neighbors: int, replace: bool, seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray]:
    counts = np.zeros(2, np.int64)
    args = (
        _p(rowptr), _p(col), ctypes.c_int64(rowptr.shape[0] - 1),
        _p(seeds), ctypes.c_int64(seeds.shape[0]),
        ctypes.c_int64(depth), ctypes.c_int64(num_neighbors),
        ctypes.c_int32(1 if replace else 0), ctypes.c_uint64(seed),
    )
    lib.ego_k_hop(*args, _p(counts), None, None, None, None, None, None)
    out_row = np.empty(counts[1], np.int64)
    out_col = np.empty(counts[1], np.int64)
    out_eid = np.empty(counts[1], np.int64)
    out_nid = np.empty(counts[0], np.int64)
    out_ptr = np.empty(seeds.shape[0] + 1, np.int64)
    out_root = np.empty(seeds.shape[0], np.int64)
    lib.ego_k_hop(
        *args, _p(counts), _p(out_row), _p(out_col), _p(out_eid),
        _p(out_nid), _p(out_ptr), _p(out_root),
    )
    return out_row, out_col, out_eid, out_nid, out_ptr, out_root


def relabel_one_hop(
    rowptr: np.ndarray, col: np.ndarray, idx: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    deg = rowptr[idx + 1] - rowptr[idx]
    e_out = int(deg.sum())
    out_rowptr = np.empty(idx.shape[0] + 1, np.int64)
    out_col = np.empty(e_out, np.int64)
    out_eid = np.empty(e_out, np.int64)
    n_id = np.empty(idx.shape[0] + e_out, np.int64)
    n = lib.relabel_one_hop(
        _p(rowptr), _p(col), _p(idx), ctypes.c_int64(idx.shape[0]),
        _p(out_rowptr), _p(out_col), _p(out_eid), _p(n_id),
    )
    return out_rowptr, out_col, out_eid, n_id[:n]


def random_walk(
    rowptr: np.ndarray, col: np.ndarray, start: np.ndarray,
    walk_length: int, seed: int,
) -> np.ndarray:
    out = np.empty((start.shape[0], walk_length + 1), np.int64)
    lib.random_walk(
        _p(rowptr), _p(col), _p(start), ctypes.c_int64(start.shape[0]),
        ctypes.c_int64(walk_length), ctypes.c_uint64(seed), _p(out),
    )
    return out


def partition_refine(
    rowptr: np.ndarray, col: np.ndarray, cluster: np.ndarray,
    node_w: np.ndarray, num_parts: int, passes: int = 4,
    imbalance: float = 0.1,
) -> np.ndarray:
    cluster = np.ascontiguousarray(cluster, np.int64)
    lib.partition_refine(
        _p(rowptr), _p(col), ctypes.c_int64(rowptr.shape[0] - 1),
        _p(cluster), _pd(np.ascontiguousarray(node_w, np.float64)),
        ctypes.c_int64(num_parts), ctypes.c_int64(passes),
        ctypes.c_double(imbalance),
    )
    return cluster


def spgemm(
    rowptrA: np.ndarray, colA: np.ndarray, valA: Optional[np.ndarray],
    rowptrB: np.ndarray, colB: np.ndarray, valB: Optional[np.ndarray],
    P: int, row_lo: int = 0, row_hi: Optional[int] = None,
    count_only: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Gustavson SpGEMM over the A-row range [row_lo, row_hi).

    Returns (rowptrC, colC, valC) with rowptrC local to the range
    (length ``row_hi - row_lo + 1``), colC ascending per row, valC float64
    (None when both inputs are unweighted).  ``count_only=True`` skips
    the numeric pass: only rowptrC is filled (colC/valC are None) — the
    structure-count mode for products whose output would not fit.
    """
    if row_hi is None:
        row_hi = rowptrA.shape[0] - 1
    rowptrA = np.ascontiguousarray(rowptrA, np.int64)
    colA = np.ascontiguousarray(colA, np.int64)
    rowptrB = np.ascontiguousarray(rowptrB, np.int64)
    colB = np.ascontiguousarray(colB, np.int64)
    va = None if valA is None else np.ascontiguousarray(valA, np.float64)
    vb = None if valB is None else np.ascontiguousarray(valB, np.float64)
    rowptrC = np.empty(row_hi - row_lo + 1, np.int64)
    lib.spgemm_nnz.restype = ctypes.c_int64
    nnz = lib.spgemm_nnz(
        _p(rowptrA), _p(colA), _p(rowptrB), _p(colB), ctypes.c_int64(P),
        ctypes.c_int64(row_lo), ctypes.c_int64(row_hi), _p(rowptrC),
    )
    if count_only:
        return rowptrC, None, None
    colC = np.empty(nnz, np.int64)
    with_val = va is not None or vb is not None
    valC = np.empty(nnz, np.float64) if with_val else None
    lib.spgemm_fill(
        _p(rowptrA), _p(colA), None if va is None else _pd(va),
        _p(rowptrB), _p(colB), None if vb is None else _pd(vb),
        ctypes.c_int64(P), ctypes.c_int64(row_lo), ctypes.c_int64(row_hi),
        _p(rowptrC), _p(colC), None if valC is None else _pd(valC),
    )
    return rowptrC, colC, valC


_u64p = ctypes.POINTER(ctypes.c_uint64)


def radix_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of non-negative uint64 keys (native LSD radix).

    Bit-identical to ``np.argsort(keys, kind="stable")`` (both stable);
    the TPU-host analogue of the reference's optional
    ``pyg_lib.ops.index_sort`` acceleration (``torch_sparse/utils.py:
    14-21``).  Callers must guarantee non-negative keys.
    """
    keys = np.ascontiguousarray(keys, np.uint64)
    n = keys.shape[0]
    perm = np.empty(n, np.int64)
    lib.radix_argsort_u64.restype = None
    lib.radix_argsort_u64(
        keys.ctypes.data_as(_u64p), ctypes.c_int64(n), _p(perm)
    )
    return perm


def lexsort_pair(hi: np.ndarray, lo: np.ndarray, lo_range: int) -> np.ndarray:
    """``np.lexsort((lo, hi))`` for non-negative index arrays: stable
    order by ``hi`` then ``lo``, with ``lo < lo_range``.  Key build +
    radix argsort run natively (see native.cpp ``lexsort_i64_pair``)."""
    hi = np.ascontiguousarray(hi, np.int64)
    lo = np.ascontiguousarray(lo, np.int64)
    n = hi.shape[0]
    perm = np.empty(n, np.int64)
    lib.lexsort_i64_pair.restype = None
    lib.lexsort_i64_pair(
        _p(hi), _p(lo), ctypes.c_int64(n), ctypes.c_int64(lo_range),
        _p(perm),
    )
    return perm


def lexsort_pair_decode(
    hi: np.ndarray, lo: np.ndarray, lo_range: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``lexsort_pair`` + the sorted arrays themselves: returns
    ``(perm, hi[perm], lo[perm])`` with the sorted outputs decoded from
    the sorted combined keys instead of random-gathered (native.cpp
    ``lexsort_i64_pair_decode``)."""
    hi = np.ascontiguousarray(hi, np.int64)
    lo = np.ascontiguousarray(lo, np.int64)
    n = hi.shape[0]
    perm = np.empty(n, np.int64)
    hi_out = np.empty(n, np.int64)
    lo_out = np.empty(n, np.int64)
    lib.lexsort_i64_pair_decode.restype = None
    lib.lexsort_i64_pair_decode(
        _p(hi), _p(lo), ctypes.c_int64(n), ctypes.c_int64(lo_range),
        _p(perm), _p(hi_out), _p(lo_out),
    )
    return perm, hi_out, lo_out


def sort_edges(
    row: np.ndarray, col: np.ndarray, val: Optional[np.ndarray],
    M: int, col_range: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical (row, col) sort with the value carried as the radix
    payload (native.cpp sort_edges_*): returns sorted
    ``(row, col, val_or_perm)``.  When ``val`` is None (or not f32/f64
    1-D) the third output is the sort permutation instead.

    Requires ``0 <= row < M``, ``0 <= col < col_range`` and
    ``M * col_range`` to fit in uint64 (callers check)."""
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    n = row.shape[0]
    row_out = np.empty(n, np.int64)
    col_out = np.empty(n, np.int64)
    if val is not None and val.ndim == 1 and val.dtype in (
        np.float32, np.float64
    ):
        val = np.ascontiguousarray(val)
        val_out = np.empty(n, val.dtype)
        fn = (lib.sort_edges_f32 if val.dtype == np.float32
              else lib.sort_edges_f64)
        fn.restype = None
        fn(
            _p(row), _p(col), _vp(val), ctypes.c_int64(n),
            ctypes.c_int64(M), ctypes.c_int64(col_range),
            _p(row_out), _p(col_out), _vp(val_out),
        )
        return row_out, col_out, val_out
    perm = np.empty(n, np.int64)
    lib.sort_edges_perm.restype = None
    lib.sort_edges_perm(
        _p(row), _p(col), ctypes.c_int64(n), ctypes.c_int64(M),
        ctypes.c_int64(col_range), _p(row_out), _p(col_out), _p(perm),
    )
    return row_out, col_out, perm


def _idx_pair(row: np.ndarray, col: np.ndarray):
    """Common-dtype contiguous views + the native idx_dtype code."""
    if row.dtype == np.int32 and col.dtype == np.int32:
        code = 1
    else:
        code = 0
        row = np.ascontiguousarray(row, np.int64)
        col = np.ascontiguousarray(col, np.int64)
    return np.ascontiguousarray(row), np.ascontiguousarray(col), code


def _vp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def sorted_has_dup(row: np.ndarray, col: np.ndarray) -> bool:
    """Any adjacent duplicate (row, col) pair in canonically sorted COO?
    Early-exits at the first duplicate (native.cpp sorted_has_dup)."""
    row, col, code = _idx_pair(row, col)
    lib.sorted_has_dup.restype = ctypes.c_int64
    return bool(lib.sorted_has_dup(
        _vp(row), _vp(col), ctypes.c_int64(row.shape[0]),
        ctypes.c_int64(code),
    ))


def coalesce_fill(
    row: np.ndarray, col: np.ndarray, want_seg: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Dedupe sorted COO in two native sweeps: returns
    ``(row_out, col_out, starts, seg)`` where ``starts`` has length
    ``nnz_out + 1`` (``starts[-1] == E``) and ``seg`` (when requested)
    maps each input edge to its output slot.  Output index dtype follows
    the inputs (int32 kept int32); ``seg`` is int32 whenever E < 2**31
    (it feeds a device push — half the bytes)."""
    row, col, code = _idx_pair(row, col)
    n = row.shape[0]
    lib.coalesce_count.restype = ctypes.c_int64
    m = int(lib.coalesce_count(
        _vp(row), _vp(col), ctypes.c_int64(n), ctypes.c_int64(code)
    ))
    row_out = np.empty(m, row.dtype)
    col_out = np.empty(m, col.dtype)
    starts = np.empty(m + 1, np.int64)
    seg_dtype = np.int32 if n < 2**31 else np.int64
    seg = np.empty(n, seg_dtype) if want_seg else None
    lib.coalesce_fill.restype = None
    lib.coalesce_fill(
        _vp(row), _vp(col), ctypes.c_int64(n), ctypes.c_int64(code),
        _vp(row_out), _vp(col_out), _p(starts),
        None if seg is None else _vp(seg),
        ctypes.c_int64(1 if seg_dtype == np.int32 else 0),
    )
    return row_out, col_out, starts, seg


def segment_reduce_val(
    val: np.ndarray, starts: np.ndarray, mode: str
) -> np.ndarray:
    """Per-segment reduce of edge-sorted values; f32/f64, any trailing
    feature shape (flattened to K).  mode in sum/add/mean/min/max; mean
    accumulates in float64 like the numpy host path."""
    code = {"sum": 0, "add": 0, "mean": 1, "min": 2, "max": 3}[mode]
    dt = 1 if val.dtype == np.float32 else 2
    assert val.dtype in (np.float32, np.float64)
    val = np.ascontiguousarray(val)
    n = val.shape[0]
    K = int(np.prod(val.shape[1:], dtype=np.int64)) if val.ndim > 1 else 1
    m = starts.shape[0] - 1
    out = np.empty((m,) + val.shape[1:], val.dtype)
    starts = np.ascontiguousarray(starts, np.int64)
    lib.segment_reduce_val.restype = None
    lib.segment_reduce_val(
        _vp(val), ctypes.c_int64(K), ctypes.c_int64(dt), _p(starts),
        ctypes.c_int64(m), ctypes.c_int64(code), _vp(out),
    )
    return out
