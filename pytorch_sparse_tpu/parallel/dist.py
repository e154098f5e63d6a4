"""Row-partitioned distributed SpMM over a device mesh.

New work relative to the reference (it has no distributed runtime,
SURVEY.md §2.3); the layout contract follows the reference's METIS
``partition`` output (``partptr`` row blocks, ``metis.py:24-75``) and the
block-diagonal composition primitives (``cat_diag`` / ``__narrow_diag__``).

Two SpMM schedules:

* ``dist_spmm_allgather`` — each shard all-gathers the dense operand, then
  reduces its own row block.  One collective, simple, best when K is small
  or the graph is dense enough that every shard touches most column blocks.
* ``dist_spmm_ring`` — the dense operand's row blocks rotate around the
  mesh ring with ``ppermute`` while each shard consumes the edge *bucket*
  targeting the currently-resident block; compute at step ``s`` overlaps
  the transfer for step ``s+1`` (ring-attention-style KV rotation, over ICI
  on hardware).  Peak memory per chip: one X block instead of all of X.
* ``dist_spmm_halo`` — each shard ships only the X rows that remote
  shards actually reference (the *halo*): one ``all_to_all`` of
  fixed-width halo packets, overlapped with the interior (local-column)
  SpMM, then a frontier SpMM over the received buffer.  Traffic per chip
  is ``P * H_max * K * 4`` bytes where ``H_max`` is the worst (shard,
  shard) distinct-remote-column count — on METIS-partitioned graphs
  orders of magnitude below the ring's full-block rotation, which is
  what makes the ≥70% weak-scaling target reachable on low-cut graphs
  (BASELINE.md).  This is the "METIS partitions drive the distribution
  to minimize halo traffic" mechanism of the north star.

Edges live in fixed-shape padded buckets so every schedule is a static-shape
``shard_map`` program: bucket ``(p, q)`` holds shard ``p``'s edges whose
column falls in block ``q``, padded with zero-valued self-edges.

Local compute is scatter-free: each bucket additionally carries
degree-bucketed ELLPACK tables (shared static shapes across all shards so
the ``shard_map`` program stays SPMD-uniform), turning the per-step
reduction into take + fixed-width row sums + one permutation gather —
the same formulation as the single-chip fast path (ops/kernels/ell.py),
which beats XLA's scatter lowering ~3x on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tensor import SparseTensor
from .mesh import data_axis, feat_axis
from ..utils.host_sort import stable_argsort


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _extract_coo(A: SparseTensor):
    """``(row, col, value_f32, eid, E)`` host arrays — the common
    preamble of every sharded-matrix constructor (missing values become
    implicit ones, like the reference SpMM)."""
    row = np.asarray(A.storage.row()).astype(np.int64)
    col = np.asarray(A.storage.col()).astype(np.int64)
    value = A.storage.value()
    value_np = (
        np.asarray(value).astype(np.float32)
        if value is not None
        else np.ones(row.shape, np.float32)
    )
    E = row.shape[0]
    return row, col, value_np, np.arange(E, dtype=np.int64), E


def _extreme(dtype, is_min):
    """Identity element for a masked min/max in ``dtype`` — the true
    dtype limits, like the reference's Reducer template (reducer.h:43-62).
    Safe here because padding slots are replaced wholesale with
    ``jnp.where`` (never multiplied), so ``inf`` cannot produce NaNs."""
    d = jnp.dtype(dtype)
    if jnp.issubdtype(d, jnp.floating):
        v = jnp.inf if is_min else -jnp.inf
    else:
        info = jnp.iinfo(d)
        v = info.max if is_min else info.min
    return jnp.asarray(v, d)


def _build_group_ell(
    groups: List[Tuple[np.ndarray, ...]],
    Mb: int,
    max_buckets: int = 6,
    sentinel: int = 0,
    E_total: int = 0,
):
    """Shared-shape ELLPACK tables for a list of edge groups.

    Each group is ``(local_row, gather_idx, value, edge_id)``.  Returns
    ``(itabs, vtabs, etabs, invs, caps)`` where ``itabs[k]`` has shape
    ``(G, R_k, caps[k])`` (gather index into the dense operand buffer;
    padding slots hold ``sentinel`` = the buffer length, pointing at an
    appended pad row), ``vtabs[k]`` matches with 0-valued padding,
    ``etabs[k]`` holds each slot's global edge id (padding ``E_total`` —
    the reference's empty-slot sentinel, csrc/spmm.cpp:210-211), and
    ``invs`` has shape ``(G, Mb)`` mapping each local row to its slot in
    the concatenated per-group row stack (sentinel = stack length for
    rows with no edges).  Shapes are identical for every group, so the
    arrays can be sharded on the leading axis and consumed uniformly
    under shard_map.
    """
    from ..ops.kernels.ell import _choose_caps

    G = len(groups)
    degs = []
    for grp in groups:
        degs.append(np.bincount(grp[0], minlength=Mb))
    all_deg = np.concatenate([d[d > 0] for d in degs]) if G else np.zeros(0)
    caps = _choose_caps(all_deg, max_buckets=max_buckets)
    if not caps:
        caps = [1]

    # Common per-bucket row capacity = max over groups.
    R = [0] * len(caps)
    sel_rows = []  # per group, per bucket: row ids
    for g in range(G):
        d = degs[g]
        rows_by_deg = stable_argsort(d)
        per_bucket = []
        for bi, cap in enumerate(caps):
            lo = caps[bi - 1] if bi > 0 else 0
            sel = rows_by_deg[(d[rows_by_deg] > lo) & (d[rows_by_deg] <= cap)]
            per_bucket.append(sel)
            R[bi] = max(R[bi], sel.size)
        sel_rows.append(per_bucket)

    L = sum(R[k] for k in range(len(caps)))  # stacked rows per group
    itabs = [np.full((G, R[k], caps[k]), sentinel, np.int32)
             for k in range(len(caps))]
    vtabs = [np.zeros((G, R[k], caps[k]), np.float32)
             for k in range(len(caps))]
    etabs = [np.full((G, R[k], caps[k]), E_total, np.int32)
             for k in range(len(caps))]
    invs = np.full((G, Mb), L, np.int32)  # sentinel -> pad row

    for g, grp in enumerate(groups):
        r, c, v = grp[0], grp[1], grp[2]
        e = grp[3] if len(grp) > 3 else np.zeros(r.shape[0], np.int64)
        order = stable_argsort(r)
        r_s, c_s, v_s, e_s = r[order], c[order], v[order], e[order]
        starts = np.zeros(Mb + 1, np.int64)
        np.add.at(starts, r_s + 1, 1)
        starts = np.cumsum(starts)
        base = 0
        for k, cap in enumerate(caps):
            rows = sel_rows[g][k]
            if rows.size:
                st = starts[rows]
                ln = starts[rows + 1] - st
                rix = np.repeat(np.arange(rows.size), ln)
                off = np.arange(rix.shape[0]) - np.repeat(
                    np.cumsum(ln) - ln, ln
                )
                p = np.repeat(st, ln) + off
                itabs[k][g, rix, off] = c_s[p]
                vtabs[k][g, rix, off] = v_s[p]
                etabs[k][g, rix, off] = e_s[p]
                invs[g, rows] = base + np.arange(rows.size)
            base += R[k]
    return (
        [jnp.asarray(t) for t in itabs],
        [jnp.asarray(t) for t in vtabs],
        [jnp.asarray(t) for t in etabs],
        jnp.asarray(invs),
        caps,
    )


def _build_interior_blocks(int_groups, Mb: int, Nb: int, B: int):
    """Per-shard dense (B, B) blocks of the halo interior + remainder
    groups — the single-chip hybrid's MXU route (ops/kernels/hybrid.py)
    made SPMD-uniform: every shard's slot list pads to the max occupied
    block count with all-zero blocks (sentinel row ``Rb`` is dropped by
    the segment-sum, col 0 multiplies a zero block).

    Uses the same measured break-even and store-dtype rule as the
    single-chip router.  Returns ``None`` when the interior doesn't
    clear it (the ELL tables then carry the halo schedule alone);
    otherwise ``(blocks, srow, scol, rest_groups)`` with ``blocks``
    shaped ``(G, nbm + 1, B, B)`` (trailing all-zero chunk-pad block,
    `hybrid._block_pass` contract)."""
    from ..ops.kernels.hybrid import (
        block_break_even, get_store_budget, quantization_rel_err,
    )

    G = len(int_groups)
    tot = sum(g[0].size for g in int_groups)
    if tot == 0 or min(Mb, Nb) < 2 * B:
        return None
    vals = np.concatenate([g[2] for g in int_groups])
    store_bf16 = quantization_rel_err(vals) <= get_store_budget()
    be = block_break_even(B, elem=2 if store_bf16 else 4,
                          passes=1.0 if store_bf16 else 3.0)
    thresh = max(int(be * B * B), 1)
    Rb, Cb = _cdiv(Mb, B), _cdiv(Nb, B)
    per = []
    dense_tot = 0
    for (r, c, v, e) in int_groups:
        bkey = (r // B) * Cb + (c // B)
        if bkey.size:
            keys, inv_key, counts = np.unique(
                bkey, return_inverse=True, return_counts=True
            )
            is_dense = counts >= thresh
            dmask = is_dense[inv_key]
            keys = keys[is_dense]
            dense_tot += int(counts[is_dense].sum())
        else:
            keys = np.zeros(0, np.int64)
            dmask = np.zeros(0, bool)
        per.append((keys, dmask))
    nbm = max(int(k.size) for k, _ in per)
    if nbm == 0 or dense_tot / tot < 0.3:
        return None
    blocks = np.zeros((G, nbm + 1, B, B), np.float32)
    srow = np.full((G, nbm), Rb, np.int32)
    scol = np.zeros((G, nbm), np.int32)
    rest_groups = []
    for g, (r, c, v, e) in enumerate(int_groups):
        keys, dmask = per[g]
        nb = keys.size
        d = np.flatnonzero(dmask)
        if d.size:
            slot = np.searchsorted(keys, (r[d] // B) * Cb + (c[d] // B))
            np.add.at(
                blocks, (g, slot, r[d] % B, c[d] % B),
                v[d].astype(np.float32),
            )
        srow[g, :nb] = (keys // Cb).astype(np.int32)
        scol[g, :nb] = (keys % Cb).astype(np.int32)
        rest = np.flatnonzero(~dmask)
        rest_groups.append((r[rest], c[rest], v[rest], e[rest]))
    if store_bf16:
        import ml_dtypes

        blocks = blocks.astype(ml_dtypes.bfloat16)
    return (jnp.asarray(blocks), jnp.asarray(srow), jnp.asarray(scol),
            rest_groups)


# Per-shard frontier store cap: the measured XLA:TPU cliff is an
# operand slice REACHING 2^31 bytes (~90x, CLAUDE.md pathology #2), and
# the project's chunk rule is <= 1 GB per batched-dot operand — so the
# cap excludes the boundary (checked with >=, advisor r4).
_FR_DENSE_SHARD_CAP = 1 << 30   # bytes of frontier store per shard


def _build_frontier_dense(fr_groups, Mb: int, H: int, Pn: int,
                          mode: str = "auto"):
    """Dense store of the frontier bipartite matrix, or ``None``.

    After the interior moved onto the MXU (round 4), the frontier SpMM —
    group-ELL gathers over the received halo buffer — dominates the
    projected halo step (BASELINE.md dense_shard_scaling: 0.93 of
    1.16 ms).  The halo buffer is already COMPACT (only the distinct
    referenced remote rows), so the frontier is a (Mb, P*H) bipartite
    matrix whose density on community graphs sits well above the dense
    break-even: one read-bound MXU matmul per shard replaces the whole
    gather pass.  Values are baked (sum/mean only, like the interior
    blocks); the ELL frontier tables remain authoritative for min/max
    and value differentiation.

    The decision reuses the single-chip router's measured rates: dense
    cost = ``passes * Mb * P*H * elem / HBM_BW`` (read-bound; passes
    priced by the store dtype exactly as ``block_break_even``), ELL cost
    = the SLOWEST shard's frontier edges at the measured per-edge gather
    rate (the step time is a max over shards, and the store cost is
    shard-uniform).  ``mode``: "auto" (decide), "never", "always"
    (tests/benchmarks).  Store dtype follows the measured quantization
    rule (``quantization_rel_err`` vs ``set_store_budget``).

    ``mode="always"`` is best-effort, NOT unconditional: the build
    still returns ``None`` for an empty frontier or when the per-shard
    store would reach the 1 GiB operand cap (the measured batched-dot
    cliff), and the caller (``from_sparse_tensor``) only invokes it
    when the interior blocks cleared their own break-even — the dense
    frontier is profitable exactly when the interior is already off the
    gather path.  ``from_sparse_tensor`` warns when an explicit
    "always" request ends up unhonored.
    """
    from ..ops.kernels.hybrid import (
        _ELL_NS_PER_NNZ, _HBM_BW, get_store_budget, quantization_rel_err,
    )

    if mode == "never":
        return None
    G = len(fr_groups)
    PH = Pn * H
    counts = [g[0].size for g in fr_groups]
    worst = max(counts, default=0)
    if worst == 0 or Mb * PH == 0:
        return None
    vals = np.concatenate([g[2] for g in fr_groups])
    store_bf16 = quantization_rel_err(vals) <= get_store_budget()
    elem = 2 if store_bf16 else 4
    passes = 1.0 if store_bf16 else 3.0
    if Mb * PH * elem >= _FR_DENSE_SHARD_CAP:
        return None
    if mode != "always":
        t_dense = passes * Mb * PH * elem / _HBM_BW
        t_ell = worst * _ELL_NS_PER_NNZ * 1e-9
        if t_dense >= t_ell:
            return None
    # Stage ONE f32 (Mb, PH) slab at a time and stack in the store
    # dtype: a (G, Mb, PH) f32 staging array near the per-shard cap is
    # up to P x 2 GiB of transient host RAM (advisor r4) on a host
    # that cannot afford it.
    store_dt = np.float32
    if store_bf16:
        import ml_dtypes

        store_dt = ml_dtypes.bfloat16
    dense = np.zeros((G, Mb, PH), store_dt)
    slab = np.zeros((Mb, PH), np.float32)
    for g, (r, b, v, _e) in enumerate(fr_groups):
        if r.size:
            slab[...] = 0.0
            np.add.at(
                slab, (r.astype(np.int64), b.astype(np.int64)),
                v.astype(np.float32),
            )
            dense[g] = slab.astype(store_dt)
    return jnp.asarray(dense)


def _group_ell_apply(itabs, vtabs, inv, x):
    """out[r] = sum_j vtab[r, j] * x_ext[itab[r, j]] for one group.

    ``itabs[k]`` (R_k, cap), ``inv`` (Mb,).  Padding slots gather the
    appended zero row (index ``x.shape[0]``) with value 0.  (Mb, K).
    """
    K = x.shape[1]
    x_ext = jnp.concatenate([x, jnp.zeros((1, K), x.dtype)])
    parts = []
    for itab, vtab in zip(itabs, vtabs):
        if itab.shape[0] == 0:
            continue
        cap = itab.shape[1]
        acc = None
        from ..ops.kernels.ell import _chunk_cols
        step = _chunk_cols(itab.shape[0], cap, K)
        for s in range(0, cap, step):  # bound the (R, chunk, K) gather
            e = min(s + step, cap)
            h = jnp.take(x_ext, itab[:, s:e], axis=0)
            part = jnp.sum(
                h * vtab[:, s:e, None].astype(h.dtype), axis=1
            )
            acc = part if acc is None else acc + part
        parts.append(acc)
    if parts:
        stacked = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    else:
        stacked = jnp.zeros((0, K), x.dtype)
    stacked = jnp.concatenate([stacked, jnp.zeros((1, K), x.dtype)])
    return jnp.take(stacked, inv, axis=0)


def _group_ell_minmax(itabs, vtabs, etabs, inv, x, is_min: bool):
    """Masked extremum over one group's slots, with argout.

    Returns ``(ext, arg)``: ``ext`` (Mb, K) is the dtype extreme for rows with no
    valid slot (callers fix empty rows to 0 via the global rowcount),
    ``arg`` (Mb, K) the winning slot's global edge id (pad sentinel on
    empty).  The extremum is re-read through ``take_along_axis`` at the
    arg slot (not ``jnp.min``/``max``, whose AD splits tied cotangents),
    so JAX AD routes the FULL cotangent through the single winning slot —
    the reference's argout-backward contract (csrc/spmm.cpp:204-303) —
    including through the schedule collectives.  Within a group the
    winner on ties is the first slot, which is the first CSR-order edge.
    """
    K = x.shape[1]
    big = _extreme(x.dtype, is_min)
    x_ext = jnp.concatenate([x, jnp.zeros((1, K), x.dtype)])
    n_buf = x.shape[0]
    parts, aparts = [], []
    for itab, vtab, etab in zip(itabs, vtabs, etabs):
        if itab.shape[0] == 0:
            continue
        cap = itab.shape[1]
        best = best_slot = None
        from ..ops.kernels.ell import _chunk_cols
        step = _chunk_cols(itab.shape[0], cap, K)
        for s in range(0, cap, step):
            e = min(s + step, cap)
            h = jnp.take(x_ext, itab[:, s:e], axis=0)       # (R, c, K)
            cand = h * vtab[:, s:e, None].astype(h.dtype)
            valid = (itab[:, s:e] != n_buf)[..., None]
            cand = jnp.where(valid, cand, big)
            if is_min:
                sl = jnp.argmin(cand, axis=1).astype(jnp.int32)
            else:
                sl = jnp.argmax(cand, axis=1).astype(jnp.int32)
            # Re-read the extremum at the winning slot: AD then sends the
            # whole cotangent to that one slot instead of splitting ties.
            ext = jnp.take_along_axis(cand, sl[:, None, :], axis=1)[:, 0]
            slot = sl + s
            if best is None:
                best, best_slot = ext, slot
            else:
                better = (ext < best) if is_min else (ext > best)
                best = jnp.where(better, ext, best)
                best_slot = jnp.where(better, slot, best_slot)
        parts.append(best)
        aparts.append(
            jnp.take_along_axis(etab, best_slot.astype(jnp.int32), axis=1)
        )
    if parts:
        stacked = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        astacked = (
            aparts[0] if len(aparts) == 1 else jnp.concatenate(aparts)
        )
    else:
        stacked = jnp.zeros((0, K), x.dtype)
        astacked = jnp.zeros((0, K), jnp.int32)
    stacked = jnp.concatenate(
        [stacked, jnp.full((1, K), big, x.dtype)]
    )
    # pad rows: no edges in this group — arg sentinel is the etab pad
    # value, which callers pass as E_total; reuse the max int32 here and
    # let callers overwrite empty rows anyway.
    astacked = jnp.concatenate(
        [astacked, jnp.full((1, K), jnp.iinfo(jnp.int32).max, jnp.int32)]
    )
    return (
        jnp.take(stacked, inv, axis=0),
        jnp.take(astacked, inv, axis=0),
    )


class ShardedSparseMatrix:
    """A row-partitioned sparse matrix resident across a 1-D mesh.

    Edge data is stored as shared-shape ELLPACK tables (leading dim
    sharded over the mesh axis):

      ring tables  — one edge group per (shard p, column block q):
        ``ring_itabs[k]`` (P, P, R_k, cap_k) local col index into block q
        ``ring_vtabs[k]`` (P, P, R_k, cap_k) value (0 on padding)
        ``ring_inv``      (P, P, Mb)         local row -> stacked slot
      flat tables  — one group per shard, *global* columns, for the
        all-gather schedule: ``flat_itabs[k]`` (P, R_k, cap_k), etc.
    """

    def __init__(self, mesh: Mesh, M: int, N: int, Mb: int, Nb: int,
                 ring_itabs, ring_vtabs, ring_inv,
                 flat_itabs, flat_vtabs, flat_inv,
                 int_itabs=(), int_vtabs=(), int_inv=None,
                 fr_itabs=(), fr_vtabs=(), fr_inv=None,
                 serve_idx=None, halo_width: int = 0,
                 ring_etabs=(), flat_etabs=(), int_etabs=(), fr_etabs=(),
                 rowcount=None, nnz: int = 0,
                 int_blocks=None, int_srow=None, int_scol=None,
                 rest_itabs=(), rest_vtabs=(), rest_inv=None,
                 block_B: int = 512, fr_dense=None):
        self.mesh = mesh
        self.M, self.N = M, N
        self.Mb, self.Nb = Mb, Nb
        # Row-shard count = the data axis extent; a 2-D (data, feat) mesh
        # keeps the edge tables replicated across the feature axis.
        self.P = mesh.shape[data_axis]
        self.Pf = mesh.shape.get(feat_axis, 1)
        self.ring_itabs = tuple(ring_itabs)
        self.ring_vtabs = tuple(ring_vtabs)
        self.ring_inv = ring_inv
        self.flat_itabs = tuple(flat_itabs)
        self.flat_vtabs = tuple(flat_vtabs)
        self.flat_inv = flat_inv
        # halo schedule tables (may be empty on old pytrees)
        self.int_itabs = tuple(int_itabs)
        self.int_vtabs = tuple(int_vtabs)
        self.int_inv = int_inv
        self.fr_itabs = tuple(fr_itabs)
        self.fr_vtabs = tuple(fr_vtabs)
        self.fr_inv = fr_inv
        self.serve_idx = serve_idx
        self.halo_width = halo_width
        # Edge-id tables (argout for min/max + value-grad mapping back to
        # edge space) and the per-shard rowcount backing mean and the
        # min/max empty-row fixup (reference reducer.h:64-73).
        self.ring_etabs = tuple(ring_etabs)
        self.flat_etabs = tuple(flat_etabs)
        self.int_etabs = tuple(int_etabs)
        self.fr_etabs = tuple(fr_etabs)
        self.rowcount = rowcount
        self.nnz = nnz
        # Hybrid local format (halo interior on the MXU): per-shard
        # dense blocks + ELL remainder; None/() when not built.  Values
        # are BAKED into the blocks (single-chip hybrid contract) —
        # the ELL tables stay authoritative for value-differentiation
        # and min/max.
        self.int_blocks = int_blocks
        self.int_srow = int_srow
        self.int_scol = int_scol
        self.rest_itabs = tuple(rest_itabs)
        self.rest_vtabs = tuple(rest_vtabs)
        self.rest_inv = rest_inv
        self.block_B = block_B
        # Dense frontier store (G, Mb, P*H), values baked; None when the
        # frontier stays on the group-ELL tables.
        self.fr_dense = fr_dense

    def has_interior_blocks(self) -> bool:
        return self.int_blocks is not None

    def has_frontier_dense(self) -> bool:
        return self.fr_dense is not None

    @classmethod
    def from_sparse_tensor(
        cls, A: SparseTensor, mesh: Mesh,
        interior_blocks: str = "auto", block_B: int = 512,
        frontier_dense: str = "auto",
    ) -> "ShardedSparseMatrix":
        """Partition ``A``'s rows into contiguous blocks of ``ceil(M/P)``.

        For METIS-aware layouts, permute ``A`` first (``partition()``) so
        block boundaries match cluster boundaries and ring traffic is
        minimized.  On a 2-D ``(data, feat)`` mesh (``make_mesh2d``) the
        tables shard over the data axis and replicate over the feature
        axis; :meth:`shard_dense` then splits K across the feature axis.
        """
        Pn = mesh.shape[data_axis]
        M, N = A.sparse_sizes()
        Mb, Nb = _cdiv(M, Pn), _cdiv(N, Pn)

        row, col, value_np, eid, E = _extract_coo(A)
        owner = row // Mb
        block = col // Nb

        # --- flat per-shard groups (all-gather schedule; global cols)
        flat_groups = []
        for p in range(Pn):
            sel = owner == p
            flat_groups.append(
                (row[sel] - p * Mb, col[sel], value_np[sel], eid[sel])
            )
        flat_itabs, flat_vtabs, flat_etabs, flat_inv, _ = _build_group_ell(
            flat_groups, Mb, sentinel=Pn * Nb, E_total=E
        )

        # --- (shard, block) groups (ring schedule; block-local cols)
        ring_groups = []
        for p in range(Pn):
            selp = owner == p
            for q in range(Pn):
                sel = selp & (block == q)
                ring_groups.append(
                    (row[sel] - p * Mb, col[sel] - q * Nb, value_np[sel],
                     eid[sel])
                )
        ring_itabs, ring_vtabs, ring_etabs, ring_inv, _ = _build_group_ell(
            ring_groups, Mb, sentinel=Nb, E_total=E
        )
        # (G=P*P, ...) -> (P, P, ...), leading dim sharded.
        ring_itabs = [t.reshape(Pn, Pn, *t.shape[1:]) for t in ring_itabs]
        ring_vtabs = [t.reshape(Pn, Pn, *t.shape[1:]) for t in ring_vtabs]
        ring_etabs = [t.reshape(Pn, Pn, *t.shape[1:]) for t in ring_etabs]
        ring_inv = ring_inv.reshape(Pn, Pn, Mb)

        # per-shard global rowcount (mean scaling + empty-row fixup)
        rowcount = np.bincount(
            row, minlength=Pn * Mb
        ).reshape(Pn, Mb).astype(np.int32)

        # --- halo schedule: interior groups (own-block cols, local) +
        # frontier groups (gather into the received halo buffer) + the
        # per-(server, client) row lists each shard must serve.
        int_groups = []
        fr_groups = []
        halo_cols: List[List[np.ndarray]] = [
            [np.zeros(0, np.int64)] * Pn for _ in range(Pn)
        ]  # halo_cols[p][q] = distinct q-local cols client p needs
        fr_raw = []
        for p in range(Pn):
            selp = owner == p
            interior = selp & (block == p)
            int_groups.append((
                row[interior] - p * Mb, col[interior] - p * Nb,
                value_np[interior], eid[interior],
            ))
            fr = selp & (block != p)
            rf, cf, qf, vf = row[fr] - p * Mb, col[fr], block[fr], value_np[fr]
            ef = eid[fr]
            for q in range(Pn):
                sq = qf == q
                if q == p or not sq.any():
                    continue
                halo_cols[p][q] = np.unique(cf[sq] - q * Nb)
            fr_raw.append((rf, cf, qf, vf, ef))
        H = max(
            [1] + [u.size for per_p in halo_cols for u in per_p]
        )
        serve = np.zeros((Pn, Pn, H), np.int32)  # [server q, client p]
        for p in range(Pn):
            rf, cf, qf, vf, ef = fr_raw[p]
            buf_idx = np.zeros(rf.shape[0], np.int64)
            for q in range(Pn):
                sq = qf == q
                if q == p or not sq.any():
                    continue
                u = halo_cols[p][q]
                serve[q, p, : u.size] = u
                buf_idx[sq] = q * H + np.searchsorted(u, cf[sq] - q * Nb)
            fr_groups.append((rf, buf_idx, vf, ef))
        int_itabs, int_vtabs, int_etabs, int_inv, _ = _build_group_ell(
            int_groups, Mb, sentinel=Nb, E_total=E
        )
        fr_itabs, fr_vtabs, fr_etabs, fr_inv, _ = _build_group_ell(
            fr_groups, Mb, sentinel=Pn * H, E_total=E
        )

        # Optional hybrid local format: interior dense blocks + ELL
        # remainder (``local_format="hybrid"`` in dist_spmm_halo).
        int_blocks = int_srow = int_scol = rest_inv = None
        rest_itabs = rest_vtabs = ()
        fr_dense = None
        if interior_blocks != "never":
            hyb = _build_interior_blocks(int_groups, Mb, Nb, block_B)
            if hyb is not None:
                int_blocks, int_srow, int_scol, rest_groups = hyb
                rest_itabs, rest_vtabs, _unused, rest_inv, _ = (
                    _build_group_ell(rest_groups, Mb, sentinel=Nb,
                                     E_total=E)
                )
                # The dense frontier only pays once the interior is off
                # the gather path — build it alongside the blocks.
                fr_dense = _build_frontier_dense(
                    fr_groups, Mb, H, Pn, mode=frontier_dense
                )
        if frontier_dense == "always" and fr_dense is None:
            import warnings

            warnings.warn(
                "frontier_dense='always' not honored: the dense "
                "frontier is gated on the interior blocks clearing "
                "their break-even (interior_blocks != 'never' and the "
                "shards dense enough) and on the per-shard store "
                "staying under the 1 GiB operand cap; this matrix "
                "keeps the group-ELL frontier tables."
            )

        def put(x):
            ndim = x.ndim
            spec = P(data_axis, *([None] * (ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return cls(
            mesh, M, N, Mb, Nb,
            [put(t) for t in ring_itabs], [put(t) for t in ring_vtabs],
            put(ring_inv),
            [put(t) for t in flat_itabs], [put(t) for t in flat_vtabs],
            put(flat_inv),
            [put(t) for t in int_itabs], [put(t) for t in int_vtabs],
            put(int_inv),
            [put(t) for t in fr_itabs], [put(t) for t in fr_vtabs],
            put(fr_inv),
            put(jnp.asarray(serve)), H,
            ring_etabs=[put(t) for t in ring_etabs],
            flat_etabs=[put(t) for t in flat_etabs],
            int_etabs=[put(t) for t in int_etabs],
            fr_etabs=[put(t) for t in fr_etabs],
            rowcount=put(jnp.asarray(rowcount)), nnz=E,
            int_blocks=None if int_blocks is None else put(int_blocks),
            int_srow=None if int_srow is None else put(int_srow),
            int_scol=None if int_scol is None else put(int_scol),
            rest_itabs=[put(t) for t in rest_itabs],
            rest_vtabs=[put(t) for t in rest_vtabs],
            rest_inv=None if rest_inv is None else put(rest_inv),
            block_B=block_B,
            fr_dense=None if fr_dense is None else put(fr_dense),
        )

    # ------------------------------------------------------------------
    def shard_dense(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, K) dense operand -> (P, Nb, K) stacked row blocks, sharded.

        On a 2-D mesh K additionally shards over the feature axis (K must
        divide evenly — pad features host-side if needed).
        """
        K = x.shape[1]
        if K % self.Pf:
            raise ValueError(
                f"K={K} must be divisible by the feature-axis size "
                f"{self.Pf}; pad the feature dimension."
            )
        pad = self.P * self.Nb - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, K), x.dtype)])
        x = x.reshape(self.P, self.Nb, K)
        return jax.device_put(
            x, NamedSharding(self.mesh, self._xspec)
        )

    @property
    def _xspec(self):
        """PartitionSpec of the stacked dense operand/output blocks."""
        if self.Pf > 1:
            return P(data_axis, None, feat_axis)
        return P(data_axis, None, None)

    def unshard_dense(self, y: jnp.ndarray) -> jnp.ndarray:
        """(P, Mb, K) stacked output -> (M, K)."""
        return y.reshape(self.P * self.Mb, -1)[: self.M]


def _shmat_flatten(s: ShardedSparseMatrix):
    children = (
        s.ring_itabs, s.ring_vtabs, s.ring_inv,
        s.flat_itabs, s.flat_vtabs, s.flat_inv,
        s.int_itabs, s.int_vtabs, s.int_inv,
        s.fr_itabs, s.fr_vtabs, s.fr_inv,
        s.serve_idx,
        s.ring_etabs, s.flat_etabs, s.int_etabs, s.fr_etabs, s.rowcount,
        s.int_blocks, s.int_srow, s.int_scol,
        s.rest_itabs, s.rest_vtabs, s.rest_inv, s.fr_dense,
    )
    return children, (s.mesh, s.M, s.N, s.Mb, s.Nb, s.halo_width, s.nnz,
                      s.block_B)


def _shmat_unflatten(aux, children) -> ShardedSparseMatrix:
    mesh, M, N, Mb, Nb, halo_width, nnz, block_B = aux
    (ring_itabs, ring_vtabs, ring_inv, flat_itabs, flat_vtabs, flat_inv,
     int_itabs, int_vtabs, int_inv, fr_itabs, fr_vtabs, fr_inv,
     serve_idx, ring_etabs, flat_etabs, int_etabs, fr_etabs,
     rowcount, int_blocks, int_srow, int_scol, rest_itabs, rest_vtabs,
     rest_inv, fr_dense) = children
    return ShardedSparseMatrix(
        mesh, M, N, Mb, Nb, ring_itabs, ring_vtabs, ring_inv,
        flat_itabs, flat_vtabs, flat_inv, int_itabs, int_vtabs, int_inv,
        fr_itabs, fr_vtabs, fr_inv, serve_idx, halo_width=halo_width,
        ring_etabs=ring_etabs, flat_etabs=flat_etabs, int_etabs=int_etabs,
        fr_etabs=fr_etabs, rowcount=rowcount, nnz=nnz,
        int_blocks=int_blocks, int_srow=int_srow, int_scol=int_scol,
        rest_itabs=rest_itabs, rest_vtabs=rest_vtabs, rest_inv=rest_inv,
        block_B=block_B, fr_dense=fr_dense,
    )


jax.tree_util.register_pytree_node(
    ShardedSparseMatrix, _shmat_flatten, _shmat_unflatten
)


def _combine_minmax(a, b, is_min):
    """(ext, arg) running combine.  Value ties break to the LOWER edge id,
    which is the first CSR-order edge — the reference's tie rule
    (reducer.h:52-62 keeps the first row-scan hit) — so the argout is
    identical across schedules (ring starts at the own block, halo
    combines interior before frontier; processing order must not leak
    into the result)."""
    ea, aa = a
    eb, ab = b
    better = (eb < ea) if is_min else (eb > ea)
    better = better | ((eb == ea) & (ab < aa))
    return jnp.where(better, eb, ea), jnp.where(better, ab, aa)


def _pv(t, vary):
    """Promote a feat-replicated table block to vary over ``vary`` so it
    can combine with the feature-sharded operand under check_vma."""
    return lax.pcast(t, vary, to="varying") if vary else t


def _allgather_local(is_min, vary, itabs, vtabs, etabs, inv, x_local):
    x_full = lax.all_gather(x_local[0], data_axis, tiled=True)  # (N_pad, K)
    one = lambda ts: [_pv(t[0], vary) for t in ts]  # noqa: E731
    if is_min is None:
        out = _group_ell_apply(one(itabs), one(vtabs), _pv(inv[0], vary),
                               x_full)
        return out[None]
    out, arg = _group_ell_minmax(
        one(itabs), one(vtabs), one(etabs), _pv(inv[0], vary), x_full,
        is_min,
    )
    return out[None], arg[None]


def _ring_local(Mb, Pn, is_min, vary, itabs, vtabs, etabs, inv, x_local):
    me = lax.axis_index(data_axis)
    xblk = x_local[0]  # (Nb, K)
    K = xblk.shape[1]
    axes = (data_axis,) + tuple(vary)
    # Mark the zero accumulator as device-varying over the mesh axes up
    # front: ppermute produces varying values, and lax.fori_loop requires
    # the carry type to be loop-invariant.
    if is_min is None:
        out0 = lax.pcast(jnp.zeros((Mb, K), xblk.dtype), axes,
                         to="varying")
    else:
        big = _extreme(xblk.dtype, is_min)
        out0 = lax.pcast(jnp.full((Mb, K), big, xblk.dtype), axes,
                         to="varying")
        arg0 = lax.pcast(
            jnp.full((Mb, K), jnp.iinfo(jnp.int32).max, jnp.int32),
            axes, to="varying",
        )

    # Rolled ring body (VERDICT r4 item 2): a lax.scan over the P steps
    # keeps the compiled program O(1) in P — the unrolled form inlined
    # P copies of the gather+reduce body, which at papers100M's P=64 is
    # 64 inlined ring steps and a program that grows with the pod.  The
    # per-step tables are index-gathered from the resident (P, ...)
    # stacks, so the body is step-invariant; scan also gives the
    # reverse-mode ring (ppermute transposes to the reverse rotation)
    # a rolled backward program.
    def step(carry, s):
        if is_min is None:
            out, xblk = carry
        else:
            (out, arg), xblk = carry
        owner = _pv((me + s) % Pn, vary)
        g_itabs = [jnp.take(_pv(t[0], vary), owner, axis=0) for t in itabs]
        g_vtabs = [jnp.take(_pv(t[0], vary), owner, axis=0) for t in vtabs]
        g_inv = jnp.take(_pv(inv[0], vary), owner, axis=0)
        if is_min is None:
            out = out + _group_ell_apply(g_itabs, g_vtabs, g_inv, xblk)
        else:
            g_etabs = [
                jnp.take(_pv(t[0], vary), owner, axis=0) for t in etabs
            ]
            step_oa = _group_ell_minmax(
                g_itabs, g_vtabs, g_etabs, g_inv, xblk, is_min
            )
            out, arg = _combine_minmax((out, arg), step_oa, is_min)
        # Rotate: i receives from (i+1), so after s steps we hold block
        # (me + s) % P -- the transfer for step s+1 overlaps this compute.
        xblk = lax.ppermute(
            xblk, data_axis,
            perm=[(i, (i - 1) % Pn) for i in range(Pn)],
        )
        if is_min is None:
            return (out, xblk), None
        return ((out, arg), xblk), None

    steps = jnp.arange(Pn)
    if is_min is None:
        (out, _), _ = lax.scan(step, (out0, xblk), steps)
        return out[None]
    (((out, arg)), _), _ = lax.scan(step, ((out0, arg0), xblk), steps)
    return out[None], arg[None]


def _halo_local(is_min, vary, int_itabs, int_vtabs, int_etabs, int_inv,
                fr_itabs, fr_vtabs, fr_etabs, fr_inv, serve_idx, x_local):
    x = x_local[0]                                  # (Nb, K)
    K = x.shape[1]
    # Serve: the rows each client needs from this shard, gathered locally
    # then exchanged in one all_to_all.  The interior SpMM has no data
    # dependence on the exchange, so XLA's latency-hiding scheduler can
    # run the collective concurrently with it (true async on TPU).
    served = jnp.take(x, _pv(serve_idx[0], vary), axis=0)  # (P, H, K)
    halo = lax.all_to_all(
        served, data_axis, split_axis=0, concat_axis=0, tiled=True
    )                                               # (P, H, K): [q] from q
    one = lambda ts: [_pv(t[0], vary) for t in ts]  # noqa: E731
    if is_min is None:
        out = _group_ell_apply(
            one(int_itabs), one(int_vtabs), _pv(int_inv[0], vary), x
        )
        out = out + _group_ell_apply(
            one(fr_itabs), one(fr_vtabs), _pv(fr_inv[0], vary),
            halo.reshape(-1, K),
        )
        return out[None]
    oa_int = _group_ell_minmax(
        one(int_itabs), one(int_vtabs), one(int_etabs),
        _pv(int_inv[0], vary), x, is_min,
    )
    oa_fr = _group_ell_minmax(
        one(fr_itabs), one(fr_vtabs), one(fr_etabs), _pv(fr_inv[0], vary),
        halo.reshape(-1, K), is_min,
    )
    out, arg = _combine_minmax(oa_int, oa_fr, is_min)
    return out[None], arg[None]


def _halo_local_hyb(vary, Mb, B, use_frd, blocks, srow, scol,
                    rest_itabs, rest_vtabs, rest_inv,
                    fr_itabs, fr_vtabs, fr_inv, fr_dense,
                    serve_idx, x_local):
    """Halo schedule with the hybrid local format: the interior's dense
    blocks run as one batched MXU pass (hybrid._block_pass — k-concat
    for bf16 stores, manual bf16-split for f32 at HIGH), the sparse
    remainder stays on the group-ELL tables, and the frontier runs
    either as group-ELL gathers over the halo buffer or (``use_frd``)
    as one read-bound MXU matmul of the dense frontier store against
    the whole received buffer.  Values are baked in both dense stores;
    gradients flow to x (through the _mxu_einsum custom VJP), not to
    the interior/frontier value tables."""
    from ..ops.kernels.hybrid import _block_pass, _mxu_einsum, _prec

    x = x_local[0]                                  # (Nb, K)
    K = x.shape[1]
    served = jnp.take(x, _pv(serve_idx[0], vary), axis=0)
    halo = lax.all_to_all(
        served, data_axis, split_axis=0, concat_axis=0, tiled=True
    )
    one = lambda ts: [_pv(t[0], vary) for t in ts]  # noqa: E731
    Nb = x.shape[0]
    Rb, Cb = _cdiv(Mb, B), _cdiv(Nb, B)
    pad = Cb * B - Nb
    xb = jnp.concatenate([x, jnp.zeros((pad, K), x.dtype)]) if pad else x
    acc = jnp.promote_types(x.dtype, jnp.float32)
    outb = _block_pass(
        _pv(blocks[0], vary), _pv(srow[0], vary), _pv(scol[0], vary),
        xb.reshape(Cb, B, K), Rb, B, K, acc, _prec(None),
    )
    out = outb.reshape(Rb * B, K)[:Mb].astype(x.dtype)
    if rest_itabs:
        out = out + _group_ell_apply(
            one(rest_itabs), one(rest_vtabs), _pv(rest_inv[0], vary), x
        )
    if use_frd:
        frd = _pv(fr_dense, vary)                   # (1, Mb, P*H)
        hb = halo.reshape(1, -1, K)
        fr_out = _mxu_einsum("sbc,sck->sbk", acc, _prec(None), frd, hb)
        out = out + fr_out[0].astype(x.dtype)
    else:
        out = out + _group_ell_apply(
            one(fr_itabs), one(fr_vtabs), _pv(fr_inv[0], vary),
            halo.reshape(-1, K),
        )
    return out[None]


def _is_min_of(reduce: str):
    if reduce in ("sum", "add", "mean"):
        return None
    if reduce == "min":
        return True
    if reduce == "max":
        return False
    raise ValueError(f"Unknown reduce mode: {reduce!r}")


def _postprocess(A, out, arg, reduce, dtype):
    """Empty-row + mean fixup from the per-shard rowcount: mean divides
    by max(count, 1) (reference reducer.h:64-66), min/max write 0 and
    the out-of-range sentinel arg == nnz on empty rows (reducer.h:70-73,
    csrc/spmm.cpp:210-211)."""
    rc = A.rowcount  # (P, Mb)
    if reduce == "mean":
        deg = jnp.maximum(rc, 1).astype(dtype)
        return out / deg[:, :, None]
    if reduce in ("min", "max"):
        empty = (rc == 0)[:, :, None]
        out = jnp.where(empty, jnp.zeros((), dtype), out)
        arg = jnp.where(empty, A.nnz, arg)
        return out, arg.astype(jnp.int32)
    return out


def _vtabs_from_value(value: jnp.ndarray, etabs) -> tuple:
    """Rebuild slot-value tables from an EDGE-SPACE value vector.

    ``etabs`` carry the global edge id of every slot, with the sentinel
    ``E`` on padding slots — so gathering from ``concat([value, 0])``
    reproduces exactly the tables ``_build_group_ell`` bakes, but as a
    differentiable function of ``value``: the gather's VJP is the
    scatter-add back to edge space, which makes
    ``jax.grad(..., wrt=value)`` return gradients in ORIGINAL edge ids —
    the same contract as single-chip ``matmul`` (VERDICT r4 item 5;
    reference ``csrc/spmm.cpp:96-98`` grad_value).
    """
    if value.ndim != 1:
        raise ValueError("edge-space value override must be 1-D (nnz,)")
    ext = jnp.concatenate([value, jnp.zeros((1,), value.dtype)])
    return tuple(ext[e] for e in etabs)


def dist_spmm_halo(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray, reduce: str = "sum",
    local_format: str = "ell", value: Optional[jnp.ndarray] = None,
):
    """Halo-exchange SpMM: interior compute overlaps one all_to_all of
    only the referenced remote rows.  Returns (P, Mb, K); min/max also
    return the argout (winning global edge id, sentinel nnz).

    ``local_format``: ``"ell"`` (default — the group-ELL tables, full
    value differentiation), ``"hybrid"`` (interior dense blocks on the
    MXU; sum/mean only, values baked so interior value tables get no
    gradient), or ``"auto"`` (hybrid when built and applicable).  When
    the matrix carries a dense frontier store
    (``from_sparse_tensor(frontier_dense=...)``), the hybrid path also
    runs the frontier as one MXU matmul over the received halo buffer
    instead of group-ELL gathers.

    ``value``: optional EDGE-SPACE value override (nnz,) in original
    edge ids.  The slot tables are rebuilt from it differentiably, so
    ``jax.grad`` w.r.t. ``value`` works exactly like the single-chip
    ``matmul`` value gradient.  Forces the ELL local format (blocks
    and the dense frontier bake values)."""
    is_min = _is_min_of(reduce)
    spec3 = P(data_axis, None, None)
    xspec = A._xspec
    vary = (feat_axis,) if A.Pf > 1 else ()
    use_hyb = (
        local_format in ("hybrid", "auto")
        and A.has_interior_blocks() and is_min is None
        and value is None
    )
    if local_format == "hybrid" and not use_hyb:
        raise ValueError(
            "local_format='hybrid' needs interior blocks (built by "
            "from_sparse_tensor(interior_blocks='auto') when the "
            "density stats clear the break-even), reduce in sum/mean, "
            "and no edge-space value override (blocks bake values); "
            "use 'auto' to fall back silently"
        )
    if use_hyb:
        spec2 = P(data_axis, None)
        use_frd = A.has_frontier_dense()
        fn = jax.shard_map(
            partial(_halo_local_hyb, vary, A.Mb, A.block_B, use_frd),
            mesh=A.mesh,
            in_specs=(
                P(data_axis, None, None, None),
                spec2, spec2,
                tuple(spec3 for _ in A.rest_itabs),
                tuple(spec3 for _ in A.rest_vtabs),
                P(data_axis, None),
                tuple(spec3 for _ in A.fr_itabs),
                tuple(spec3 for _ in A.fr_vtabs),
                P(data_axis, None),
                spec3,
                spec3,
                xspec,
            ),
            out_specs=xspec,
        )
        res = fn(A.int_blocks, A.int_srow, A.int_scol,
                 A.rest_itabs, A.rest_vtabs, A.rest_inv,
                 A.fr_itabs, A.fr_vtabs, A.fr_inv, A.fr_dense,
                 A.serve_idx, x_sharded)
        return _postprocess(A, res, None, reduce, x_sharded.dtype)
    fn = jax.shard_map(
        partial(_halo_local, is_min, vary),
        mesh=A.mesh,
        in_specs=(
            tuple(spec3 for _ in A.int_itabs),
            tuple(spec3 for _ in A.int_vtabs),
            tuple(spec3 for _ in A.int_etabs),
            P(data_axis, None),
            tuple(spec3 for _ in A.fr_itabs),
            tuple(spec3 for _ in A.fr_vtabs),
            tuple(spec3 for _ in A.fr_etabs),
            P(data_axis, None),
            spec3,
            xspec,
        ),
        out_specs=xspec if is_min is None else (xspec, xspec),
    )
    int_vtabs, fr_vtabs = A.int_vtabs, A.fr_vtabs
    if value is not None:
        int_vtabs = _vtabs_from_value(value, A.int_etabs)
        fr_vtabs = _vtabs_from_value(value, A.fr_etabs)
    res = fn(A.int_itabs, int_vtabs, A.int_etabs, A.int_inv,
             A.fr_itabs, fr_vtabs, A.fr_etabs, A.fr_inv,
             A.serve_idx, x_sharded)
    if is_min is None:
        return _postprocess(A, res, None, reduce, x_sharded.dtype)
    return _postprocess(A, res[0], res[1], reduce, x_sharded.dtype)


def dist_spmm_allgather(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray, reduce: str = "sum",
    value: Optional[jnp.ndarray] = None,
):
    """x_sharded: (P, Nb, K) from :meth:`shard_dense`. Returns (P, Mb, K).
    ``value``: optional edge-space value override (see
    :func:`dist_spmm_halo`)."""
    is_min = _is_min_of(reduce)
    spec3 = P(data_axis, None, None)
    xspec = A._xspec
    vary = (feat_axis,) if A.Pf > 1 else ()
    fn = jax.shard_map(
        partial(_allgather_local, is_min, vary),
        mesh=A.mesh,
        in_specs=(
            tuple(spec3 for _ in A.flat_itabs),
            tuple(spec3 for _ in A.flat_vtabs),
            tuple(spec3 for _ in A.flat_etabs),
            P(data_axis, None),
            xspec,
        ),
        out_specs=xspec if is_min is None else (xspec, xspec),
    )
    flat_vtabs = (A.flat_vtabs if value is None
                  else _vtabs_from_value(value, A.flat_etabs))
    res = fn(A.flat_itabs, flat_vtabs, A.flat_etabs, A.flat_inv,
             x_sharded)
    if is_min is None:
        return _postprocess(A, res, None, reduce, x_sharded.dtype)
    return _postprocess(A, res[0], res[1], reduce, x_sharded.dtype)


def dist_spmm_ring(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray, reduce: str = "sum",
    value: Optional[jnp.ndarray] = None,
):
    """Ring-rotated SpMM with overlapped block rotation. Returns (P, Mb, K).
    ``value``: optional edge-space value override (see
    :func:`dist_spmm_halo`)."""
    is_min = _is_min_of(reduce)
    spec3 = P(data_axis, None, None)
    spec4 = P(data_axis, None, None, None)
    xspec = A._xspec
    vary = (feat_axis,) if A.Pf > 1 else ()
    fn = jax.shard_map(
        partial(_ring_local, A.Mb, A.P, is_min, vary),
        mesh=A.mesh,
        in_specs=(
            tuple(spec4 for _ in A.ring_itabs),
            tuple(spec4 for _ in A.ring_vtabs),
            tuple(spec4 for _ in A.ring_etabs),
            spec3,
            xspec,
        ),
        out_specs=xspec if is_min is None else (xspec, xspec),
    )
    ring_vtabs = (A.ring_vtabs if value is None
                  else _vtabs_from_value(value, A.ring_etabs))
    res = fn(A.ring_itabs, ring_vtabs, A.ring_etabs, A.ring_inv,
             x_sharded)
    if is_min is None:
        return _postprocess(A, res, None, reduce, x_sharded.dtype)
    return _postprocess(A, res[0], res[1], reduce, x_sharded.dtype)


def dist_spmm(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray,
    schedule: str = "ring", reduce: str = "sum",
    local_format: str = "ell", value: Optional[jnp.ndarray] = None,
):
    """Reduce-aware distributed SpMM (the 4-mode contract of reference
    ``torch_sparse/matmul.py:79-91``, here across a device mesh).
    ``sum``/``mean`` return (P, Mb, K); ``min``/``max`` return
    ``(out, arg)`` with the reference argout semantics.
    ``local_format`` selects the halo schedule's local compute
    (``"ell"``/``"hybrid"``/``"auto"`` — see :func:`dist_spmm_halo`).

    ``value``: optional edge-space value vector (nnz,) in ORIGINAL edge
    ids; the schedules rebuild their slot tables from it
    differentiably, so ``jax.grad`` w.r.t. ``value`` matches the
    single-chip ``matmul`` value gradient bit-for-contract — the public
    edge-weight-training path on the mesh (VERDICT r4 item 5).  Forces
    the ELL local format under the halo schedule."""
    if schedule == "ring":
        return dist_spmm_ring(A, x_sharded, reduce, value)
    elif schedule == "allgather":
        return dist_spmm_allgather(A, x_sharded, reduce, value)
    elif schedule == "halo":
        return dist_spmm_halo(A, x_sharded, reduce, local_format, value)
    raise ValueError(f"Unknown schedule: {schedule!r}")
