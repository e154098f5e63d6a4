"""Degree-bucketed ELLPACK SpMM — the TPU fast path.

Why.  On TPU the scatter behind ``segment_sum`` dominates SpMM: measured
on a v5e at ogbn-arxiv scale (E=1.17M, K=128, fp32), gather costs ~2.3 ms
while the XLA segment-sum costs ~9.7 ms of a 12 ms SpMM.  The TPU has no
fast scatter, so the reduction must be scatter-free.  Rows are grouped by
degree into buckets, each bucket padded to a fixed width (ELLPACK), and
the per-row reduction becomes ``take -> multiply -> add`` chains that XLA
fuses into gather-bound loops — no scatter anywhere.  Measured: 3.96 ms
(295 Mnnz/s) vs 12 ms for the segment-sum formulation, bit-exact against
a sequential per-row sum (additions run in CSR edge order, the same
order as the reference's row-scan kernels, ``cpu/spmm_cpu.cpp:60-95``).

The format stores *edge ids* rather than baked values, so a single
structure serves any value vector (autograd included) and its transpose
(built from the csr2csc permutation) serves the backward
``grad_mat = A^T @ grad`` without ever scattering.

This is host-side per-graph preprocessing, cached on ``SparseStorage``
like every other format cache (SURVEY.md §7.1); under ``jit`` the arrays
ride the pytree with static shapes.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from ...utils.host_sort import stable_argsort

# Per-edge unrolled gather-add chains fuse well up to this bucket width;
# wider buckets use the row-chunked 2-D-index gather + sum formulation.
UNROLL_MAX = 64

# Maximum number of degree buckets (bounds compiled-program size).
_MAX_BUCKETS = 14

# Auxiliary passes (edge dot, minmax, softmax) sum wide buckets in
# column chunks sized so the (R, chunk, K) gather intermediate stays
# near this element budget (power-law max degrees reach the millions).
_CHUNK_ELEMS = 16_000_000

# The forward SpMM sums wide buckets in ROW chunks (whole cap at once,
# rows split to this element budget): measured on v5e at the
# full-Reddit remainder (15.6M edges, 233K-row table), the achieved
# gather bandwidth depends non-monotonically on the issuing shape —
# 2M-elem (8 MB) row chunks are the best measured point (73.9 ms =
# 4.73 ns/e vs 117.1 ms for the old 64 MB column chunks), with 3M/6M/8M
# budgets measured BAD points (99-122 ms) — the terrain is spiky, so
# re-measure before touching this (probe_remainder_sweep{,2,3}.py
# tables in BASELINE.md).  Small caps (<= UNROLL_MAX) keep the unrolled
# per-slot chain: row-chunking them measured SLOWER at arxiv scale
# (4.9 vs 4.35 ms).
_ROW_CHUNK_ELEMS = 2_000_000


def _chunk_cols(R: int, cap: int, K: int) -> int:
    return max(1, min(cap, _CHUNK_ELEMS // max(R * K, 1)))


def _choose_caps(deg: np.ndarray, max_buckets: int = None):
    """Bucket widths minimizing total padded slots.

    Buckets are contiguous ranges of the sorted nonzero degrees; a range
    ending at unique degree ``u_j`` costs ``u_j * (#rows in range)``.
    Exact DP over unique degrees (O(U^2 B), U is small for real graphs).
    """
    if max_buckets is None:
        max_buckets = _MAX_BUCKETS
    deg = deg[deg > 0]
    if deg.size == 0:
        return []
    uniq, counts = np.unique(deg, return_counts=True)
    # The DP is O(U^2 B); above ~2k unique degrees (huge power-law
    # graphs), quantize candidate boundaries to degree quantiles first.
    # Bucket caps must still COVER their rows, so each quantized group
    # keeps its maximum degree as the candidate cap.
    MAX_U = 2048
    if uniq.size > MAX_U:
        edges_idx = np.linspace(0, uniq.size, MAX_U + 1).astype(np.int64)
        q_uniq = []
        q_counts = []
        for a, b in zip(edges_idx[:-1], edges_idx[1:]):
            b = max(b, a + 1)
            q_uniq.append(uniq[b - 1])
            q_counts.append(counts[a:b].sum())
        uniq = np.asarray(q_uniq)
        counts = np.asarray(q_counts)
        keep = np.concatenate([uniq[:-1] != uniq[1:], [True]])
        # merge duplicated caps produced by the linspace; group id of
        # element i = number of kept (run-ending) elements before i
        agg = np.zeros(keep.sum(), dtype=np.int64)
        np.add.at(agg, np.cumsum(keep) - keep, counts)
        uniq, counts = uniq[keep], agg
    U = uniq.size
    B = min(max_buckets, U)
    csum = np.concatenate([[0], np.cumsum(counts)])  # rows up to group i
    INF = float("inf")
    # dp[b][j] = min padded slots covering groups [0, j) with b buckets.
    dp = np.full((B + 1, U + 1), INF)
    dp[0][0] = 0.0
    choice = np.zeros((B + 1, U + 1), dtype=np.int64)
    for b in range(1, B + 1):
        for j in range(1, U + 1):
            # last bucket covers groups [i, j), cap = uniq[j-1]
            costs = dp[b - 1][:j] + uniq[j - 1] * (csum[j] - csum[:j])
            i = int(np.argmin(costs))
            dp[b][j] = costs[i]
            choice[b][j] = i
    b = int(np.argmin(dp[:, U]))
    caps = []
    j = U
    while j > 0:
        i = choice[b][j]
        caps.append(int(uniq[j - 1]))
        j, b = i, b - 1
    return caps[::-1]


class EllFormat:
    """Degree-bucketed ELLPACK view of a sparse matrix.

    Per bucket ``b`` (static width ``caps[b]``):
      ``eids[b]``  (R_b, cap) int32 — edge id of each slot, ``E`` = padding
      ``idxs[b]``  (R_b, cap) int32 — gather index into the dense operand
                   (col for A, row for A^T), 0 on padding
      ``rows[b]``  (R_b,) int32 — original row id of each bucket row
    ``inv_perm`` (M,) int32 maps original row id -> position in the
    bucket-concatenated output (zero-degree rows map to a trailing zero
    block).  ``edge_slot`` (E,) int32 maps edge id -> its slot in the
    flattened concatenation of all buckets (for per-edge outputs computed
    in ELL layout, e.g. grad_value).
    """

    def __init__(self, eids, idxs, rows, inv_perm, edge_slot,
                 caps: Tuple[int, ...], E: int, M: int, n_zero: int):
        self.eids = tuple(eids)
        self.idxs = tuple(idxs)
        self.rows = tuple(rows)
        self.inv_perm = inv_perm
        self.edge_slot = edge_slot
        self.caps = tuple(caps)
        self.E = E
        self.M = M
        self.n_zero = n_zero

    def __repr__(self) -> str:
        rows = [int(e.shape[0]) for e in self.eids]
        return (
            f"EllFormat(M={self.M}, E={self.E}, caps={self.caps}, "
            f"rows={rows}, n_zero={self.n_zero})"
        )


def _ell_flatten(f: EllFormat):
    return (
        (f.eids, f.idxs, f.rows, f.inv_perm, f.edge_slot),
        (f.caps, f.E, f.M, f.n_zero),
    )


def _ell_unflatten(aux, children):
    eids, idxs, rows, inv_perm, edge_slot = children
    caps, E, M, n_zero = aux
    return EllFormat(eids, idxs, rows, inv_perm, edge_slot, caps, E, M,
                     n_zero)


jax.tree_util.register_pytree_node(EllFormat, _ell_flatten, _ell_unflatten)


def build_ell(
    ptr: np.ndarray, idx: np.ndarray, eid: Optional[np.ndarray], M: int
) -> EllFormat:
    """Build an :class:`EllFormat` from a CSR-like view.

    ``ptr`` (M+1,) segments ``idx`` (E,) — the gather indices — and
    ``eid`` (E,) gives each slot's edge id (``None`` = identity, i.e. the
    view is in original edge order).  Host-side, eager-only.
    """
    ptr = np.asarray(ptr, dtype=np.int64)
    idx = np.asarray(idx, dtype=np.int64)
    E = idx.shape[0]
    eid = np.arange(E, dtype=np.int64) if eid is None else np.asarray(eid)
    deg = ptr[1:] - ptr[:-1]
    caps = _choose_caps(deg) if M > 0 else []

    order = stable_argsort(deg)
    # Drop zero-degree rows from buckets; they become the zero block.
    nz_order = order[deg[order] > 0]
    n_zero = M - nz_order.shape[0]

    # Assign each row to its DP-chosen bucket (the DP objective already
    # minimizes padded slots; never merge upward — on power-law degree
    # distributions that multiplies small row counts into huge caps).
    eids_list: List[np.ndarray] = []
    idxs_list: List[np.ndarray] = []
    rows_list: List[np.ndarray] = []
    used_caps: List[int] = []
    perm_parts: List[np.ndarray] = []
    edge_slot = np.zeros(E, dtype=np.int64)
    slot_base = 0
    for bi, cap in enumerate(caps):
        lo = caps[bi - 1] if bi > 0 else 0
        rows = nz_order[(deg[nz_order] > lo) & (deg[nz_order] <= cap)]
        if rows.shape[0] == 0:
            continue
        R = rows.shape[0]
        e_tab = np.full((R, cap), E, dtype=np.int64)
        i_tab = np.zeros((R, cap), dtype=np.int64)
        starts = ptr[rows]
        lens = deg[rows]
        # O(edges) fill: flat (bucket-row, slot) coordinates per edge.
        rix = np.repeat(np.arange(R), lens)
        off = np.arange(rix.shape[0]) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        p = np.repeat(starts, lens) + off
        e_tab[rix, off] = eid[p]
        i_tab[rix, off] = idx[p]
        edge_slot[eid[p]] = slot_base + rix * cap + off
        eids_list.append(e_tab.astype(np.int32))
        idxs_list.append(i_tab.astype(np.int32))
        rows_list.append(rows.astype(np.int32))
        used_caps.append(cap)
        perm_parts.append(rows)
        slot_base += R * cap
    assert slot_base < 2**31, (
        "ELL slot space exceeds int32; shard the matrix first "
        "(parallel.ShardedSparseMatrix)"
    )

    perm = np.concatenate(
        perm_parts + [order[deg[order] == 0]]
    ) if M > 0 else np.zeros((0,), np.int64)
    inv = np.empty(M, np.int64)
    inv[perm] = np.arange(M)

    out = EllFormat(
        [jnp.asarray(e) for e in eids_list],
        [jnp.asarray(i) for i in idxs_list],
        [jnp.asarray(r) for r in rows_list],
        jnp.asarray(inv.astype(np.int32)),
        jnp.asarray(edge_slot.astype(np.int32)),
        tuple(used_caps), E, M, n_zero,
    )
    # Host copies of the slot tables for bake_values (a device->host
    # pull through the remote tunnel is ~30x slower than this keeps).
    # Plain attribute, NOT a pytree child — jit round-trips drop it,
    # which is fine: baking is an eager, build-time operation.
    out._host_eids = eids_list
    return out


def bake_values(ell: EllFormat, value) -> Tuple[jnp.ndarray, ...]:
    """Slot-layout (R, cap) value tables (padding slots = 0): the
    forward then reads values contiguously instead of gathering
    ``value_pad[eids]`` at 4 B granule.  Host-side, eager-only; cached
    by the storage layer, which drops it on ``set_value``."""
    v = np.asarray(value)
    vp = np.concatenate([v, np.zeros(1, v.dtype)])
    eids = getattr(ell, "_host_eids", None) or ell.eids
    return tuple(jnp.asarray(vp[np.asarray(e)]) for e in eids)


def _bucket_sum(mat, idx, vals):
    """Per-bucket row sums: sum_j vals[:, j] * mat[idx[:, j]].

    Additions run left-to-right in slot order (CSR edge order), matching
    the reference kernels' sequential row scan.  Wide buckets gather
    whole slot-table rows at once, chunked along the ROW dimension —
    the best measured issuing shape for XLA:TPU's gather at large
    tables (see ``_ROW_CHUNK_ELEMS``).  The per-row ``jnp.sum`` keeps
    a fixed left-to-right addition order, so results remain bit-exact
    vs the reference row scan.
    """
    cap = idx.shape[1]
    if cap <= UNROLL_MAX:
        acc = jnp.take(mat, idx[:, 0], axis=0) * vals[:, 0, None]
        for j in range(1, cap):
            acc = acc + jnp.take(mat, idx[:, j], axis=0) * vals[:, j, None]
        return acc
    R, K = idx.shape[0], mat.shape[1]
    if cap * K > _ROW_CHUNK_ELEMS:
        # Hub buckets (power-law caps into the millions): one full row
        # exceeds the chunk budget, so chunk along the cap instead.
        acc = None
        step = _chunk_cols(R, cap, K)
        for s in range(0, cap, step):
            e = min(s + step, cap)
            h = jnp.take(mat, idx[:, s:e], axis=0) * vals[:, s:e, None]
            part = jnp.sum(h, axis=1)
            acc = part if acc is None else acc + part
        return acc
    step = max(1, _ROW_CHUNK_ELEMS // max(cap * K, 1))
    if step >= R:
        h = jnp.take(mat, idx, axis=0) * vals[..., None]
        return jnp.sum(h, axis=1)
    parts = []
    for s in range(0, R, step):
        e = min(s + step, R)
        h = jnp.take(mat, idx[s:e], axis=0) * vals[s:e][..., None]
        parts.append(jnp.sum(h, axis=1))
    return jnp.concatenate(parts, axis=0)


def ell_spmm(
    ell: EllFormat, value: Optional[jnp.ndarray], mat: jnp.ndarray,
    baked=None,
) -> jnp.ndarray:
    """out[r] = sum over r's edges of value[e] * mat[idx[e]], shape (M, K).

    ``value=None`` means implicit ones (padding slots contribute 0 via a
    mask).  ``baked`` (from :func:`bake_values`) supplies the values in
    slot layout, skipping the per-slot gather — callers must guarantee
    ``baked == value_pad[eids]`` (the storage cache layer does).  Pure
    XLA, scatter-free, jit-safe; differentiable in ``value``/``mat`` by
    JAX AD, though callers on the hot path should use the custom-VJP
    wrapper in ``ops/matmul.py`` which backs the ``grad_mat`` pass with
    the transpose ELL instead of a scatter.

    Half-precision operands compute through f32 internally: XLA's
    sub-512-byte-granule gathers are ~4x slower than one dense upcast,
    and f32 accumulation is strictly more accurate.
    """
    out_dtype = mat.dtype
    if mat.dtype in (jnp.bfloat16, jnp.float16):
        mat = mat.astype(jnp.float32)
    K = mat.shape[1]
    if value is not None and baked is None:
        value_pad = jnp.concatenate(
            [value, jnp.zeros((1,), value.dtype)]
        )
    outs = []
    for bi, (eids, idx) in enumerate(zip(ell.eids, ell.idxs)):
        if baked is not None:
            vals = baked[bi].astype(mat.dtype)
        elif value is not None:
            vals = jnp.take(value_pad, eids, axis=0).astype(mat.dtype)
        else:
            vals = (eids < ell.E).astype(mat.dtype)
        outs.append(_bucket_sum(mat, idx, vals))
    if ell.n_zero:
        outs.append(jnp.zeros((ell.n_zero, K), mat.dtype))
    if not outs:
        return jnp.zeros((ell.M, K), out_dtype)
    stacked = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return jnp.take(stacked, ell.inv_perm, axis=0).astype(out_dtype)


def ell_edge_dot(
    ell: EllFormat, mat: jnp.ndarray, grad: jnp.ndarray
) -> jnp.ndarray:
    """Per-edge dot ``out[e] = <mat[idx[e]], grad[row[e]]>`` in ELL layout.

    This is the ``grad_value`` pass of SpMM-sum
    (``cpu/spmm_cpu.cpp:103-152``); computing it here gathers ``grad``
    once per bucket *row* instead of once per edge, halving random-read
    traffic vs the per-edge two-gather formulation.
    """
    parts = []
    for idx, rows in zip(ell.idxs, ell.rows):
        g = jnp.take(grad, rows, axis=0)          # (R, K)
        cap = idx.shape[1]
        chunks = []
        step = _chunk_cols(idx.shape[0], cap, mat.shape[1])
        for s in range(0, cap, step):
            e = min(s + step, cap)
            h = jnp.take(mat, idx[:, s:e], axis=0)    # (R, c, K)
            chunks.append(jnp.einsum("rck,rk->rc", h, g))
        rc = chunks[0] if len(chunks) == 1 else jnp.concatenate(
            chunks, axis=1
        )
        parts.append(rc.reshape(-1))
    if not parts:
        return jnp.zeros((0,), mat.dtype)
    flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return jnp.take(flat, ell.edge_slot, axis=0)


def ell_minmax_bwd(
    ell: EllFormat,
    ell_t: EllFormat,
    col: jnp.ndarray,
    value: Optional[jnp.ndarray],
    mat: jnp.ndarray,
    arg: jnp.ndarray,
    grad: jnp.ndarray,
):
    """Scatter-free backward for min/max SpMM.

    The reference scatters ``grad`` through the argout and then scatters
    per-edge contributions into ``grad_mat`` (``csrc/spmm.cpp:204-303``).
    Here both passes are gathers: per-bucket slots test
    ``arg[row, k] == eid`` to route the gradient, and the transpose ELL
    groups the per-edge results by column for ``grad_mat``.
    """
    E = ell.E
    K = grad.shape[1]

    # tmp[e, k] = grad[row_e, k] if arg[row_e, k] == e else 0, in slot
    # layout, then gathered back to edge order via edge_slot.
    arg_pad = jnp.concatenate(
        [arg, jnp.full((1, K), -1, arg.dtype)], axis=0
    )
    grad_pad = jnp.concatenate([grad, jnp.zeros((1, K), grad.dtype)])
    parts = []
    for eids, rows in zip(ell.eids, ell.rows):
        a = jnp.take(arg_pad, rows, axis=0)       # (R, K)
        g = jnp.take(grad_pad, rows, axis=0)      # (R, K)
        R, cap = eids.shape
        step = _chunk_cols(R, cap, K)
        chunks = []
        for s in range(0, cap, step):
            e = min(s + step, cap)
            hit = a[:, None, :] == eids[:, s:e, None]   # (R, c, K)
            chunks.append(jnp.where(hit, g[:, None, :], 0.0))
        rc = chunks[0] if len(chunks) == 1 else jnp.concatenate(
            chunks, axis=1
        )
        parts.append(rc.reshape(-1, K))
    if parts:
        flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        tmp = jnp.take(flat, ell.edge_slot, axis=0)   # (E, K) edge order
    else:
        tmp = jnp.zeros((E, K), grad.dtype)

    grad_value = None
    if value is not None:
        grad_value = jnp.sum(
            tmp * jnp.take(mat, col, axis=0), axis=-1
        ).astype(value.dtype)
        tmp = tmp * value[:, None].astype(tmp.dtype)

    # grad_mat[c] = sum over edges with col == c of tmp[e]; the transpose
    # ELL groups edges by column.
    tmp_pad = jnp.concatenate([tmp, jnp.zeros((1, K), tmp.dtype)])
    outs = []
    for eids_t in ell_t.eids:
        R, cap = eids_t.shape
        step = _chunk_cols(R, cap, K)
        acc = None
        for s in range(0, cap, step):
            e = min(s + step, cap)
            part = jnp.sum(
                jnp.take(tmp_pad, eids_t[:, s:e], axis=0), axis=1
            )
            acc = part if acc is None else acc + part
        outs.append(acc)
    if ell_t.n_zero:
        outs.append(jnp.zeros((ell_t.n_zero, K), tmp.dtype))
    if outs:
        stacked = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        grad_mat = jnp.take(stacked, ell_t.inv_perm, axis=0)
    else:
        grad_mat = jnp.zeros((ell_t.M, K), tmp.dtype)
    return grad_value, grad_mat.astype(mat.dtype)


def ell_edge_softmax(ell: EllFormat, logits: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable softmax of per-edge ``logits`` (E, H) over each
    row's incident edges, scatter-free: per-bucket masked max/sum with a
    broadcast back through ``edge_slot``."""
    E, H = logits.shape
    neg = jnp.asarray(-jnp.inf, logits.dtype)
    logits_pad = jnp.concatenate(
        [logits, jnp.full((1, H), neg, logits.dtype)]
    )
    mx_parts, sm_parts = [], []
    for eids in ell.eids:
        lv = jnp.take(logits_pad, eids, axis=0)      # (R, cap, H)
        mx = jnp.max(lv, axis=1, keepdims=True)      # (R, 1, H)
        ex = jnp.where(
            (eids < E)[..., None], jnp.exp(lv - mx),
            jnp.zeros((), logits.dtype),
        )
        sm = jnp.sum(ex, axis=1, keepdims=True)      # (R, 1, H)
        R, cap = eids.shape
        mx_parts.append(jnp.broadcast_to(mx, (R, cap, H)).reshape(-1, H))
        sm_parts.append(jnp.broadcast_to(sm, (R, cap, H)).reshape(-1, H))
    if not mx_parts:
        return logits
    mx_flat = (
        mx_parts[0] if len(mx_parts) == 1 else jnp.concatenate(mx_parts)
    )
    sm_flat = (
        sm_parts[0] if len(sm_parts) == 1 else jnp.concatenate(sm_parts)
    )
    row_max = jnp.take(mx_flat, ell.edge_slot, axis=0)
    row_sum = jnp.take(sm_flat, ell.edge_slot, axis=0)
    return jnp.exp(logits - row_max) / jnp.maximum(row_sum, 1e-16)


def ell_spmm_minmax(
    ell: EllFormat,
    value: Optional[jnp.ndarray],
    mat: jnp.ndarray,
    is_min: bool,
):
    """Scatter-free min/max SpMM with the reference argout contract:
    per (row, k), the *first* CSR-order edge achieving the extremum;
    empty rows produce 0 with the out-of-range sentinel ``arg == E``
    (``csrc/spmm.cpp:204-303``, ``reducer.h:70-73``)."""
    K = mat.shape[1]
    if value is not None:
        value_pad = jnp.concatenate([value, jnp.zeros((1,), value.dtype)])
    big = jnp.asarray(
        jnp.inf if is_min else -jnp.inf, mat.dtype
    )
    outs, args = [], []
    for eids, idx in zip(ell.eids, ell.idxs):
        cap = idx.shape[1]
        best = best_slot = None
        step = _chunk_cols(idx.shape[0], cap, mat.shape[1])
        for s in range(0, cap, step):
            e = min(s + step, cap)
            h = jnp.take(mat, idx[:, s:e], axis=0)    # (R, c, K)
            if value is not None:
                vals = jnp.take(
                    value_pad, eids[:, s:e], axis=0
                ).astype(mat.dtype)
                h = h * vals[..., None]
            mask = (eids[:, s:e] < ell.E)[..., None]
            h = jnp.where(mask, h, big)
            if is_min:
                slot = jnp.argmin(h, axis=1).astype(jnp.int32) + s
                ext = jnp.min(h, axis=1)
            else:
                slot = jnp.argmax(h, axis=1).astype(jnp.int32) + s
                ext = jnp.max(h, axis=1)
            if best is None:
                best, best_slot = ext, slot
            else:
                # Strict comparison keeps the FIRST slot on ties,
                # matching the reference reducer (reducer.h:52-62).
                better = (ext < best) if is_min else (ext > best)
                best = jnp.where(better, ext, best)
                best_slot = jnp.where(better, slot, best_slot)
        outs.append(best)
        args.append(
            jnp.take_along_axis(
                eids, best_slot.astype(eids.dtype), axis=1
            )
        )
    if ell.n_zero:
        outs.append(jnp.zeros((ell.n_zero, K), mat.dtype))
        args.append(jnp.full((ell.n_zero, K), ell.E, jnp.int32))
    if not outs:
        return (jnp.zeros((ell.M, K), mat.dtype),
                jnp.full((ell.M, K), ell.E, jnp.int32))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    arg = args[0] if len(args) == 1 else jnp.concatenate(args, axis=0)
    return (
        jnp.take(out, ell.inv_perm, axis=0),
        jnp.take(arg, ell.inv_perm, axis=0),
    )
