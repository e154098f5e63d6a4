"""Sparse x dense (SpMM) and sparse x sparse (SpSpMM) matmul with autograd.

TPU-native re-design of the reference's ``torch_sparse/matmul.py`` +
``csrc/spmm.cpp``.  Gradient semantics replicate the reference exactly:

* Gradients flow **only to `value` and the dense operand**, never to the
  index structure (reference ``README.md:29``).
* ``sum``: ``grad_value[e] = <mat[col[e]], grad_out[row[e]]>`` (the per-nnz
  dot of ``csrc/spmm.cpp:96-98`` / ``cpu/spmm_cpu.cpp:103-152``) and
  ``grad_mat = A^T @ grad_out`` (``csrc/spmm.cpp:100-108``) — here expressed
  as a col-keyed scatter-add instead of a csr2csc-permuted second SpMM,
  which XLA fuses with the backward graph.
* ``mean``: forward divides by ``max(rowcount, 1)`` and backward folds
  ``1/deg`` into both gradients (``csrc/spmm.cpp:115-183``).
* ``min``/``max``: forward records an argout per (row, feature) with the
  out-of-range sentinel ``arg == E`` marking empty rows
  (``csrc/spmm.cpp:204-303``); backward routes gradients through the argout
  only.

The forward computation itself is the gather/segment-reduce formulation:
``out = segment_reduce(value * mat[col], row)``.  XLA lowers the gather +
multiply + segmented reduction into fused HBM-bandwidth-bound loops.
(A Pallas one-hot-MXU sorted-segment kernel was built, measured, and
REMOVED in round 3: its reduce-only time ≈ the ELL path's entire SpMM,
and Pallas cannot gather from HBM, so it could never own the full op —
the measured negative is recorded in BASELINE.md/PARITY.md.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes

from ..tensor import SparseTensor
from .kernels.ell import (
    ell_edge_dot, ell_minmax_bwd, ell_spmm, ell_spmm_minmax,
)
from .kernels.hybrid import hybrid_spmm, hybrid_spmm_t
from .segment import (segment_count, segment_mean, segment_min,
                      segment_max, segment_sum)
from ..utils.host_sort import stable_argsort


def _int_zero(x):
    """Symbolic-zero cotangent for integer primal inputs."""
    return np.zeros(x.shape, dtype=dtypes.float0)


def _zero_cotangent(tree):
    """Zero cotangent for a mixed int/float pytree (format structures):
    float0 for integer leaves, broadcast zeros for float leaves (XLA
    folds the broadcast; the cotangent is DCE'd unless requested)."""
    def z(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
            return _int_zero(x)
        return jnp.zeros_like(x)

    return jax.tree_util.tree_map(z, tree)


# ----------------------------------------------------------------------
# Core COO SpMM primitives over raw arrays.  ``value`` may be None
# (implicit ones).  ``mat`` is (N, K); batching is added by vmap in the
# public dispatcher.
# ----------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_sum(M: int, row, col, value, mat):
    h = jnp.take(mat, col, axis=0)
    if value is not None:
        h = h * value[:, None].astype(h.dtype)
    return segment_sum(h, row, M, indices_are_sorted=True)


def _spmm_sum_fwd(M, row, col, value, mat):
    out = _spmm_sum(M, row, col, value, mat)
    return out, (row, col, value, mat)


def _spmm_sum_bwd(M, res, grad):
    row, col, value, mat = res
    grad_value = None
    if value is not None:
        # per-nnz dot of mat row and grad row (cpu/spmm_cpu.cpp:126-148).
        grad_value = jnp.sum(
            jnp.take(mat, col, axis=0) * jnp.take(grad, row, axis=0), axis=-1
        ).astype(value.dtype)
    # grad_mat = A^T grad (csrc/spmm.cpp:100-108).
    g = jnp.take(grad, row, axis=0)
    if value is not None:
        g = g * value[:, None].astype(g.dtype)
    grad_mat = jnp.zeros_like(mat).at[col].add(g.astype(mat.dtype))
    return (_int_zero(row), _int_zero(col), grad_value, grad_mat)


_spmm_sum.defvjp(_spmm_sum_fwd, _spmm_sum_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_mean(M: int, row, col, value, mat):
    h = jnp.take(mat, col, axis=0)
    if value is not None:
        h = h * value[:, None].astype(h.dtype)
    return segment_mean(h, row, M, indices_are_sorted=True)


def _spmm_mean_fwd(M, row, col, value, mat):
    out = _spmm_mean(M, row, col, value, mat)
    return out, (row, col, value, mat)


def _spmm_mean_bwd(M, res, grad):
    row, col, value, mat = res
    deg = jnp.maximum(
        segment_count(row, M, indices_are_sorted=True), 1
    ).astype(grad.dtype)
    # Fold 1/deg into the incoming gradient (csrc/spmm.cpp:166-177).
    gscaled = grad / deg[:, None]
    grad_value = None
    if value is not None:
        grad_value = jnp.sum(
            jnp.take(mat, col, axis=0) * jnp.take(gscaled, row, axis=0),
            axis=-1,
        ).astype(value.dtype)
    g = jnp.take(gscaled, row, axis=0)
    if value is not None:
        g = g * value[:, None].astype(g.dtype)
    grad_mat = jnp.zeros_like(mat).at[col].add(g.astype(mat.dtype))
    return (_int_zero(row), _int_zero(col), grad_value, grad_mat)


_spmm_mean.defvjp(_spmm_mean_fwd, _spmm_mean_bwd)


def _spmm_minmax_raw(M, row, col, value, mat, is_min):
    E = row.shape[0]
    h = jnp.take(mat, col, axis=0)
    if value is not None:
        h = h * value[:, None].astype(h.dtype)
    seg = segment_min if is_min else segment_max
    out = seg(h, row, M, indices_are_sorted=True)
    # argout: first nnz per (row, feature) achieving the extremum; empty
    # rows keep the sentinel E (csrc/spmm.cpp:210-211).
    e_idx = jnp.arange(E, dtype=jnp.int32)[:, None]
    cand = jnp.where(h == jnp.take(out, row, axis=0), e_idx, E)
    arg = segment_min(cand, row, M, indices_are_sorted=True)
    # segment_min zeroes empty segments -> restore sentinel E there.
    count = segment_count(row, M, indices_are_sorted=True)
    arg = jnp.where(count[:, None] > 0, arg, E)
    return out, arg


def _minmax_bwd_common(row, col, value, mat, arg, grad):
    E = row.shape[0]
    K = grad.shape[-1]
    karange = jnp.arange(K, dtype=jnp.int32)[None, :]
    # Scatter grad through argout; sentinel rows land in the extra slot.
    tmp = jnp.zeros((E + 1, K), dtype=grad.dtype).at[arg, karange].add(grad)
    tmp = tmp[:E]
    grad_value = None
    if value is not None:
        grad_value = jnp.sum(
            tmp * jnp.take(mat, col, axis=0), axis=-1
        ).astype(value.dtype)
        tmp = tmp * value[:, None].astype(tmp.dtype)
    grad_mat = jnp.zeros_like(mat).at[col].add(tmp.astype(mat.dtype))
    return grad_value, grad_mat


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_min(M: int, row, col, value, mat):
    return _spmm_minmax_raw(M, row, col, value, mat, True)


def _spmm_min_fwd(M, row, col, value, mat):
    out, arg = _spmm_minmax_raw(M, row, col, value, mat, True)
    return (out, arg), (row, col, value, mat, arg)


def _spmm_min_bwd(M, res, grads):
    row, col, value, mat, arg = res
    grad, _ = grads
    grad_value, grad_mat = _minmax_bwd_common(row, col, value, mat, arg, grad)
    return (_int_zero(row), _int_zero(col), grad_value, grad_mat)


_spmm_min.defvjp(_spmm_min_fwd, _spmm_min_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_max(M: int, row, col, value, mat):
    return _spmm_minmax_raw(M, row, col, value, mat, False)


def _spmm_max_fwd(M, row, col, value, mat):
    out, arg = _spmm_minmax_raw(M, row, col, value, mat, False)
    return (out, arg), (row, col, value, mat, arg)


def _spmm_max_bwd(M, res, grads):
    row, col, value, mat, arg = res
    grad, _ = grads
    grad_value, grad_mat = _minmax_bwd_common(row, col, value, mat, arg, grad)
    return (_int_zero(row), _int_zero(col), grad_value, grad_mat)


_spmm_max.defvjp(_spmm_max_fwd, _spmm_max_bwd)


# ----------------------------------------------------------------------
# ELLPACK fast path (scatter-free; ops/kernels/ell.py).  The custom VJP
# keeps the reference gradient contract and backs grad_mat with the
# transpose ELL instead of a scatter (csrc/spmm.cpp:100-108 obtains the
# same transpose via the cached csr2csc permutation).
# ----------------------------------------------------------------------

@jax.custom_vjp
def _ell_spmm_sum(ellA, ellAT, bakedA, bakedAT, row, col, value, mat):
    # ``baked*`` are slot-layout value caches (storage.ell_baked());
    # they MUST equal value_pad[eids] — the cache layer drops them on
    # set_value, like the hybrid format's baked blocks.
    return ell_spmm(ellA, value, mat, baked=bakedA)


def _ell_spmm_sum_fwd(ellA, ellAT, bakedA, bakedAT, row, col, value, mat):
    return (ell_spmm(ellA, value, mat, baked=bakedA),
            (ellA, ellAT, bakedA, bakedAT, row, col, value, mat))


def _ell_spmm_sum_bwd(res, grad):
    ellA, ellAT, bakedA, bakedAT, row, col, value, mat = res
    grad_value = None
    if value is not None:
        grad_value = ell_edge_dot(ellA, mat, grad).astype(value.dtype)
    grad_mat = ell_spmm(ellAT, value, grad, baked=bakedAT).astype(mat.dtype)
    zeros = partial(jax.tree_util.tree_map, _int_zero)
    return (
        zeros(ellA), zeros(ellAT), _zero_cotangent(bakedA),
        _zero_cotangent(bakedAT), _int_zero(row), _int_zero(col),
        grad_value, grad_mat,
    )


_ell_spmm_sum.defvjp(_ell_spmm_sum_fwd, _ell_spmm_sum_bwd)


def _ell_baked_views(src: SparseTensor, value):
    """(bakedA, bakedAT) when available — both or neither, so the
    forward and its transpose backward stay consistent."""
    if value is None:
        return None, None
    st = src.storage
    bakedA = st.ell_baked()
    bakedAT = st.ell_t_baked()
    if bakedA is None or bakedAT is None:
        return None, None
    return bakedA, bakedAT


# min/max: scatter-free ELL forward with the reference argout contract;
# the backward routes gradients through the saved argout exactly like
# csrc/spmm.cpp:204-303 (shared with the segment path).

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ell_spmm_min(is_min: bool, ellA, ellAT, row, col, value, mat):
    return ell_spmm_minmax(ellA, value, mat, is_min)


def _ell_spmm_min_fwd(is_min, ellA, ellAT, row, col, value, mat):
    out, arg = ell_spmm_minmax(ellA, value, mat, is_min)
    return (out, arg), (ellA, ellAT, row, col, value, mat, arg)


def _ell_spmm_min_bwd(is_min, res, grads):
    ellA, ellAT, row, col, value, mat, arg = res
    grad, _ = grads
    grad_value, grad_mat = ell_minmax_bwd(
        ellA, ellAT, col, value, mat, arg, grad
    )
    zeros = partial(jax.tree_util.tree_map, _int_zero)
    return (
        zeros(ellA), zeros(ellAT), _int_zero(row), _int_zero(col),
        grad_value, grad_mat,
    )


_ell_spmm_min.defvjp(_ell_spmm_min_fwd, _ell_spmm_min_bwd)


# ----------------------------------------------------------------------
# Hybrid block-dense + ELL fast path (ops/kernels/hybrid.py): dense
# blocks run as batched MXU matmuls, the remainder through ELL.  The
# custom VJP keeps the reference gradient contract (csrc/spmm.cpp:
# 88-112): grad_value[e] = <mat[col_e], grad[row_e]> (exact for every
# edge — the output is linear in value, so the baked blocks don't
# enter), grad_mat = A^T @ grad via the transpose block tables.
# ----------------------------------------------------------------------

@jax.custom_vjp
def _hybrid_spmm_sum(h, row, col, value, mat):
    return hybrid_spmm(h, mat, value=value)


def _hybrid_spmm_sum_fwd(h, row, col, value, mat):
    return hybrid_spmm(h, mat, value=value), (h, row, col, value, mat)


def _edge_dot_chunked(row, col, mat, grad):
    """``out[e] = <mat[col[e]], grad[row[e]]>`` with bounded memory.

    The naive two-gather formulation materializes two ``(E, K)`` arrays —
    ~58 GB each at full-Reddit scale — so scan over fixed-size edge
    chunks instead, keeping the gathered temporaries near the same
    element budget the ELL kernels use (``ell._CHUNK_ELEMS``).
    """
    from .kernels.ell import _CHUNK_ELEMS

    E, K = row.shape[0], mat.shape[1]
    if E == 0:
        return jnp.zeros((0,), mat.dtype)
    step = min(E, max(1, _CHUNK_ELEMS // max(K, 1)))
    n = -(-E // step)
    if n == 1:
        return jnp.sum(
            jnp.take(mat, col, axis=0) * jnp.take(grad, row, axis=0),
            axis=-1,
        )
    pad = n * step - E
    r = jnp.concatenate([row, jnp.zeros(pad, row.dtype)]) if pad else row
    c = jnp.concatenate([col, jnp.zeros(pad, col.dtype)]) if pad else col

    def body(_, rc):
        ri, ci = rc
        return None, jnp.sum(
            jnp.take(mat, ci, axis=0) * jnp.take(grad, ri, axis=0),
            axis=-1,
        )

    _, outs = jax.lax.scan(
        body, None, (r.reshape(n, step), c.reshape(n, step))
    )
    return outs.reshape(-1)[:E]


def _hybrid_spmm_sum_bwd(res, grad):
    h, row, col, value, mat = res
    grad_value = None
    if value is not None:
        grad_value = _edge_dot_chunked(row, col, mat, grad).astype(
            value.dtype
        )
    grad_mat = hybrid_spmm_t(h, grad, value=value).astype(mat.dtype)
    return (
        _zero_cotangent(h), _int_zero(row), _int_zero(col),
        grad_value, grad_mat,
    )


_hybrid_spmm_sum.defvjp(_hybrid_spmm_sum_fwd, _hybrid_spmm_sum_bwd)


def _hybrid_view(src: SparseTensor, other):
    """The cached/auto-built hybrid view when it can serve this call."""
    if other.ndim != 2:
        return None  # batched operands stay on the ELL path
    if not jnp.issubdtype(other.dtype, jnp.floating):
        return None
    # Break-even priced at this call's feature width (VERDICT r4 item
    # 7): K=16 operands densify at a lower block-density threshold than
    # K=128 ones (the X temporaries + MXU flops scale with K while the
    # per-edge gather cost barely moves).
    return src.storage.hybrid(K_hint=int(other.shape[-1]))


def _ell_views(src: SparseTensor):
    """Both ELL views if available (cached, or buildable eagerly)."""
    st = src.storage
    ell = st.ell()
    if ell is None:
        return None
    ell_t = st.ell_t()
    if ell_t is None:
        return None
    return ell, ell_t


# ----------------------------------------------------------------------
# Public SpMM API over SparseTensor (reference matmul.py:9-91)
# ----------------------------------------------------------------------

def spmm_sum(src: SparseTensor, other: jnp.ndarray) -> jnp.ndarray:
    row, col, value = src.storage.row(), src.storage.col(), src.storage.value()
    M = src.sparse_size(0)
    hyb = _hybrid_view(src, other)
    if hyb is not None:
        return _hybrid_spmm_sum(hyb, row, col, value, other)
    views = _ell_views(src)
    if views is not None:
        ellA, ellAT = views
        bakedA, bakedAT = _ell_baked_views(src, value)
        if other.ndim == 2:
            return _ell_spmm_sum(ellA, ellAT, bakedA, bakedAT, row, col,
                                 value, other)
        return jax.vmap(
            lambda m: _ell_spmm_sum(ellA, ellAT, bakedA, bakedAT, row,
                                    col, value, m)
        )(other)
    if other.ndim == 2:
        return _spmm_sum(M, row, col, value, other)
    return jax.vmap(lambda m: _spmm_sum(M, row, col, value, m))(other)


def spmm_add(src: SparseTensor, other: jnp.ndarray) -> jnp.ndarray:
    return spmm_sum(src, other)


def spmm_mean(src: SparseTensor, other: jnp.ndarray) -> jnp.ndarray:
    row, col, value = src.storage.row(), src.storage.col(), src.storage.value()
    M = src.sparse_size(0)
    hyb = _hybrid_view(src, other)
    if hyb is not None:
        # mean = sum / max(deg, 1); AD folds 1/deg into both gradients,
        # matching csrc/spmm.cpp:166-177.
        deg = jnp.maximum(src.storage.rowcount(), 1).astype(other.dtype)
        out = _hybrid_spmm_sum(hyb, row, col, value, other)
        return out / deg[:, None]
    views = _ell_views(src)
    if views is not None:
        # mean = sum / max(deg, 1); JAX AD folds the 1/deg into both
        # gradients automatically, matching csrc/spmm.cpp:166-177.
        ellA, ellAT = views
        bakedA, bakedAT = _ell_baked_views(src, value)
        deg = jnp.maximum(src.storage.rowcount(), 1).astype(other.dtype)
        if other.ndim == 2:
            out = _ell_spmm_sum(ellA, ellAT, bakedA, bakedAT, row, col,
                                value, other)
            return out / deg[:, None]
        out = jax.vmap(
            lambda m: _ell_spmm_sum(ellA, ellAT, bakedA, bakedAT, row,
                                    col, value, m)
        )(other)
        return out / deg[None, :, None]
    if other.ndim == 2:
        return _spmm_mean(M, row, col, value, other)
    return jax.vmap(lambda m: _spmm_mean(M, row, col, value, m))(other)


def _spmm_minmax_dispatch(src, other, is_min):
    row, col, value = src.storage.row(), src.storage.col(), src.storage.value()
    M = src.sparse_size(0)
    views = _ell_views(src)
    if views is not None:
        ellA, ellAT = views
        if other.ndim == 2:
            return _ell_spmm_min(is_min, ellA, ellAT, row, col, value, other)
        return jax.vmap(
            lambda m: _ell_spmm_min(is_min, ellA, ellAT, row, col, value, m)
        )(other)
    fn = _spmm_min if is_min else _spmm_max
    if other.ndim == 2:
        return fn(M, row, col, value, other)
    return jax.vmap(lambda m: fn(M, row, col, value, m))(other)


def spmm_min(src: SparseTensor, other: jnp.ndarray):
    return _spmm_minmax_dispatch(src, other, True)


def spmm_max(src: SparseTensor, other: jnp.ndarray):
    return _spmm_minmax_dispatch(src, other, False)


def spmm(src: SparseTensor, other: jnp.ndarray, reduce: str = "sum"):
    """Reduce-mode dispatcher (reference ``matmul.py:79-91``)."""
    if reduce in ("sum", "add"):
        return spmm_sum(src, other)
    elif reduce == "mean":
        return spmm_mean(src, other)
    elif reduce == "min":
        return spmm_min(src, other)[0]
    elif reduce == "max":
        return spmm_max(src, other)[0]
    raise ValueError(f"Unknown reduce mode: {reduce!r}")


# ----------------------------------------------------------------------
# SpSpMM (reference matmul.py:94-126). Unlike the reference, which
# delegates to torch.sparse.mm, we own the SpGEMM: an eager symbolic
# (structure) pass + a jit-able, differentiable numeric pass.
# ----------------------------------------------------------------------

def _spspmm_structure(A: SparseTensor, B: SparseTensor, e_lo: int = 0,
                      e_hi: Optional[int] = None):
    """Expansion-pass structure: for each A-nnz (i, k), enumerate B's row k.

    Returns the gather indices of the expanded product terms (``a_pos``,
    ``b_pos``), the coalesced output structure (``rowC``/``colC``), and a
    term-count-bucketed reduction plan (``t_tabs``/``out_order``) so the
    numeric pass is scatter-free on TPU: each output nnz sums its
    contiguous run of terms via take + row-sum over fixed-width buckets.
    Runs eagerly on concrete index arrays (data-dependent output size).

    ``[e_lo, e_hi)`` restricts the pass to a range of A-nnz (must align
    with complete-row boundaries for the output to be a row block of C);
    the returned ``a_pos`` stays absolute into A's nnz. This is the unit
    of work of the chunked/streaming drivers in ``ops/spgemm.py``.
    """
    from .kernels.ell import _choose_caps

    rowA = A.storage.numpy_view("row")
    colA = A.storage.numpy_view("col")
    if e_hi is None:
        e_hi = rowA.shape[0]
    rowA, colA = rowA[e_lo:e_hi], colA[e_lo:e_hi]
    rowptrB = B.storage.numpy_view("rowptr")
    colB = B.storage.numpy_view("col")

    deg = rowptrB[colA + 1] - rowptrB[colA]  # expansions per A-nnz
    total = int(deg.sum())
    # For each product term t, the source A-nnz index.
    a_pos = np.repeat(np.arange(colA.shape[0]), deg)
    # Offset of t within its A-nnz's expansion run.
    run_start = np.concatenate([[0], np.cumsum(deg)[:-1]])
    offset = np.arange(total) - run_start[a_pos]
    b_pos = rowptrB[colA[a_pos]] + offset

    out_row = rowA[a_pos]
    out_col = colB[b_pos]

    # Coalesce structure: sort by (row, col) via a single fused int64
    # key (~2x faster than lexsort at multi-million terms), dedupe.
    # A-rows are already major-sorted, so sorting each bounded chunk of
    # complete rows independently yields a globally sorted order while
    # keeping the sort working set (and its k log k cost) bounded.
    P_cols = B.sparse_size(1)
    key = out_row.astype(np.int64) * P_cols + out_col
    CHUNK = 1 << 25  # ~32M terms per sort
    if total > CHUNK:
        # chunk boundaries at complete-row edges
        row_change = np.flatnonzero(
            np.concatenate([[True], out_row[1:] != out_row[:-1]])
        )
        order = np.empty(total, np.int64)
        s = 0
        while s < total:
            e = min(s + CHUNK, total)
            if e < total:  # extend to the next complete-row boundary
                ip = np.searchsorted(row_change, e)
                e = int(row_change[ip]) if ip < row_change.size else total
            order[s:e] = s + stable_argsort(key[s:e])
            s = e
    else:
        order = stable_argsort(key)
    out_row, out_col = out_row[order], out_col[order]
    a_pos, b_pos = a_pos[order], b_pos[order]
    if total > 0:
        new = np.concatenate(
            [[True], (out_row[1:] != out_row[:-1]) | (out_col[1:] != out_col[:-1])]
        )
    else:
        new = np.zeros((0,), dtype=bool)
    seg = np.cumsum(new) - 1
    n_out = int(seg[-1]) + 1 if total > 0 else 0
    rowC = out_row[new]
    colC = out_col[new]

    # Scatter-free reduction plan: bucket output nnz by term count.
    t_start = np.flatnonzero(new)
    t_cnt = np.diff(np.concatenate([t_start, [total]]))
    caps = _choose_caps(t_cnt)
    by_cnt = np.argsort(t_cnt, kind="stable")
    t_tabs = []
    parts = []
    for bi, cap in enumerate(caps):
        lo = caps[bi - 1] if bi > 0 else 0
        sel = by_cnt[(t_cnt[by_cnt] > lo) & (t_cnt[by_cnt] <= cap)]
        if sel.size == 0:
            continue
        R = sel.size
        tab = np.full((R, cap), total, dtype=np.int64)  # sentinel pad
        # O(terms) fill: flat (bucket-row, slot) coordinates.
        ln = t_cnt[sel]
        rix = np.repeat(np.arange(R), ln)
        off = np.arange(rix.shape[0]) - np.repeat(np.cumsum(ln) - ln, ln)
        tab[rix, off] = np.repeat(t_start[sel], ln) + off
        t_tabs.append(jnp.asarray(tab.astype(np.int32)))
        parts.append(sel)
    out_perm = (
        np.concatenate(parts) if parts else np.zeros((0,), np.int64)
    )
    inv = np.empty(n_out, np.int64)
    inv[out_perm] = np.arange(n_out)

    return (
        jnp.asarray(a_pos + e_lo, jnp.int32), jnp.asarray(b_pos, jnp.int32),
        t_tabs, jnp.asarray(inv.astype(np.int32)), n_out,
        jnp.asarray(rowC, jnp.int32), jnp.asarray(colC, jnp.int32),
    )


def _plan_numeric(valueA, valueB, nnzA, nnzB, a_pos, b_pos, t_tabs, inv,
                  n_out) -> Optional[jnp.ndarray]:
    """Differentiable scatter-free numeric pass over a structure plan."""
    if valueA is None and valueB is None:
        return None
    if valueA is None:
        valueA = jnp.ones((nnzA,), dtype=valueB.dtype)
    if valueB is None:
        valueB = jnp.ones((nnzB,), dtype=valueA.dtype)
    terms = valueA[a_pos] * valueB[b_pos]
    terms_pad = jnp.concatenate([terms, jnp.zeros((1,), terms.dtype)])
    parts = [
        jnp.sum(jnp.take(terms_pad, tab, axis=0), axis=1) for tab in t_tabs
    ]
    if parts:
        stacked = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return jnp.take(stacked, inv, axis=0)
    return jnp.zeros((n_out,), terms.dtype)


def spspmm_sum(A: SparseTensor, B: SparseTensor) -> SparseTensor:
    assert A.sparse_size(1) == B.sparse_size(0)
    from .spgemm import PLAN_MAX_TERMS, expansion_terms, spspmm_large

    if expansion_terms(A, B) > PLAN_MAX_TERMS:
        # Large products: the single-shot term-materializing plan would
        # not fit in host memory -> native Gustavson (concrete values) or
        # the chunked plan path (still differentiable). ops/spgemm.py.
        return spspmm_large(A, B)

    M, P = A.sparse_size(0), B.sparse_size(1)
    a_pos, b_pos, t_tabs, inv, n_out, rowC, colC = _spspmm_structure(A, B)
    valueC = _plan_numeric(
        A.storage.value(), B.storage.value(), A.nnz(), B.nnz(),
        a_pos, b_pos, t_tabs, inv, n_out,
    )
    return SparseTensor(
        row=rowC, col=colC, value=valueC, sparse_sizes=(M, P),
        is_sorted=True, trust_data=True,
    )


def spspmm(A: SparseTensor, B: SparseTensor, reduce: str = "sum") -> SparseTensor:
    if reduce in ("sum", "add"):
        return spspmm_sum(A, B)
    raise ValueError(
        f"`spspmm` reduce mode {reduce!r} not supported (reference "
        "matmul.py:118-126 supports only 'sum')."
    )


def matmul(src: SparseTensor, other, reduce: str = "sum"):
    """Polymorphic matmul (reference ``matmul.py:129-163``)."""
    if isinstance(other, SparseTensor):
        return spspmm(src, other, reduce)
    return spmm(src, jnp.asarray(other), reduce)


# Attach methods (reference matmul.py:166-171).
SparseTensor.spmm = lambda self, other, reduce="sum": spmm(self, other, reduce)
SparseTensor.spspmm = lambda self, other, reduce="sum": spspmm(self, other, reduce)
SparseTensor.matmul = lambda self, other, reduce="sum": matmul(self, other, reduce)
SparseTensor.__matmul__ = lambda self, other: matmul(self, other, "sum")
