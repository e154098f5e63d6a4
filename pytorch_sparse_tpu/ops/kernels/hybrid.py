"""Hybrid block-dense + ELL SpMM: route dense regions onto the MXU.

TPU measurement (BASELINE.md): a K-wide row gather reads one 512 B HBM
row per nnz with no cache behind it, so the gather/ELL path is stuck at
~600 B/nnz regardless of ordering.  A dense matmul producing the same
output costs 0.26 ms — the MXU is effectively free next to the gather.
On community graphs (Reddit-like, avg degree hundreds), a METIS-ordered
adjacency concentrates most edges in a few percent-dense diagonal-ish
blocks; storing those blocks DENSE converts their SpMM into batched
(B, B) @ (B, K) MXU matmuls whose HBM traffic is one block read per
(row-block, col-block) pair instead of one 512 B row per nnz.

Break-even per block: densifying pays when ``E_blk * (K*4 + 12)`` (the
gather traffic) exceeds ``B*B*4`` (the block read), i.e. density above
``1 / (K + 3)`` ≈ 0.76% at K=128 (independent of B).  Everything below
the threshold stays in the scatter-free ELL path — though note the
measured ELL path runs well below its roofline at large M, so a lower
threshold often wins in practice.

Format (a registered pytree, built eagerly host-side like the ELL
views):

* ``blocks``  (nb+1, B, B)  dense block values, row-major within the
  block; slot nb is the all-zero block for padding.
* ``btab``    (R, W) int32  per row-block: dense-block slot per term
  (sentinel nb).
* ``ctab``    (R, W) int32  per row-block: col-block index per term
  (sentinel points at a zero X block appended at position C).
* ``btab_t``/``ctab_t``  (C, Wt) int32  the same terms grouped by
  COL-block (``ctab_t`` holds the row-block index; sentinel R) — the
  transpose tables backing ``hybrid_spmm_t`` (grad_mat = A^T @ grad,
  reference ``csrc/spmm.cpp:100-108``).
* ``ell``     (EllFormat, baked_vals) | None — the remainder
  (sub-threshold) edges; ``ell_t`` is the remainder's transpose view.
* ``rest_ids``  (E_rest,) int32 — original edge id of each remainder
  edge (in the remainder's row-sorted order), so a live ``value``
  vector can drive the remainder instead of the baked values.

Forward: ``out_blocks[r] = Σ_w blocks[btab[r, w]] @ Xb[ctab[r, w]]`` —
a ``lax`` loop of gathers with multi-MB granules plus batched matmuls —
then ``+ ell_spmm(remainder)``.  All static shapes.

Gradients: the dense blocks bake the build-time values, so the
differentiable wrapper (``ops/matmul.py:_hybrid_spmm_sum``) requires the
``value`` argument to equal the values the format was built from (the
``SparseStorage`` cache guarantees this: ``set_value`` invalidates the
hybrid view).  At that point ``grad_mat = A^T @ grad`` runs through the
transpose tables on the MXU, and ``grad_value[e] = <mat[col_e],
grad[row_e]>`` is exact for every edge independent of the baked blocks
(the output is linear in value).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ell import EllFormat, build_ell, ell_spmm
from ...utils.host_sort import lexsort2, stable_argsort


class HybridFormat:
    def __init__(self, blocks, btab, ctab,
                 ell: Optional[Tuple[EllFormat, Any]],
                 M: int, N: int, B: int, dense_nnz: int,
                 row_map=None, M_pad: int = 0,
                 btab_t=None, ctab_t=None, ell_t=None, rest_ids=None):
        self.blocks = blocks
        self.btab = btab
        self.ctab = ctab
        self.ell = ell
        self.M, self.N, self.B = M, N, B
        self.dense_nnz = dense_nnz
        # Block-aligned layouts: node i lives at padded position
        # row_map[i] (each partition starts on a block boundary); the
        # internal matrices are (M_pad, M_pad) and hybrid_spmm
        # scatters/gathers x/out through the map.
        self.row_map = row_map
        self.M_pad = M_pad
        self.btab_t = btab_t
        self.ctab_t = ctab_t
        self.ell_t = ell_t
        self.rest_ids = rest_ids

    def __repr__(self) -> str:
        nb = int(self.blocks.shape[0]) - 1
        return (
            f"HybridFormat(M={self.M}, N={self.N}, B={self.B}, "
            f"blocks={nb}, dense_nnz={self.dense_nnz})"
        )


def _hyb_flatten(h: HybridFormat):
    return ((h.blocks, h.btab, h.ctab, h.ell, h.row_map, h.btab_t,
             h.ctab_t, h.ell_t, h.rest_ids),
            (h.M, h.N, h.B, h.dense_nnz, h.M_pad))


def _hyb_unflatten(aux, children):
    (blocks, btab, ctab, ell, row_map, btab_t, ctab_t, ell_t,
     rest_ids) = children
    M, N, B, dense_nnz, M_pad = aux
    return HybridFormat(blocks, btab, ctab, ell, M, N, B, dense_nnz,
                        row_map, M_pad, btab_t, ctab_t, ell_t, rest_ids)


jax.tree_util.register_pytree_node(HybridFormat, _hyb_flatten,
                                   _hyb_unflatten)


def dense_fraction(row: np.ndarray, col: np.ndarray, M: int, N: int,
                   B: int = 512, min_density: Optional[float] = None,
                   K_hint: int = 128) -> Tuple[float, int]:
    """Stats pass of the hybrid build: fraction of edges that would land
    in ≥break-even-density (B, B) blocks, and the dense block count.
    Backs the auto-routing decision in ``SparseStorage.hybrid()``."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    if row.size == 0:
        return 0.0, 0
    if min_density is None:
        min_density = 4.0 / (K_hint * 4 + 12)
    C = -(-N // B)
    bkey = (row // B) * C + col // B
    _, counts = np.unique(bkey, return_counts=True)
    thresh = max(int(min_density * B * B), 1)
    dense = counts[counts >= thresh]
    return float(dense.sum()) / row.size, int(dense.size)


def build_hybrid(
    row: np.ndarray, col: np.ndarray, value: Optional[np.ndarray],
    M: int, N: int, B: int = 1024,
    min_density: Optional[float] = None, K_hint: int = 128,
    block_dtype=None,
) -> HybridFormat:
    """Split edges into dense (B, B) blocks vs an ELL remainder.

    Host-side, eager (like the ELL build).  ``min_density`` defaults to
    the traffic break-even for ``K_hint``-wide features.
    """
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    E = row.shape[0]
    if value is None:
        val = np.ones(E, np.float32)
    else:
        # Keep the caller's value dtype: the ELL remainder stores values
        # verbatim, and the dense blocks accumulate/store at f64 when
        # the values are f64 (else f32; ``block_dtype`` overrides).
        val = np.asarray(value)
        if val.dtype.kind not in "fV":  # int/bool values -> f32 layout
            val = val.astype(np.float32)
    if min_density is None:
        # gather bytes per nnz vs one extra block read amortized:
        # 1 / (K + 3), independent of B
        min_density = 4.0 / (K_hint * 4 + 12)

    R = -(-M // B)
    C = -(-N // B)
    rb = row // B
    cb = col // B
    bkey = rb * C + cb
    # Work over OCCUPIED block keys only — dense O(R*C) scratch would be
    # multi-GB at M~10M, B~512.
    occ_keys, inv_key, occ_counts = (
        np.unique(bkey, return_inverse=True, return_counts=True)
        if bkey.size
        else (np.zeros(0, np.int64), np.zeros(0, np.int64),
              np.zeros(0, np.int64))
    )
    thresh = max(int(min_density * B * B), 1)
    occ_is_dense = occ_counts >= thresh
    dense_sel = occ_is_dense[inv_key] if bkey.size else np.zeros(0, bool)

    # --- dense part
    dsel = np.flatnonzero(dense_sel)
    dense_nnz = dsel.size
    dense_keys = occ_keys[occ_is_dense]  # sorted (np.unique output)
    nb = dense_keys.size
    # occupied-key index -> dense slot (sentinel nb for sparse keys)
    occ_slot = np.full(occ_keys.size, nb, np.int64)
    occ_slot[occ_is_dense] = np.arange(nb)
    blk_dt = np.float64 if val.dtype == np.float64 else np.float32
    blocks = np.zeros((nb + 1, B, B), blk_dt)
    if dense_nnz:
        np.add.at(
            blocks,
            (occ_slot[inv_key[dsel]], row[dsel] % B, col[dsel] % B),
            val[dsel].astype(blk_dt),
        )
    # per row-block slot tables: dense_keys is sorted, so one
    # searchsorted split gives each row block's run.
    row_of_key = dense_keys // C
    col_of_key = dense_keys % C
    starts = np.searchsorted(row_of_key, np.arange(R + 1))
    key_counts = np.diff(starts)
    W = max(int(key_counts.max()) if R else 1, 1)
    btab = np.full((R, W), nb, np.int64)
    ctab = np.full((R, W), C, np.int64)  # sentinel -> zero X block
    if nb:
        rix = np.repeat(np.arange(R), key_counts)
        off = np.arange(nb) - np.repeat(starts[:-1], key_counts)
        btab[rix, off] = np.arange(nb)
        ctab[rix, off] = col_of_key

    # Transpose tables: the same (slot, row-block) terms grouped by
    # col-block, backing grad_mat = A^T @ grad.
    order_t = stable_argsort(col_of_key)
    starts_t = np.searchsorted(col_of_key[order_t], np.arange(C + 1))
    key_counts_t = np.diff(starts_t)
    Wt = max(int(key_counts_t.max()) if C else 1, 1)
    btab_t = np.full((C, Wt), nb, np.int64)
    ctab_t = np.full((C, Wt), R, np.int64)  # sentinel -> zero grad block
    if nb:
        cix = np.repeat(np.arange(C), key_counts_t)
        off_t = np.arange(nb) - np.repeat(starts_t[:-1], key_counts_t)
        btab_t[cix, off_t] = order_t
        ctab_t[cix, off_t] = row_of_key[order_t]

    # --- ELL remainder (forward + transpose views; edge ids are
    # positions in the remainder's row-sorted order, rest_ids maps them
    # back to original edge ids).
    rest = np.flatnonzero(~dense_sel)
    ell = None
    ell_t = None
    rest_ids = None
    if rest.size:
        order = stable_argsort(row[rest])
        rr = rest[order]
        rows_r, cols_r = row[rr], col[rr]
        rptr = np.searchsorted(rows_r, np.arange(M + 1))
        ell = build_ell(rptr, cols_r, None, M)
        ell = (ell, jnp.asarray(val[rr]))
        csc_perm = lexsort2(cols_r, rows_r)
        cptr = np.searchsorted(cols_r[csc_perm], np.arange(N + 1))
        ell_t = build_ell(cptr, rows_r[csc_perm], csc_perm, N)
        rest_ids = jnp.asarray(rr.astype(np.int32 if E < 2**31
                                         else np.int64))

    if block_dtype is not None:
        # bf16 halves the block store and its read traffic; the default
        # TPU f32 dot already runs at bf16 precision, so accuracy is
        # unchanged unless Precision.HIGHEST is requested.  Cast on the
        # host (ml_dtypes) so only half the bytes cross to the device.
        blocks = blocks.astype(np.dtype(block_dtype))
    blocks_j = jnp.asarray(blocks)
    return HybridFormat(
        blocks_j, jnp.asarray(btab.astype(np.int32)),
        jnp.asarray(ctab.astype(np.int32)), ell, M, N, B, dense_nnz,
        btab_t=jnp.asarray(btab_t.astype(np.int32)),
        ctab_t=jnp.asarray(ctab_t.astype(np.int32)),
        ell_t=ell_t, rest_ids=rest_ids,
    )


def _align_to_blocks(row, col, partptr, B):
    """Renumber nodes so every partition starts on a block boundary.

    Keeps the within-part order (so sortedness is preserved: the map is
    strictly increasing) and pads each part to a multiple of B — dense
    communities then fill whole blocks instead of straddling two,
    roughly halving the dense-block count on METIS layouts.
    Returns (row', col', M_pad, row_map)."""
    pp = np.asarray(partptr, np.int64)
    sizes = np.diff(pp)
    padded = -(-sizes // B) * B
    new_starts = np.concatenate([[0], np.cumsum(padded)])
    M_pad = int(new_starts[-1])
    # node -> padded position (vectorized over parts)
    part_of = np.repeat(np.arange(sizes.size), sizes)
    offset_in_part = np.arange(pp[-1]) - np.repeat(pp[:-1], sizes)
    row_map = new_starts[part_of] + offset_in_part
    return row_map[row], row_map[col], M_pad, row_map


def _rest_vals(h: HybridFormat, value):
    """Remainder edge values: live ``value`` slice if given, else the
    values baked at build time."""
    ell, baked = h.ell
    if value is None:
        return ell, baked
    return ell, jnp.take(value, h.rest_ids, axis=0)


def _inner(h: HybridFormat) -> HybridFormat:
    """The padded-space view of a block-aligned format."""
    return HybridFormat(
        h.blocks, h.btab, h.ctab, h.ell, h.M_pad, h.M_pad, h.B,
        h.dense_nnz, btab_t=h.btab_t, ctab_t=h.ctab_t, ell_t=h.ell_t,
        rest_ids=h.rest_ids,
    )


def hybrid_spmm(h: HybridFormat, x: jnp.ndarray,
                precision=None, value=None) -> jnp.ndarray:
    """``out = A @ x`` through the hybrid format; (N, K) -> (M, K).

    ``precision``: a ``jax.lax.Precision`` for the block matmuls.  This
    XLA build runs f32 dots at bf16 precision by default — fine for GNN
    propagation (relative error ~0.4% on deg-500 rows), pass
    ``jax.lax.Precision.HIGHEST`` for full fp32 accumulation.

    ``value``: optional live edge-value vector driving the ELL
    remainder; MUST equal the build-time values (the dense blocks bake
    them) — the storage cache layer guarantees this.
    """
    if h.row_map is not None:
        # Block-aligned layout: scatter x into padded positions, run,
        # gather back (row-granular ops, no per-edge scatters).
        xp = jnp.zeros((h.M_pad, x.shape[1]), x.dtype).at[h.row_map].set(x)
        return hybrid_spmm(_inner(h), xp, precision, value)[h.row_map]

    B, M, N = h.B, h.M, h.N
    K = x.shape[1]
    C = -(-N // B)
    pad = C * B - N
    xb = jnp.concatenate(
        [x, jnp.zeros((pad, K), x.dtype)]) if pad else x
    xb = xb.reshape(C, B, K)
    # zero X block for sentinel ctab entries
    xb = jnp.concatenate([xb, jnp.zeros((1, B, K), x.dtype)])

    R, W = h.btab.shape
    # Half-precision inputs accumulate through f32 internally — the
    # library-wide SpMM contract (ell_spmm does the same); output keeps
    # x.dtype.
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)

    def step(w, acc):
        ab = jnp.take(h.blocks, h.btab[:, w], axis=0)   # (R, B, B)
        vb = jnp.take(xb, h.ctab[:, w], axis=0)         # (R, B, K)
        return acc + jnp.einsum(
            "rbc,rck->rbk", ab.astype(acc_dtype), vb.astype(acc_dtype),
            precision=precision,
        )

    # Sequential over slots: each step's (R, B, B) block gather is a
    # ~GB-scale temp at large M — unrolling keeps W of them alive and
    # OOMs; the loop reuses one.
    out = jax.lax.fori_loop(
        0, W, step, jnp.zeros((R, B, K), acc_dtype),
    )
    out = out.reshape(R * B, K)[:M].astype(x.dtype)

    if h.ell is not None:
        ell, vals = _rest_vals(h, value)
        out = out + ell_spmm(ell, vals, x)
    return out


def hybrid_spmm_t(h: HybridFormat, g: jnp.ndarray,
                  precision=None, value=None) -> jnp.ndarray:
    """``out = A^T @ g`` through the transpose tables; (M, K) -> (N, K).

    Backs ``grad_mat`` of the differentiable hybrid SpMM (reference
    obtains the same transpose via the cached csr2csc permutation,
    ``csrc/spmm.cpp:100-108``)."""
    if h.row_map is not None:
        gp = jnp.zeros((h.M_pad, g.shape[1]), g.dtype).at[h.row_map].set(g)
        return hybrid_spmm_t(_inner(h), gp, precision, value)[h.row_map]

    B, M, N = h.B, h.M, h.N
    K = g.shape[1]
    R = -(-M // B)
    pad = R * B - M
    gb = jnp.concatenate(
        [g, jnp.zeros((pad, K), g.dtype)]) if pad else g
    gb = gb.reshape(R, B, K)
    gb = jnp.concatenate([gb, jnp.zeros((1, B, K), g.dtype)])

    C, Wt = h.btab_t.shape
    acc_dtype = jnp.promote_types(g.dtype, jnp.float32)

    def step(w, acc):
        ab = jnp.take(h.blocks, h.btab_t[:, w], axis=0)  # (C, B, B)
        vb = jnp.take(gb, h.ctab_t[:, w], axis=0)        # (C, B, K)
        # blocks[slot]^T @ grad_rowblock: contract the BLOCK-ROW dim.
        return acc + jnp.einsum(
            "rbc,rbk->rck", ab.astype(acc_dtype), vb.astype(acc_dtype),
            precision=precision,
        )

    out = jax.lax.fori_loop(
        0, Wt, step, jnp.zeros((C, B, K), acc_dtype),
    )
    out = out.reshape(C * B, K)[:N].astype(g.dtype)

    if h.ell_t is not None:
        _, vals = _rest_vals(h, value)
        out = out + ell_spmm(h.ell_t, vals, g)
    return out


def build_hybrid_from_tensor(A, B: int = 1024,
                             min_density: Optional[float] = None,
                             K_hint: int = 128,
                             block_dtype=None,
                             partptr=None) -> HybridFormat:
    """Build the hybrid view from a SparseTensor's host views.

    METIS-order the tensor first (``A.partition(k)``) so communities
    land in dense blocks; on a Reddit-density community graph this puts
    ~80% of edges onto the MXU for a ~4x SpMM speedup (BASELINE.md).
    Pass the ``partptr`` from ``partition()`` to block-align the
    layout: each part then starts on a block boundary, so communities
    fill whole blocks instead of straddling two (fewer, denser blocks;
    ``hybrid_spmm`` maps x/out through the padding transparently).
    """
    value = A.storage.value()
    row = A.storage.numpy_view("row")
    col = A.storage.numpy_view("col")
    val = None if value is None else np.asarray(value)
    if partptr is None:
        return build_hybrid(
            row, col, val, A.sparse_size(0), A.sparse_size(1), B=B,
            min_density=min_density, K_hint=K_hint,
            block_dtype=block_dtype,
        )
    assert A.sparse_size(0) == A.sparse_size(1), (
        "block alignment assumes a square (symmetric-layout) matrix"
    )
    row2, col2, M_pad, row_map = _align_to_blocks(row, col, partptr, B)
    h = build_hybrid(row2, col2, val, M_pad, M_pad, B=B,
                     min_density=min_density, K_hint=K_hint,
                     block_dtype=block_dtype)
    h.row_map = jnp.asarray(row_map.astype(np.int32))
    h.M_pad = M_pad
    return h
