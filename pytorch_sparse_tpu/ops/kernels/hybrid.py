"""Hybrid block-dense + ELL SpMM: route dense regions onto the MXU.

TPU measurement (BASELINE.md): a K-wide row gather reads one 512 B HBM
row per nnz with no cache behind it, so the gather/ELL path is stuck at
~600 B/nnz regardless of ordering.  On community graphs (Reddit-like,
avg degree hundreds), a METIS-ordered adjacency concentrates most edges
in a few percent-dense diagonal-ish blocks; storing those blocks DENSE
converts their SpMM into batched (B, B) @ (B, K) MXU matmuls whose HBM
traffic is one block read per (row-block, col-block) pair instead of
one 512 B row per nnz.

Densify break-even per block (MEASURED-rate form, VERDICT r2 item 1b):
a dense block costs its HBM read (``B*B*elem`` at ~819 GB/s) plus the
batched-matmul temporaries (~2x the X-block bytes) plus its MXU time,
~2.8 us at B=512/f32/K=128; the scatter-free ELL path moves one edge
per ~2.9 ns (344 Mnnz/s measured at arxiv scale — and slower at larger
M, so this threshold is conservative).  Densifying pays above
``t_block / t_ell_edge`` edges per block — ~0.36% density at B=512,
about half the traffic-only theoretical 1/(K+3) the earlier rounds
used.  ``ops.kernels.hybrid.block_break_even`` computes it.

Format (a registered pytree, built eagerly host-side like the ELL
views) — the dense part is a SLOT LIST over occupied above-threshold
blocks only:

* ``blocks``   (nb+1, B, B) dense block values in (row-block,
  col-block) lexicographic order; slot nb is an all-zero block used
  only as chunk padding.
* ``slot_row`` (nb_pad,) int32 row-block of each slot (sorted;
  padding = R, dropped by the segment-sum).
* ``slot_col`` (nb_pad,) int32 col-block of each slot (padding = 0,
  harmless: it multiplies the zero block).
* ``order_t``  (nb,) int32 slot permutation sorted by col-block — the
  transpose schedule backing ``hybrid_spmm_t`` (grad_mat = A^T @ grad,
  reference ``csrc/spmm.cpp:100-108``).
* ``ell`` / ``ell_t`` / ``rest_ids`` — the sub-threshold remainder as
  in the ELL path (live ``value`` vectors drive it via ``rest_ids``).

Forward (``hybrid_spmm``)::

    tmp[s] = blocks[s] @ xb[slot_col[s]]          # ONE batched matmul
    outb   = segment_sum(tmp, slot_row, R)        # sorted, R segments
    out    = outb.reshape(R*B, K)[:M] + ell_spmm(remainder)

versus the round-2 formulation, which looped a (R, W) padded slot table
whose sentinel entries GATHERED the zero block (real HBM traffic) and
materialized an (R, B, B) block gather per step — the slot list visits
each occupied block exactly once and reads ``blocks`` contiguously.
Probe: ``benchmarks/probe_hybrid_forms.py``.

Block-dot precision: TPU MXUs multiply in bf16; an f32 "HIGHEST" dot
costs 6 passes.  The block matmuls default to ``Precision.HIGH``
(bf16x3: f32-equivalent products at 3 passes — measured ~5e-6 relative
error vs ~2e-3 for the 1-pass ``DEFAULT`` on Reddit-density rows)
independent of the global ``jax_default_matmul_precision``; override
per call or with :func:`set_block_precision`.  HIGH/HIGHEST on the
batched block dots are implemented MANUALLY as 3/6 bf16-component MXU
products (``_mxu_einsum``): XLA's own HIGH/HIGHEST lowering of a
batched dot is a measured ~100x pathology on v5e, and chunks run under
one ``lax.scan`` body because the unrolled multi-chunk graph is a
further measured 8x pathology (probe_blockpass*.out, round 3).

``DenseFormat``: when the WHOLE matrix clears the densify threshold
(e.g. Reddit-10%: 2.1% dense) and fits the HBM budget, the same logic
degenerates to one (M, N) dense matmul — no tables, no segment-sum.
The storage auto-router builds it in that regime.

Gradients: the dense blocks bake the build-time values, so the
differentiable wrapper (``ops/matmul.py:_hybrid_spmm_sum``) requires
the ``value`` argument to equal the values the format was built from
(the ``SparseStorage`` cache guarantees this: ``set_value`` invalidates
the hybrid view).  ``grad_mat = A^T @ grad`` runs through ``order_t``
on the MXU, and ``grad_value[e] = <mat[col_e], grad[row_e]>`` is exact
for every edge independent of the baked blocks (the output is linear in
value).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ell import EllFormat, bake_values, build_ell, ell_spmm
from ...utils.host_sort import lexsort2, stable_argsort


# ----------------------------------------------------------------------
# Block-dot precision knob (VERDICT r2 item 1a).
# ----------------------------------------------------------------------

_BLOCK_PRECISION = jax.lax.Precision.HIGH


def set_block_precision(precision) -> None:
    """Set the default ``jax.lax.Precision`` of the hybrid/dense block
    matmuls.  Library default: ``HIGH`` (bf16x3 — each f32 operand is
    split into three bf16 terms, giving f32-equivalent products at 3
    MXU passes; measured rel err ~1e-6 on Reddit-density rows vs 2e-3
    for the 1-pass ``DEFAULT``, at a fraction of ``HIGHEST``'s 6
    passes — and the dense-route matmul stays HBM-bound anyway).  Pass
    ``DEFAULT`` for maximum MXU throughput when ~0.2% relative error is
    acceptable, or ``HIGHEST`` for bf16x6 (~1e-7 rel err, near-exact
    f32)."""
    global _BLOCK_PRECISION
    _BLOCK_PRECISION = precision


def get_block_precision():
    return _BLOCK_PRECISION


def _prec(precision):
    return _BLOCK_PRECISION if precision is None else precision


# ----------------------------------------------------------------------
# Block/dense STORE dtype rule (VERDICT r3 item 3).
#
# A bf16 store halves the HBM read of the MXU routes — the dense-route
# matmul is read-bound, so that is a measured ~2x — but unlike the
# bf16x3 COMPUTE decomposition it loses information at rest: once the
# stored values are rounded, no compute precision recovers them.  The
# router therefore picks the store dtype from the MEASURED quantization
# error of the actual values (``quantization_rel_err``): bf16 when the
# values round-trip exactly (unweighted graphs, integer counts — the
# common GNN adjacency case) or when the error fits the user-declared
# budget.  The f32 operand's own rounding is kept OUT of the product by
# the k-concat split (``_bf16_store_matmul``): both bf16 components of
# x ride one widened matmul, so the store is still read once.
# ----------------------------------------------------------------------

_STORE_BUDGET = 0.0


def set_store_budget(rel_err: float) -> None:
    """Declare the acceptable relative output error from storing dense
    blocks in bf16.  Default 0.0: bf16 stores are chosen only when the
    values quantize LOSSLESSLY (e.g. implicit-ones adjacency).  A
    training loop that tolerates ~1e-3 (GNN aggregation does) can set
    2e-3 and halve the dense-route HBM read."""
    global _STORE_BUDGET
    _STORE_BUDGET = float(rel_err)


def get_store_budget() -> float:
    return _STORE_BUDGET


def quantization_rel_err(values: Optional[np.ndarray]) -> float:
    """RMS relative error of storing ``values`` in bf16 (host-side).
    ``None`` (implicit ones) is exact.  This is the measured rule behind
    the router's store-dtype choice: the SpMM output's relative error is
    bounded by (and empirically tracks) this value."""
    if values is None:
        return 0.0
    v = np.asarray(values)
    if v.dtype.kind != "f" or v.size == 0:
        return 0.0
    import ml_dtypes

    d = v.astype(np.float32) - v.astype(ml_dtypes.bfloat16).astype(
        np.float32
    )
    denom = float(np.sqrt(np.mean(np.square(v, dtype=np.float64))))
    if denom == 0.0:
        return 0.0
    return float(np.sqrt(np.mean(np.square(d, dtype=np.float64)))) / denom


# Measured constants behind the break-even (v5e, BASELINE.md).
_HBM_BW = 819e9          # bytes/s
_MXU_BF16 = 197e12       # flops/s (bf16 multiply, f32 accumulate)
_ELL_NS_PER_NNZ = 2.9    # measured scatter-free edge cost at arxiv scale


def block_break_even(B: int, K_hint: int = 128, elem: int = 4,
                     passes: float = 3.0) -> float:
    """Minimum block density at which densifying beats the ELL path,
    from MEASURED rates: block cost = block traffic + ~2x X-block
    temporaries + MXU time; edge cost = measured ELL ns/nnz.

    ``passes`` prices the HBM traffic of the precision mode: an f32
    store at the library-default ``HIGH`` moves ~3x everything (the
    bf16x3 decomposition writes split copies of the blocks AND runs
    the temporaries three times — measured round 4: ~9.7 us/block at
    (B=512, K=128) vs the traffic-only model's 1.4 us, and marginal
    ~0.8%-dense blocks the old model said to densify ran 2x SLOWER
    than ELL at arxiv-community scale).  A bf16 store at HIGH runs ONE
    k-concat einsum over half the bytes (passes ~1)."""
    t_block = (
        passes * (B * B * elem + 3 * B * K_hint * 4) / _HBM_BW
        + 2.0 * B * B * K_hint / _MXU_BF16
    )
    # Per-edge gather cost scales WEAKLY with K (the gather is issue-
    # bound, not byte-bound): measured 4.73 ns at K=128 vs 7.10 ns at
    # K=256 on the full-Reddit remainder table (BASELINE round 4, 2x
    # bytes at 1.3-1.5x time).  Linear interp anchored at the K=128
    # measurement; K=128 reproduces _ELL_NS_PER_NNZ exactly, so all
    # previously calibrated routes are unchanged.
    ell_ns = _ELL_NS_PER_NNZ * (0.7 + 0.3 * K_hint / 128.0)
    edges = t_block / (ell_ns * 1e-9)
    return min(edges / (B * B), 1.0)


# Bounds on the per-chunk batched-matmul operands.  Both matter, and
# both are MEASURED cliffs on v5e (benchmarks: probe_blockpass*.out,
# round 3): a chunk whose (c, B, B) block slice reaches 2^31 bytes runs
# ~90x slower (536 MB @ c=1024/B=512/f32 is fine, 2.1 GB @ c=2048 is
# not), and the (c, B, K) temporaries bound peak HBM.
_CHUNK_BYTES = 512 << 20          # (c, B, K) temporaries
_BLOCK_SLICE_BYTES = 1 << 30      # (c, B, B) operand slice


def _slot_chunk(B: int, K: int, elem: int = 4) -> int:
    return max(
        1,
        min(_CHUNK_BYTES // max(B * K * elem, 1),
            _BLOCK_SLICE_BYTES // max(B * B * elem, 1)),
    )


def _chunk_geom(nb: int, B: int, K: int, elem: int) -> Tuple[int, int]:
    """(n_chunks, chunk_len) with even chunks: padding waste is bounded
    by one chunk row, and every scan step runs the same shapes."""
    ch_max = _slot_chunk(B, K, elem)
    n = -(-nb // ch_max)
    ch = -(-nb // n)
    return n, ch


def _chunk_stack(ids, n: int, ch: int, fill) -> jnp.ndarray:
    """Pad a (nb,) index vector with ``fill`` sentinels and reshape to
    the (n, ch) scan stack."""
    pad = n * ch - ids.shape[0]
    if pad:
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), fill, ids.dtype)]
        )
    return ids.reshape(n, ch)


class HybridFormat:
    def __init__(self, blocks, slot_row, slot_col, order_t,
                 ell: Optional[Tuple[EllFormat, Any]],
                 M: int, N: int, B: int, dense_nnz: int,
                 row_map=None, M_pad: int = 0,
                 ell_t=None, rest_ids=None,
                 rest_baked=None, rest_baked_t=None):
        self.blocks = blocks
        self.slot_row = slot_row
        self.slot_col = slot_col
        self.order_t = order_t
        self.ell = ell
        self.M, self.N, self.B = M, N, B
        self.dense_nnz = dense_nnz
        # Block-aligned layouts: node i lives at padded position
        # row_map[i] (each partition starts on a block boundary); the
        # internal matrices are (M_pad, M_pad) and hybrid_spmm
        # scatters/gathers x/out through the map.
        self.row_map = row_map
        self.M_pad = M_pad
        self.ell_t = ell_t
        self.rest_ids = rest_ids
        # Slot-layout baked value tables of the remainder (fwd + ^T).
        self.rest_baked = rest_baked
        self.rest_baked_t = rest_baked_t

    @property
    def nb(self) -> int:
        return int(self.order_t.shape[0])

    def __repr__(self) -> str:
        return (
            f"HybridFormat(M={self.M}, N={self.N}, B={self.B}, "
            f"blocks={self.nb}, dense_nnz={self.dense_nnz})"
        )


def _hyb_flatten(h: HybridFormat):
    return ((h.blocks, h.slot_row, h.slot_col, h.order_t, h.ell,
             h.row_map, h.ell_t, h.rest_ids, h.rest_baked,
             h.rest_baked_t),
            (h.M, h.N, h.B, h.dense_nnz, h.M_pad))


def _hyb_unflatten(aux, children):
    (blocks, slot_row, slot_col, order_t, ell, row_map, ell_t,
     rest_ids, rest_baked, rest_baked_t) = children
    M, N, B, dense_nnz, M_pad = aux
    return HybridFormat(blocks, slot_row, slot_col, order_t, ell, M, N,
                        B, dense_nnz, row_map, M_pad, ell_t, rest_ids,
                        rest_baked, rest_baked_t)


jax.tree_util.register_pytree_node(HybridFormat, _hyb_flatten,
                                   _hyb_unflatten)


class DenseFormat:
    """Whole-matrix dense store: the degenerate hybrid for matrices
    whose OVERALL density clears the densify break-even (one MXU matmul
    instead of block tables)."""

    def __init__(self, dense, M: int, N: int):
        self.dense = dense
        self.M, self.N = M, N

    def __repr__(self) -> str:
        return f"DenseFormat(M={self.M}, N={self.N}, dtype={self.dense.dtype})"


jax.tree_util.register_pytree_node(
    DenseFormat,
    lambda d: ((d.dense,), (d.M, d.N)),
    lambda aux, ch: DenseFormat(ch[0], aux[0], aux[1]),
)


def build_dense(row: np.ndarray, col: np.ndarray,
                value: Optional[np.ndarray], M: int, N: int,
                dtype=None) -> DenseFormat:
    """Materialize the full dense matrix host-side (duplicate edges
    accumulate, matching SpMM-sum semantics on uncoalesced input)."""
    dt = np.float32 if dtype is None else np.dtype(dtype)
    acc_dt = np.float64 if dt == np.float64 else np.float32
    dense = np.zeros((M, N), acc_dt)
    v = np.ones(row.shape[0], acc_dt) if value is None else (
        np.asarray(value).astype(acc_dt)
    )
    # sort+reduceat (see build_hybrid): np.add.at costs ~7 s/M edges.
    flat = np.asarray(row, np.int64) * N + np.asarray(col, np.int64)
    if flat.size:
        order = np.argsort(flat, kind="stable")
        fs, vs = flat[order], v[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(fs)) + 1])
        dense.reshape(-1)[fs[starts]] = np.add.reduceat(vs, starts)
    return DenseFormat(jnp.asarray(dense.astype(dt)), M, N)


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
        min_density = block_break_even(B, K_hint)
    C = -(-N // B)
    bkey = (row // B) * C + col // B
    _, counts = np.unique(bkey, return_counts=True)
    thresh = max(int(min_density * B * B), 1)
    dense = counts[counts >= thresh]
    return float(dense.sum()) / row.size, int(dense.size)


def build_hybrid(
    row: np.ndarray, col: np.ndarray, value: Optional[np.ndarray],
    M: int, N: int, B: int = 512,
    min_density: Optional[float] = None, K_hint: int = 128,
    block_dtype=None,
) -> HybridFormat:
    """Split edges into dense (B, B) blocks vs an ELL remainder.

    Host-side, eager (like the ELL build).  ``min_density`` defaults to
    the measured-rate break-even for ``K_hint``-wide features
    (:func:`block_break_even`).
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
        min_density = block_break_even(B, K_hint)

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

    # --- dense part: slot list over above-threshold blocks
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
        # sort+reduceat instead of np.add.at: the elementwise scatter
        # measured ~7 s per 1M edges on this host (np.add.at has no
        # vectorized fast path); the sort formulation is O(E log E)
        # with O(E) memory and ~20x faster at products/Reddit scales.
        flat = ((occ_slot[inv_key[dsel]] * B + row[dsel] % B) * B
                + col[dsel] % B)
        vs = val[dsel].astype(blk_dt)
        order = np.argsort(flat, kind="stable")
        fs, vs = flat[order], vs[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(fs)) + 1])
        blocks.reshape(-1)[fs[starts]] = np.add.reduceat(vs, starts)
    slot_row = dense_keys // C          # sorted (keys are row-major)
    slot_col = dense_keys % C
    order_t = stable_argsort(slot_col)  # transpose schedule

    # --- ELL remainder (forward + transpose views; edge ids are
    # positions in the remainder's row-sorted order, rest_ids maps them
    # back to original edge ids).
    rest = np.flatnonzero(~dense_sel)
    ell = None
    ell_t = None
    rest_ids = None
    rest_baked = None
    rest_baked_t = None
    if rest.size:
        order = stable_argsort(row[rest])
        rr = rest[order]
        rows_r, cols_r = row[rr], col[rr]
        rptr = np.searchsorted(rows_r, np.arange(M + 1))
        ell_obj = build_ell(rptr, cols_r, None, M)
        # Slot-layout baked values for forward + transpose (the live
        # ``value`` must equal the build values anyway — the dense
        # blocks bake them — so the remainder always reads these
        # contiguous tables instead of gathering at 4 B granule).
        rest_baked = bake_values(ell_obj, val[rr])
        ell = (ell_obj, jnp.asarray(val[rr]))
        csc_perm = lexsort2(cols_r, rows_r)
        cptr = np.searchsorted(cols_r[csc_perm], np.arange(N + 1))
        ell_t = build_ell(cptr, rows_r[csc_perm], csc_perm, N)
        rest_baked_t = bake_values(ell_t, val[rr])
        rest_ids = jnp.asarray(rr.astype(np.int32 if E < 2**31
                                         else np.int64))

    if block_dtype is not None:
        # bf16 halves the block store and its read traffic; the block
        # dots already multiply in bf16 at the DEFAULT precision, so
        # accuracy changes little.  Cast on the host (ml_dtypes) so only
        # half the bytes cross to the device.
        blocks = blocks.astype(np.dtype(block_dtype))
    return HybridFormat(
        jnp.asarray(blocks),
        jnp.asarray(slot_row.astype(np.int32)),
        jnp.asarray(slot_col.astype(np.int32)),
        jnp.asarray(order_t.astype(np.int32)),
        ell, M, N, B, dense_nnz,
        ell_t=ell_t, rest_ids=rest_ids,
        rest_baked=rest_baked, rest_baked_t=rest_baked_t,
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
        h.blocks, h.slot_row, h.slot_col, h.order_t, h.ell,
        h.M_pad, h.M_pad, h.B, h.dense_nnz, ell_t=h.ell_t,
        rest_ids=h.rest_ids, rest_baked=h.rest_baked,
        rest_baked_t=h.rest_baked_t,
    )


def _scan_block_pass(blocks, bid, seg, src, xb, nseg, B, K, eq,
                     acc_dtype, precision):
    """Shared scan skeleton of the forward and transpose block passes.

    ``bid``/``seg``/``src`` are (n, ch) sentinel-padded chunk stacks:
    per step, gather the chunk's blocks and dense row-blocks, run one
    batched MXU matmul, and segment-sum into the ``nseg`` output blocks.
    Sentinels do no harm by construction: block id ``nb`` is the
    all-zero block, segment id ``nseg`` is dropped by the scatter, and
    source id 0 multiplies the zero block.

    A ``lax.scan`` (ONE compiled body) instead of an unrolled python
    loop is a measured 8x on v5e at full-Reddit scale: XLA schedules
    the unrolled multi-chunk graph pathologically (196 ms vs 23 ms for
    5 chunks of the same shapes, probe_blockpass3)."""

    def body(carry, t):
        b, s, c = t
        ab = jnp.take(blocks, b, axis=0)          # (ch, B, B)
        vb = jnp.take(xb, c, axis=0)              # (ch, B, K)
        tmp = _mxu_einsum(eq, acc_dtype, precision, ab, vb)
        return carry + jax.ops.segment_sum(
            tmp, s, num_segments=nseg, indices_are_sorted=True,
        ), None

    out0 = jnp.zeros((nseg, B, K), acc_dtype)
    # Inherit the operand's varying-manual-axes: under shard_map a
    # plain-zeros carry is unvarying while the body output varies over
    # the mesh axis, and scan rejects the mismatch.  The scalar add
    # fuses to nothing outside shard_map.
    out0 = out0 + (xb.reshape(-1)[0] * 0).astype(acc_dtype)
    out, _ = jax.lax.scan(body, out0, (bid, seg, src))
    return out


def _block_pass(blocks, slot_row, slot_col, xb, R, B, K, acc_dtype,
                precision):
    """Forward dense-block pass: ``tmp[s] = blocks[s] @ xb[slot_col[s]]``
    segment-summed into ``R`` output row blocks keyed by ``slot_row``
    (sorted by construction).  ``blocks`` includes the trailing all-zero
    block (id ``nb``) used as chunk padding."""
    nb = slot_col.shape[0]
    if nb == 0:
        return jnp.zeros((R, B, K), acc_dtype)
    n, ch = _chunk_geom(nb, B, K, jnp.dtype(acc_dtype).itemsize)
    bid = _chunk_stack(jnp.arange(nb, dtype=jnp.int32), n, ch, nb)
    seg = _chunk_stack(slot_row, n, ch, R)
    src = _chunk_stack(slot_col, n, ch, 0)
    return _scan_block_pass(blocks, bid, seg, src, xb, R, B, K,
                            "sbc,sck->sbk", acc_dtype, precision)


def _split_bf16(x, parts: int):
    """Split an f32 array into ``parts`` bf16 components summing to ~x
    (hi, then successive residuals).  The manual form of XLA's
    bf16x3/bf16x6 Precision.HIGH/HIGHEST decompositions.

    The bf16-rounded head is extracted with ``lax.reduce_precision``,
    NOT ``astype(bf16).astype(f32)``: XLA:TPU's bf16-propagation pass
    rewrites the naive form's residual subtraction to compute in bf16,
    making every residual identically zero and silently collapsing the
    decomposition to a 1-pass product (measured: rel err 2.4e-3 == the
    DEFAULT pass, vs 5.1e-6 with reduce_precision; probe_split_acc2).
    ``x - reduce_precision(x)`` is exact in f32, and the bf16 casts of
    head/residual are exact by construction."""
    comps = []
    r = x
    for _ in range(parts - 1):
        c_f = jax.lax.reduce_precision(r, exponent_bits=8,
                                       mantissa_bits=7)
        comps.append(c_f.astype(jnp.bfloat16))
        r = r - c_f
    comps.append(r.astype(jnp.bfloat16))
    return comps


def _mxu_einsum_impl(eq, ab, vb, acc_dtype, precision):
    """Batched block matmul with f32 (or f64) accumulation.

    Half-precision block stores feed the MXU NATIVELY (casting the
    small X/grad batch down instead of materializing an upcast copy of
    the multi-GB block store).

    f32 operands at HIGH/HIGHEST decompose MANUALLY into bf16-component
    products (3 resp. 6 native MXU passes, dropping the same
    small-by-small terms XLA's bf16x3/bf16x6 drop — measured rel err
    ~5e-6 / ~1e-7).  XLA's own HIGH/HIGHEST lowering of a *batched* dot
    is catastrophic on this platform (measured ~100x: 332 ms vs 3.1 ms
    at (1024, 512, 512) @ (1024, 512, 128), probe_blockpass.out) while
    the manual decomposition runs at the expected multiple of the
    DEFAULT pass; plain (unbatched) dots are unaffected and keep using
    the requested precision (``dense_spmm``)."""
    if ab.dtype in (jnp.bfloat16, jnp.float16):
        if isinstance(precision, tuple):
            precision = precision[0]
        parts = {jax.lax.Precision.HIGH: 2,
                 jax.lax.Precision.HIGHEST: 3}.get(precision, 1)
        lhs, out_spec = eq.split("->")
        rhs = lhs.split(",")[1]
        # k-concat split: when the second operand's trailing axis is
        # FREE (not contracted), its bf16 components ride ONE widened
        # matmul — the multi-GB store is read once, and the f32
        # operand's rounding drops out of the product (the store's own
        # quantization is then the only error source).
        if (parts > 1 and rhs[-1] == out_spec[-1]
                and ab.dtype == jnp.bfloat16
                and vb.dtype == jnp.float32):
            k = vb.shape[-1]
            vcat = jnp.concatenate(_split_bf16(vb, parts), axis=-1)
            o = jnp.einsum(eq, ab, vcat,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=acc_dtype)
            out = o[..., :k]
            for i in range(1, parts):
                out = out + o[..., i * k:(i + 1) * k]
            return out
        vb = vb.astype(ab.dtype)
        return jnp.einsum(eq, ab, vb,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=acc_dtype)
    if jnp.dtype(ab.dtype) == jnp.float64 or (
        jnp.dtype(acc_dtype) == jnp.float64
    ):
        return jnp.einsum(eq, ab.astype(acc_dtype), vb.astype(acc_dtype),
                          precision=precision,
                          preferred_element_type=acc_dtype)
    if isinstance(precision, tuple):
        precision = precision[0]
    parts = {jax.lax.Precision.HIGH: 2,
             jax.lax.Precision.HIGHEST: 3}.get(precision, 0)
    ab = ab.astype(acc_dtype)
    vb = vb.astype(acc_dtype)
    if not parts:
        return jnp.einsum(eq, ab, vb,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=acc_dtype)
    a_c = _split_bf16(ab, parts)
    v_c = _split_bf16(vb, parts)
    out = None
    for i in range(parts):
        for j in range(parts):
            if i + j >= parts:
                continue
            term = jnp.einsum(eq, a_c[i], v_c[j],
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=acc_dtype)
            out = term if out is None else out + term
    return out


# Gradient einsums of the two block-pass contractions (derived from the
# index algebra; each is itself one of the batched forms _mxu_einsum_impl
# handles).  Entry: eq -> ((da_eq, da_operands), (dv_eq, dv_operands)).
_GRAD_EQS = {
    # out[s,b,k] = sum_c a[s,b,c] v[s,c,k]
    "sbc,sck->sbk": ("sbk,sck->sbc", "sbc,sbk->sck"),
    # out[s,c,k] = sum_b a[s,b,c] v[s,b,k]
    "sbc,sbk->sck": ("sck,sbk->sbc", "sbc,sck->sbk"),
}


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mxu_einsum(eq, acc_dtype, precision, ab, vb):
    """Differentiable wrapper of :func:`_mxu_einsum_impl`.

    Raw AD through the manual bf16-component split rounds the
    COTANGENTS to bf16 (each component's cotangent takes the primal
    component's dtype), silently degrading gradients to 1-pass
    accuracy (~2e-3 rel, measured).  The custom VJP computes both
    gradient contractions through the same full-accuracy decomposition
    as the forward."""
    return _mxu_einsum_impl(eq, ab, vb, acc_dtype, precision)


def _mxu_einsum_fwd(eq, acc_dtype, precision, ab, vb):
    return _mxu_einsum_impl(eq, ab, vb, acc_dtype, precision), (ab, vb)


def _mxu_einsum_bwd(eq, acc_dtype, precision, res, g):
    ab, vb = res
    da_eq, dv_eq = _GRAD_EQS[eq]
    g = g.astype(acc_dtype)
    d_ab = _mxu_einsum_impl(da_eq, g, vb.astype(acc_dtype), acc_dtype,
                            precision).astype(ab.dtype)
    d_vb = _mxu_einsum_impl(dv_eq, ab, g, acc_dtype,
                            precision).astype(vb.dtype)
    return d_ab, d_vb


_mxu_einsum.defvjp(_mxu_einsum_fwd, _mxu_einsum_bwd)


def hybrid_spmm(h, x: jnp.ndarray, precision=None,
                value=None) -> jnp.ndarray:
    """``out = A @ x`` through the hybrid format; (N, K) -> (M, K).

    ``precision``: ``jax.lax.Precision`` for the block matmuls; ``None``
    uses the module default (:func:`set_block_precision`, initially
    ``HIGH`` = bf16x3, f32-equivalent products).

    ``value``: optional live edge-value vector driving the ELL
    remainder; MUST equal the build-time values (the dense blocks bake
    them) — the storage cache layer guarantees this.
    """
    if isinstance(h, DenseFormat):
        return dense_spmm(h, x, precision)
    precision = _prec(precision)
    if h.row_map is not None:
        # Block-aligned layout: scatter x into padded positions, run,
        # gather back (row-granular ops, no per-edge scatters).
        xp = jnp.zeros((h.M_pad, x.shape[1]), x.dtype).at[h.row_map].set(x)
        return hybrid_spmm(_inner(h), xp, precision, value)[h.row_map]

    B, M, N = h.B, h.M, h.N
    K = x.shape[1]
    R = -(-M // B)
    C = -(-N // B)
    nb = h.nb
    # Half-precision inputs accumulate through f32 internally — the
    # library-wide SpMM contract (ell_spmm does the same); output keeps
    # x.dtype.
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)

    pad = C * B - N
    xb = jnp.concatenate([x, jnp.zeros((pad, K), x.dtype)]) if pad else x
    xb = xb.reshape(C, B, K)

    out = _block_pass(
        h.blocks, h.slot_row, h.slot_col, xb, R, B, K, acc_dtype,
        precision,
    )
    out = out.reshape(R * B, K)[:M].astype(x.dtype)

    if h.ell is not None:
        # The live ``value`` must equal the build values (the dense
        # blocks bake them), so the remainder always reads the baked
        # slot tables — no per-slot value gather.
        if h.rest_baked is not None:
            out = out + ell_spmm(h.ell[0], None, x, baked=h.rest_baked)
        else:
            ell, vals = _rest_vals(h, value)
            out = out + ell_spmm(ell, vals, x)
    return out


def hybrid_spmm_t(h, g: jnp.ndarray, precision=None,
                  value=None) -> jnp.ndarray:
    """``out = A^T @ g`` through the transpose slot order; (M, K) ->
    (N, K).  Backs ``grad_mat`` of the differentiable hybrid SpMM
    (reference obtains the same transpose via the cached csr2csc
    permutation, ``csrc/spmm.cpp:100-108``)."""
    if isinstance(h, DenseFormat):
        return dense_spmm_t(h, g, precision)
    precision = _prec(precision)
    if h.row_map is not None:
        gp = jnp.zeros((h.M_pad, g.shape[1]), g.dtype).at[h.row_map].set(g)
        return hybrid_spmm_t(_inner(h), gp, precision, value)[h.row_map]

    B, M, N = h.B, h.M, h.N
    K = g.shape[1]
    R = -(-M // B)
    C = -(-N // B)
    nb = h.nb
    acc_dtype = jnp.promote_types(g.dtype, jnp.float32)

    pad = R * B - M
    gb = jnp.concatenate([g, jnp.zeros((pad, K), g.dtype)]) if pad else g
    gb = gb.reshape(R, B, K)

    # Transpose schedule: visit slots in col-block order; segment ids
    # (slot_col[order_t]) are sorted by construction.  Same scan
    # skeleton as the forward; the einsum contracts the BLOCK-ROW dim
    # (blocks[slot]^T @ grad_rowblock).
    if nb == 0:
        out = jnp.zeros((C, B, K), acc_dtype)
    else:
        n, ch = _chunk_geom(nb, B, K, jnp.dtype(acc_dtype).itemsize)
        bid = _chunk_stack(h.order_t, n, ch, nb)
        seg = _chunk_stack(jnp.take(h.slot_col, h.order_t), n, ch, C)
        src = _chunk_stack(jnp.take(h.slot_row, h.order_t), n, ch, 0)
        out = _scan_block_pass(h.blocks, bid, seg, src, gb, C, B, K,
                               "sbc,sbk->sck", acc_dtype, precision)
    out = out.reshape(C * B, K)[:N].astype(g.dtype)

    if h.ell_t is not None:
        if h.rest_baked_t is not None:
            out = out + ell_spmm(h.ell_t, None, g, baked=h.rest_baked_t)
        else:
            _, vals = _rest_vals(h, value)
            out = out + ell_spmm(h.ell_t, vals, g)
    return out


def _dense_matmul(a, x, precision, acc):
    """``a @ x`` with the store-dtype rules: a bf16 store at
    HIGH/HIGHEST runs the k-concat split (one read of ``a``, both bf16
    components of ``x`` in one widened matmul — only the store's own
    quantization remains as error); other dtype mixes cast the small
    operand to the store dtype."""
    if a.dtype == jnp.bfloat16 and x.dtype == jnp.float32:
        if isinstance(precision, tuple):
            precision = precision[0]
        parts = {jax.lax.Precision.HIGH: 2,
                 jax.lax.Precision.HIGHEST: 3}.get(precision, 1)
        if parts > 1:
            k = x.shape[1]
            xcat = jnp.concatenate(_split_bf16(x, parts), axis=1)
            o = jnp.matmul(a, xcat,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=acc)
            out = o[:, :k]
            for i in range(1, parts):
                out = out + o[:, i * k:(i + 1) * k]
            return out
        return jnp.matmul(a, x.astype(a.dtype),
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=acc)
    return jnp.matmul(
        a, x.astype(a.dtype) if a.dtype != x.dtype else x,
        precision=precision, preferred_element_type=acc,
    )


def dense_spmm(d: DenseFormat, x: jnp.ndarray,
               precision=None) -> jnp.ndarray:
    acc = jnp.promote_types(x.dtype, jnp.float32)
    return _dense_matmul(d.dense, x, _prec(precision), acc).astype(x.dtype)


def dense_spmm_t(d: DenseFormat, g: jnp.ndarray,
                 precision=None) -> jnp.ndarray:
    acc = jnp.promote_types(g.dtype, jnp.float32)
    return _dense_matmul(d.dense.T, g, _prec(precision), acc).astype(g.dtype)


def build_hybrid_from_tensor(A, B: int = 512,
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
