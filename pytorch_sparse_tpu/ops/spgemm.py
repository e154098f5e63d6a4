"""Large-scale SpGEMM drivers: chunked, native, and streaming.

The single-shot plan path (``ops/matmul.py:_spspmm_structure``)
materializes every expansion term host-side — O(terms) memory and an
O(terms log terms) sort.  At Reddit scale (A·A over 115M nnz, ~5e10
product terms — the BASELINE.json Reddit config) that is infeasible in
one shot on any host.  The reference sidesteps the problem by delegating
SpSpMM to ``torch.sparse.mm`` (``torch_sparse/matmul.py:97``), which
OOMs at the same scale; this framework owns the kernel and therefore
also owns the scaling strategy:

* ``spspmm_chunked`` — split A's rows into chunks of bounded expansion
  size, run the structure+numeric plan per chunk, concatenate.  Memory
  is bounded by the chunk; values stay on device and the whole product
  remains **differentiable** (each chunk is the same gather/one-hot
  reduction the single-shot path uses).
* ``spspmm_native`` — Gustavson dense-accumulator row merge in C++
  (``csrc/native.cpp:spgemm_nnz/spgemm_fill``), OpenMP row-parallel.
  O(terms) time, O(P) scratch, no sort of the term list.  Forward-only
  (values are computed outside the JAX trace); 1-2 orders of magnitude
  faster than the chunked plan for huge products.
* ``spspmm_stream`` — generator of C row blocks for products whose
  *output* does not fit in memory; downstream pipeline ops (diag,
  spadd, reductions) consume blocks without materializing C.
* ``spspmm_diag`` — diag(A@B) without forming C at all (a segmented
  binary search of B's rows: O(nnz(A) log deg(B))).

Dispatch (``spspmm_large``): plan path below ``PLAN_MAX_TERMS`` (chosen
in ``ops/matmul.py:spspmm_sum``), then native when both values are
concrete (not JAX tracers), else chunked-differentiable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor

# Max product terms the single-shot plan path materializes host-side
# (~64M terms ≈ 1.5 GB of transient host index arrays).
PLAN_MAX_TERMS = 1 << 26


def _expansion_degrees(A: SparseTensor, B: SparseTensor) -> np.ndarray:
    """Per-A-nnz expansion counts: deg_B(colA[e]) (int64, host)."""
    colA = A.storage.numpy_view("col")
    rowptrB = B.storage.numpy_view("rowptr")
    return rowptrB[colA + 1] - rowptrB[colA]


def expansion_terms(A: SparseTensor, B: SparseTensor) -> int:
    """Exact number of product terms of A@B (the SpGEMM 'flop' count)."""
    return int(_expansion_degrees(A, B).sum())


def _row_chunks(A: SparseTensor, B: SparseTensor,
                max_terms: int) -> Tuple[np.ndarray, list]:
    """Split A's rows into [lo, hi) chunks of ≤ max_terms expansion each
    (single rows that alone exceed the budget get their own chunk)."""
    rowptrA = A.storage.numpy_view("rowptr")
    deg = _expansion_degrees(A, B)
    cum = np.concatenate([[0], np.cumsum(deg)])
    row_cum = cum[rowptrA]  # expansion terms before each row
    M = rowptrA.shape[0] - 1
    chunks = []
    lo = 0
    while lo < M:
        hi = int(np.searchsorted(row_cum, row_cum[lo] + max_terms,
                                 side="right")) - 1
        hi = min(max(hi, lo + 1), M)
        chunks.append((lo, hi))
        lo = hi
    return rowptrA, chunks


def _value_dtype(A: SparseTensor, B: SparseTensor):
    va, vb = A.storage.value(), B.storage.value()
    if va is None and vb is None:
        return None
    if va is None:
        return vb.dtype
    if vb is None:
        return va.dtype
    return jnp.promote_types(va.dtype, vb.dtype)


def _is_concrete(x) -> bool:
    return x is None or not isinstance(x, jax.core.Tracer)


def spspmm_chunked(A: SparseTensor, B: SparseTensor,
                   max_terms: int = PLAN_MAX_TERMS) -> SparseTensor:
    """Differentiable chunked SpGEMM; memory bounded by ``max_terms``."""
    from .matmul import _plan_numeric, _spspmm_structure

    M, P = A.sparse_size(0), B.sparse_size(1)
    valueA, valueB = A.storage.value(), B.storage.value()
    rowptrA, chunks = _row_chunks(A, B, max_terms)
    rows, cols, vals = [], [], []
    for lo, hi in chunks:
        a_pos, b_pos, t_tabs, inv, n_out, rowC, colC = _spspmm_structure(
            A, B, int(rowptrA[lo]), int(rowptrA[hi])
        )
        v = _plan_numeric(valueA, valueB, A.nnz(), B.nnz(), a_pos, b_pos,
                          t_tabs, inv, n_out)
        rows.append(rowC)
        cols.append(colC)
        if v is not None:
            vals.append(v)
    row = (jnp.concatenate(rows) if rows
           else jnp.zeros((0,), jnp.int32))
    col = (jnp.concatenate(cols) if cols
           else jnp.zeros((0,), jnp.int32))
    if vals:
        value = jnp.concatenate(vals)
    else:
        dtype = _value_dtype(A, B)
        value = None if dtype is None else jnp.zeros((0,), dtype)
    return SparseTensor(row=row, col=col, value=value, sparse_sizes=(M, P),
                        is_sorted=True, trust_data=True)


def spspmm_native(A: SparseTensor, B: SparseTensor) -> SparseTensor:
    """Gustavson SpGEMM via the native library (forward-only values)."""
    from ..csrc import bindings, lib
    if lib is None:
        raise RuntimeError(
            "libsparse_tpu_native.so not built; run "
            "pytorch_sparse_tpu/csrc/build.sh or use spspmm_chunked."
        )
    M, P = A.sparse_size(0), B.sparse_size(1)
    va, vb = A.storage.value(), B.storage.value()
    rowptrC, colC, valC = bindings.spgemm(
        A.storage.numpy_view("rowptr"), A.storage.numpy_view("col"),
        None if va is None else np.asarray(va),
        B.storage.numpy_view("rowptr"), B.storage.numpy_view("col"),
        None if vb is None else np.asarray(vb), P,
    )
    dtype = _value_dtype(A, B)
    value = None if valC is None else jnp.asarray(valC.astype(dtype))
    return SparseTensor(
        rowptr=jnp.asarray(rowptrC.astype(np.int32)),
        col=jnp.asarray(colC.astype(np.int32)), value=value,
        sparse_sizes=(M, P), is_sorted=True, trust_data=True,
    )


def spspmm_large(A: SparseTensor, B: SparseTensor) -> SparseTensor:
    """Dispatcher for products above ``PLAN_MAX_TERMS`` (see module doc)."""
    from ..csrc import lib
    if (lib is not None and _is_concrete(A.storage.value())
            and _is_concrete(B.storage.value())):
        return spspmm_native(A, B)
    return spspmm_chunked(A, B)


def spspmm_stream(
    A: SparseTensor, B: SparseTensor, max_terms: int = PLAN_MAX_TERMS,
    raw: bool = False,
) -> Iterator[Tuple[int, int, SparseTensor]]:
    """Yield (row_lo, row_hi, C[row_lo:row_hi]) blocks of C = A@B.

    Each block is a ``(row_hi - row_lo, P)`` SparseTensor with local row
    ids; C itself is never materialized, so the product's output may
    exceed device (or host) memory.  Blocks are sized so each holds at
    most ``max_terms`` expansion terms.

    ``raw=True`` yields ``(lo, hi, (rowptrC, colC, valC))`` as HOST
    numpy arrays instead of SparseTensors — for host-side reduction
    consumers (checksums, diag, statistics) this skips the device
    upload entirely (and on the remote-tunnel dev harness, the ~30x
    slower device->host pull a consumer would otherwise pay).
    """
    from ..csrc import bindings, lib
    from .matmul import _plan_numeric, _spspmm_structure

    M, P = A.sparse_size(0), B.sparse_size(1)
    valueA, valueB = A.storage.value(), B.storage.value()
    use_native = (lib is not None and _is_concrete(valueA)
                  and _is_concrete(valueB))
    rowptrA, chunks = _row_chunks(A, B, max_terms)
    dtype = _value_dtype(A, B)
    if use_native:
        rowptrA_np = A.storage.numpy_view("rowptr")
        colA_np = A.storage.numpy_view("col")
        va = None if valueA is None else np.asarray(valueA)
        rowptrB_np = B.storage.numpy_view("rowptr")
        colB_np = B.storage.numpy_view("col")
        vb = None if valueB is None else np.asarray(valueB)
    for lo, hi in chunks:
        if use_native:
            rowptrC, colC, valC = bindings.spgemm(
                rowptrA_np, colA_np, va, rowptrB_np, colB_np, vb, P,
                row_lo=lo, row_hi=hi,
            )
            if raw:
                yield lo, hi, (rowptrC, colC, valC)
                continue
            block = SparseTensor(
                rowptr=jnp.asarray(rowptrC.astype(np.int32)),
                col=jnp.asarray(colC.astype(np.int32)),
                value=(None if valC is None
                       else jnp.asarray(valC.astype(dtype))),
                sparse_sizes=(hi - lo, P), is_sorted=True, trust_data=True,
            )
        else:
            a_pos, b_pos, t_tabs, inv, n_out, rowC, colC = _spspmm_structure(
                A, B, int(rowptrA[lo]), int(rowptrA[hi])
            )
            v = _plan_numeric(valueA, valueB, A.nnz(), B.nnz(), a_pos,
                              b_pos, t_tabs, inv, n_out)
            if raw:
                from ..utils.convert import ind2ptr

                rp = np.asarray(ind2ptr(rowC - lo, hi - lo))
                yield lo, hi, (
                    rp, np.asarray(colC),
                    None if v is None else np.asarray(v),
                )
                continue
            block = SparseTensor(
                row=rowC - lo, col=colC, value=v,
                sparse_sizes=(hi - lo, P), is_sorted=True, trust_data=True,
            )
        yield lo, hi, block


def spspmm_diag(A: SparseTensor, B: SparseTensor) -> jnp.ndarray:
    """diag(A @ B) without forming the product.

    For each A-nnz (i, k) locate B[k, i] by binary search in B's sorted
    (row, col) key space and accumulate valA * valB into diag[i].
    O(nnz(A) log nnz(B)) host time, O(min(M, P)) output.
    """
    M, P = A.sparse_size(0), B.sparse_size(1)
    D = min(M, P)
    rowA = A.storage.numpy_view("row")
    colA = A.storage.numpy_view("col")
    rowB = B.storage.numpy_view("row")
    colB = B.storage.numpy_view("col")
    dtype = _value_dtype(A, B)
    if rowB.shape[0] == 0 or rowA.shape[0] == 0:
        return jnp.zeros(D, jnp.float32 if dtype is None else dtype)
    keyB = rowB * P + colB  # sorted ascending (COO invariant)
    sel = rowA < P  # only (i, k) with i a valid B-column can hit the diag
    q = colA[sel] * P + rowA[sel]
    pos = np.searchsorted(keyB, q)
    pos_c = np.minimum(pos, keyB.shape[0] - 1)
    hit = (pos < keyB.shape[0]) & (keyB[pos_c] == q)

    va, vb = A.storage.value(), B.storage.value()
    if dtype is None:
        terms = np.ones(int(np.sum(hit)), np.float32)
        dtype = jnp.float32
    else:
        ta = (np.ones(q.shape[0], np.float64) if va is None
              else np.asarray(va).astype(np.float64)[sel])
        tb = (np.ones(q.shape[0], np.float64) if vb is None
              else np.asarray(vb).astype(np.float64)[pos_c])
        terms = (ta * tb)[hit]
    diag = np.zeros(D, np.float64)
    np.add.at(diag, rowA[sel][hit], terms)
    return jnp.asarray(diag.astype(dtype))


# ----------------------------------------------------------------------
# Device-accelerated streaming SpGEMM (VERDICT r4 item 6): the
# dense-block x dense-block share of the product runs on the MXU
# (ops/kernels/block_spgemm.py) while the remainder cross-terms stream
# through the host Gustavson kernel — the two run CONCURRENTLY, so the
# end-to-end numeric wall-clock is max(host cross-terms, device block
# pass) instead of host-everything.
# ----------------------------------------------------------------------

def _block_split(T: SparseTensor, Bb: int, min_density: float,
                 block_dtype=None):
    """Split ``T`` into dense (Bb, Bb) blocks + a COO remainder.

    Returns ``(blocks, srow, scol, remainder, dense_nnz)`` with
    ``blocks`` a (nb, Bb, Bb) device array (None when no block clears
    ``min_density``) and ``remainder`` a SparseTensor holding every
    edge outside the dense blocks (the whole of ``T`` when blocks is
    None).  Implicit values densify as 1.0, matching SpMM semantics.
    ``block_dtype=jnp.bfloat16`` halves the device store (full-Reddit
    f32 blocks plus the window carry exceed a 16 GB HBM — the store
    rounds the OPERANDS like the SpMM block store's bf16 rule; pair
    products then ride one native MXU pass)."""
    M, N = T.sparse_sizes()
    row = T.storage.numpy_view("row")
    col = T.storage.numpy_view("col")
    v = T.storage.value()
    val = None if v is None else np.asarray(v)
    nbc = -(-N // Bb)
    bid = (row // Bb).astype(np.int64) * nbc + col // Bb
    ub, cnt = np.unique(bid, return_counts=True)
    dense_ids = ub[cnt >= max(min_density * Bb * Bb, 2.0)]
    if dense_ids.size == 0:
        return None, None, None, T, 0
    mask = np.isin(bid, dense_ids)
    slot = np.searchsorted(dense_ids, bid[mask])
    li = (row[mask] % Bb).astype(np.int64)
    lj = (col[mask] % Bb).astype(np.int64)
    # sort+reduceat, not np.add.at (the scatter measured ~7x slower at
    # 10M edges — 74 s of the 0.1-scale spgemm bench was this line) and
    # not bincount (its float64 output materializes the WHOLE block
    # store at 8 B/slot — 15+ GB at full-Reddit scale).  O(E) memory.
    flat = (slot * Bb + li) * Bb + lj
    w = (np.ones(flat.size, np.float32) if val is None
         else val[mask].astype(np.float32))
    blocks = np.zeros((dense_ids.size, Bb, Bb), np.float32)
    if flat.size:
        order = np.argsort(flat, kind="stable")
        fs, vs = flat[order], w[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(fs)) + 1]
        )
        blocks.reshape(-1)[fs[starts]] = np.add.reduceat(vs, starts)
    if block_dtype is not None:
        import ml_dtypes

        blocks = blocks.astype(
            ml_dtypes.bfloat16 if block_dtype == jnp.bfloat16
            else block_dtype
        )
    srow = (dense_ids // nbc).astype(np.int64)
    scol = (dense_ids % nbc).astype(np.int64)
    rem_val = None if val is None else jnp.asarray(val[~mask])
    remainder = SparseTensor(
        row=row[~mask], col=col[~mask], value=rem_val,
        sparse_sizes=(M, N), is_sorted=True, trust_data=True,
    )
    return (jnp.asarray(blocks), srow, scol, remainder,
            int(mask.sum()))


def spspmm_stream_device(
    A: SparseTensor, B: SparseTensor, Bb: int = 512,
    min_density: float = 0.05, max_out_blocks: int = 2048,
    max_terms: int = PLAN_MAX_TERMS, split_A=None, split_B=None,
    raw_coo: bool = False, block_dtype=None,
):
    """Yield the product C = A @ B as a stream of pieces, with the
    dense-block share computed on the MXU.

    Pieces are tagged tuples the consumer ADDS together:

    * ``("blocks", rows, cols, Cblk)`` — dense (n, Bb, Bb) output
      blocks at block coordinates (device arrays; the D@D share).
    * ``("coo", lo, hi, block)`` — a row-block SparseTensor (local row
      ids) from the host stream (the D@R + R@D + R@R cross-terms,
      streamed together as (D+R)@R + R@D so every term is produced
      exactly once).

    A C entry may receive contributions from BOTH piece kinds; exact
    total = their sum (tests assert vs the dense oracle).  ``Bb`` and
    ``min_density`` control the split; matrices with no dense blocks
    fall back entirely to the host stream.  ``raw_coo=True`` makes the
    coo pieces carry host ``(rowptr, col, val)`` numpy triples instead
    of SparseTensors (see ``spspmm_stream(raw=...)``) — host-reduction
    consumers then never touch the device."""
    from .kernels.block_spgemm import block_spgemm_stream

    # A is B for the common A@A case: pass split_A=split_B=the one
    # split so the multi-GB host densify runs once.
    blkA, srA, scA, remA, _ = (
        split_A if split_A is not None
        else _block_split(A, Bb, min_density, block_dtype)
    )
    blkB, srB, scB, remB, _ = (
        split_B if split_B is not None
        else (split_A if (split_A is not None and B is A)
              else _block_split(B, Bb, min_density, block_dtype))
    )
    if blkA is not None and blkB is not None:
        # D@D on the MXU
        for rows, cols, cblk in block_spgemm_stream(
            blkA, srA, scA, blkB, srB, scB,
            max_out_blocks=max_out_blocks,
        ):
            yield ("blocks", rows, cols, cblk)
        # cross-terms: D_A@R_B + R_A@B  ==  A@R_B + R_A@D_B ... choose
        # the grouping that partitions the term set exactly once:
        # A@B = D@D + D@R_B + R_A@B, with R_A@B = R_A@(D_B + R_B).
        for lo, hi, blk in spspmm_stream(A, remB, max_terms=max_terms,
                                         raw=raw_coo):
            yield ("coo", lo, hi, blk)
        # R_A @ D_B: D_B = B minus remB (B's edges inside dense blocks),
        # so the three streams partition the term set exactly:
        # A@B = D_A@D_B + A@R_B + R_A@D_B.
        DB = _dense_part(B, Bb, min_density)
        if DB is not None and DB.nnz() > 0:
            for lo, hi, blk in spspmm_stream(remA, DB,
                                             max_terms=max_terms,
                                             raw=raw_coo):
                yield ("coo", lo, hi, blk)
    else:
        for lo, hi, blk in spspmm_stream(A, B, max_terms=max_terms,
                                         raw=raw_coo):
            yield ("coo", lo, hi, blk)


def _dense_part(T: SparseTensor, Bb: int, min_density: float):
    """The COO complement of ``_block_split``'s remainder: T's edges
    INSIDE dense blocks (None when there are none)."""
    M, N = T.sparse_sizes()
    row = T.storage.numpy_view("row")
    col = T.storage.numpy_view("col")
    v = T.storage.value()
    val = None if v is None else np.asarray(v)
    nbc = -(-N // Bb)
    bid = (row // Bb).astype(np.int64) * nbc + col // Bb
    ub, cnt = np.unique(bid, return_counts=True)
    dense_ids = ub[cnt >= max(min_density * Bb * Bb, 2.0)]
    if dense_ids.size == 0:
        return None
    mask = np.isin(bid, dense_ids)
    return SparseTensor(
        row=row[mask], col=col[mask],
        value=None if val is None else jnp.asarray(val[mask]),
        sparse_sizes=(M, N), is_sorted=True, trust_data=True,
    )
