"""Reddit-config pipeline benchmark (BASELINE.json config #3).

"Reddit (233K nodes, 115M nnz): SpSpMM 2-hop adjacency (A·A) +
transpose/diag/spadd pipeline."

Zero-egress environment -> synthetic graph at exact Reddit scale
(M=232,965, E≈114.6M) with planted community structure (Reddit's 2-hop
blowup comes from dense communities, so the synthetic generator plants
them too: 90% of edges land inside one of 2,000 communities).

Pipeline measured:
  1. construction + coalesce (device sort of 115M edges)
  2. transpose (csr2csc path), spadd(A, Aᵀ), remove_diag/set_diag
  3. diag(A·A) without materializing the product (ops/spgemm.py)
  4. A·A streamed row blocks (native Gustavson): measured terms/s over
     a row sample, exact total term count, extrapolated full-product
     time.  The full product's OUTPUT (~10^10 nnz) exceeds any single
     host/device memory, which is exactly why the streaming API exists;
     --full-count runs the exact nnz(A·A) counting pass (no output
     storage) instead of extrapolating.

Usage: python benchmarks/reddit_pipeline.py [--scale 1.0] [--full-count]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_graph(scale: float, seed: int = 0):
    """Synthetic Reddit-scale graph with planted communities.

    Oversamples by 1.4x against birthday-collision losses inside the
    communities so the coalesced nnz lands near the real Reddit edge
    count (community size ~780 at full scale, 90% intra edges)."""
    rng = np.random.RandomState(seed)
    M = int(232_965 * scale)
    E = int(114_615_892 * scale * 1.4)
    n_comm = max(int(300 * scale), 4)
    comm = rng.randint(0, n_comm, M).astype(np.int32)
    # community member lists for intra-community endpoints
    order = np.argsort(comm, kind="stable")
    comm_ptr = np.searchsorted(comm[order], np.arange(n_comm + 1))

    src = rng.randint(0, M, E).astype(np.int64)
    intra = rng.rand(E) < 0.9
    # intra edge: dst drawn from src's community
    c = comm[src[intra]]
    lo, hi = comm_ptr[c], comm_ptr[c + 1]
    dst_intra = order[(lo + (rng.rand(intra.sum()) * (hi - lo)).astype(np.int64))]
    dst = rng.randint(0, M, E).astype(np.int64)
    dst[intra] = dst_intra
    return M, src, dst


def _log(msg):
    print(f"[reddit_pipeline] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--full-count", action="store_true",
                    help="exact nnz(A.A) counting pass instead of sampling")
    ap.add_argument("--full-numeric", action="store_true",
                    help="full streaming numeric A.A (values discarded "
                         "per block; reports checksum + throughput)")
    ap.add_argument("--sample-rows", type=int, default=4096,
                    help="row sample size for the A.A throughput measure")
    args = ap.parse_args()

    import timing  # noqa: F401  (enables the persistent compile cache)
    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.csrc import bindings, lib

    report = {}

    t0 = time.time()
    M, src, dst = build_graph(args.scale)
    report["build_graph_s"] = round(time.time() - t0, 2)
    _log(f"graph built: {report}")

    # 1. construction + coalesce.  Numpy inputs keep the sort/dedupe on
    # the host (storage seeds its host-view cache) — constructing from
    # device arrays instead costs a multi-minute remote-compile per new
    # shape on this tunnel (see CLAUDE.md).  Structure-only (values
    # attached post-coalesce), matching unweighted adjacencies.
    t0 = time.time()
    A = ts.SparseTensor(
        row=src, col=dst, sparse_sizes=(M, M),
    ).coalesce("add")
    A.storage.rowptr()
    report["construct_coalesce_s"] = round(time.time() - t0, 2)
    _log(f"coalesced: {report}")
    E = A.nnz()
    report["nodes"], report["nnz"] = M, int(E)

    # 2. transpose / spadd / diag ops
    t0 = time.time()
    At = A.t()
    At.storage.rowptr().block_until_ready()
    report["transpose_s"] = round(time.time() - t0, 2)
    _log("transpose done")

    t0 = time.time()
    S = ts.add(A, At)  # A + Aᵀ (symmetrization; concat + coalesce)
    S.storage.rowptr().block_until_ready()
    report["spadd_s"] = round(time.time() - t0, 2)
    report["spadd_nnz"] = int(S.nnz())
    _log("spadd done")

    t0 = time.time()
    Ad = A.remove_diag().set_diag(jnp.ones(M, jnp.float32))
    Ad.storage.col().block_until_ready()
    report["remove_set_diag_s"] = round(time.time() - t0, 2)
    _log("diag ops done")

    # 3. diag(A.A) without the product
    t0 = time.time()
    d2 = ts.spspmm_diag(A, A)
    report["diag_AA_s"] = round(time.time() - t0, 2)
    report["diag_AA_sum"] = float(jnp.sum(d2))
    _log("diag(AA) done")

    # 4. A.A term throughput
    terms_total = ts.expansion_terms(A, A)
    report["AA_terms_total"] = int(terms_total)
    _log(f'AA terms: {report["AA_terms_total"]}')

    rowptr = A.storage.numpy_view("rowptr")
    col = A.storage.numpy_view("col")
    v = A.storage.value()
    val = None if v is None else np.asarray(v).astype(np.float64)

    if lib is None:
        report["error"] = "native lib unavailable"
        print(json.dumps(report))
        return

    # sample of rows spread across the matrix
    R = min(args.sample_rows, M)
    step = max(M // R, 1)
    lo_rows = np.arange(0, M - step, step)[:R]
    t0 = time.time()
    sampled_terms = 0
    sampled_nnz = 0
    for lo in lo_rows[:: max(len(lo_rows) // 64, 1)]:  # 64 scattered blocks
        hi = min(int(lo) + step, M)
        rp, cc, vv = bindings.spgemm(rowptr, col, val, rowptr, col, val,
                                     M, row_lo=int(lo), row_hi=hi)
        deg = rowptr[col[rowptr[lo]:rowptr[hi]] + 1] - \
            rowptr[col[rowptr[lo]:rowptr[hi]]]
        sampled_terms += int(deg.sum())
        sampled_nnz += int(rp[-1])
    dt = time.time() - t0
    report["AA_sampled_terms"] = sampled_terms
    report["AA_sampled_nnz"] = sampled_nnz
    report["AA_terms_per_s"] = round(sampled_terms / dt, 1)
    report["AA_extrapolated_full_s"] = round(
        terms_total / (sampled_terms / dt), 1)
    report["AA_extrapolated_nnz"] = int(
        sampled_nnz * (terms_total / max(sampled_terms, 1)))

    if args.full_count:
        t0 = time.time()
        nnzC = 0
        CHUNK = 8192
        for lo in range(0, M, CHUNK):
            hi = min(lo + CHUNK, M)
            rp, _, _ = bindings.spgemm(
                rowptr, col, None, rowptr, col, None, M,
                row_lo=lo, row_hi=hi, count_only=True,
            )
            nnzC += int(rp[-1])
        report["AA_nnz_exact"] = int(nnzC)
        report["AA_count_pass_s"] = round(time.time() - t0, 1)

    if args.full_numeric:
        # The materialized product (~100 GB at full scale) fits nowhere;
        # stream row blocks through the native Gustavson kernel and
        # reduce each block to a checksum before discarding it.  The
        # pipeline's A is structure-only, so attach host-side random
        # values here — otherwise spgemm_fill skips the multiply-
        # accumulate pass and the "numeric" run measures structure only.
        val_num = val
        if val_num is None:
            val_num = np.random.RandomState(7).rand(col.shape[0])
        t0 = time.time()
        nnzC = 0
        checksum = 0.0
        CHUNK = 8192
        for lo in range(0, M, CHUNK):
            hi = min(lo + CHUNK, M)
            rp, cc, vv = bindings.spgemm(rowptr, col, val_num,
                                         rowptr, col, val_num,
                                         M, row_lo=lo, row_hi=hi)
            nnzC += int(rp[-1])
            if vv is not None:
                checksum += float(vv.sum())
            else:
                checksum += float(rp[-1])
            if lo % (CHUNK * 4) == 0:
                _log(f"numeric A.A rows {hi}/{M} nnz so far {nnzC}")
        dt = time.time() - t0
        report["AA_numeric_full_s"] = round(dt, 1)
        report["AA_numeric_nnz"] = int(nnzC)
        report["AA_numeric_checksum"] = checksum
        report["AA_numeric_terms_per_s"] = round(terms_total / dt, 1)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
