"""ogbn-products-config pipeline benchmark (BASELINE.json config #4).

"ogbn-products (2.4M nodes, 124M nnz): METIS 8-way partition +
SAINT/neighbor sampling + per-partition SpMM, 1 host."

Zero-egress -> synthetic graph at products scale (M=2,449,029,
E≈123.7M) with planted communities + a power-law-ish degree skew (the
partition quality and the sampler hash churn both depend on those).

Measured:
  1. construction + coalesce
  2. 8-way multilevel partition (native; METIS-family algorithm):
     wall time + edge-cut fraction + part balance
  3. per-partition SpMM: 8 diagonal blocks extracted with
     partptr/narrow (the ClusterGCN layout), fp32 K=100 features,
     device-timed via the slope method
  4. SAINT subgraph sampling (20K-node samples) throughput
  5. neighbor_sample (batch 1024, fanouts [15, 10, 5]) throughput

Usage: python benchmarks/products_pipeline.py [--scale 1.0]
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
    rng = np.random.RandomState(seed)
    M = int(2_449_029 * scale)
    E = int(123_718_280 * scale)
    n_comm = max(int(8000 * scale), 8)
    comm = rng.randint(0, n_comm, M).astype(np.int32)
    order = np.argsort(comm, kind="stable")
    comm_ptr = np.searchsorted(comm[order], np.arange(n_comm + 1))

    # power-law-ish source skew: mix uniform sources with hub sources
    src = rng.randint(0, M, E).astype(np.int64)
    hubs = rng.randint(0, max(M // 100, 1), E // 5).astype(np.int64)
    src[: hubs.shape[0]] = hubs
    intra = rng.rand(E) < 0.8
    c = comm[src[intra]]
    lo, hi = comm_ptr[c], comm_ptr[c + 1]
    dst_intra = order[
        lo + (rng.rand(int(intra.sum())) * (hi - lo)).astype(np.int64)
    ]
    dst = rng.randint(0, M, E).astype(np.int64)
    dst[intra] = dst_intra
    return M, src, dst


def _log(msg):
    print(f"[products_pipeline] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--feat", type=int, default=100)
    ap.add_argument("--grouping", type=str, default="within",
                    choices=["within", "quotient"],
                    help="partition_fine grouping (within: direct coarse "
                         "cut + per-part fine reorder)")
    ap.add_argument("--fine", type=int, default=0,
                    help="reorder with a FINE K-way partition (0=off, "
                         "-1=auto M//512) before grouping into --parts "
                         "ClusterGCN blocks; communities become "
                         "contiguous so the router can densify "
                         "(probe_products_reorder.py: 0%% -> ~50%% of "
                         "edges in dense blocks)")
    args = ap.parse_args()

    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts
    from timing import device_time

    report = {}

    t0 = time.time()
    M, src, dst = build_graph(args.scale)
    _log("at build_graph_s"); report["build_graph_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    # Numpy construction keeps sort/coalesce on the host and seeds the
    # storage host-view cache (samplers + partitioner consume it).
    # Unweighted end-to-end (the ClusterGCN layout partitions the raw
    # adjacency): with no value array, permute/sampler value gathers —
    # eager per-shape device compiles on the remote tunnel — never run.
    A = ts.SparseTensor(
        row=src, col=dst, sparse_sizes=(M, M),
    ).coalesce("add")
    E = int(A.nnz())
    _log("at construct_coalesce_s")
    report["construct_coalesce_s"] = round(time.time() - t0, 2)
    report["nodes"], report["nnz"] = M, E

    # 2. 8-way partition (or --fine: K-way reorder grouped into
    # args.parts contiguous ClusterGCN buckets — same coarse blocks,
    # community-contiguous interiors)
    t0 = time.time()
    if args.fine:
        # Two-level reorder (ts.partition_fine): fine clusters become
        # contiguous (so the hybrid router can densify) and a quotient-
        # graph partition groups them into args.parts ClusterGCN
        # buckets at the direct partition's coarse cut (a naive
        # contiguous grouping measured 0.41 vs 0.21 at 0.25 scale).
        Kf = args.fine if args.fine > 0 else max(M // 512, args.parts)
        padj, partptr, perm = ts.partition_fine(A, args.parts,
                                                fine_parts=Kf,
                                                grouping=args.grouping)
        pp = np.asarray(partptr)
        report["fine_parts"] = int(Kf)
    else:
        padj, partptr, perm = A.partition(args.parts)
        pp = np.asarray(partptr)
    _log("at partition_s"); report["partition_s"] = round(time.time() - t0, 1)
    sizes = np.diff(pp)
    report["part_sizes"] = sizes.tolist()
    report["part_balance"] = round(float(sizes.max() / (M / args.parts)), 3)
    # edge cut: edges whose endpoints land in different parts
    prow = padj.storage.numpy_view("row")
    pcol = padj.storage.numpy_view("col")
    part_of = np.searchsorted(pp, np.arange(M), side="right") - 1
    cut = int((part_of[prow] != part_of[pcol]).sum())
    _log("at edge_cut_frac"); report["edge_cut_frac"] = round(cut / E, 4)

    # 3. per-partition SpMM over the diagonal blocks (ClusterGCN layout)
    K = args.feat
    rng = np.random.RandomState(1)
    block_times = []
    routed = []
    for p in range(args.parts):
        lo, hi = int(pp[p]), int(pp[p + 1])
        blk = padj.narrow(0, lo, hi - lo).narrow(1, lo, hi - lo)
        # Auto format selection: the router densifies community blocks
        # that clear the measured break-even (needs the --fine reorder
        # to see any on this synthetic) and falls back to ELL.
        h = blk.storage.hybrid()
        routed.append(type(h).__name__ if h is not None else "ell")
        blk.storage.ell()
        blk.storage.ell_t()
        X = jnp.asarray(rng.randn(hi - lo, K).astype(np.float32))
        # Pass the block as a jit ARGUMENT: closure-constant ELL tables
        # at ~15M-edge blocks take minutes per remote compile
        # (CLAUDE.md closure-vs-argument note).
        dt = device_time(lambda m, b: ts.spmm_sum(b, m), X, blk)
        block_times.append(dt)
        _log(f"part {p}: {dt*1e3:.2f} ms ({routed[-1]})")
    report["per_part_routed"] = routed
    report["per_part_spmm_ms"] = [round(t * 1e3, 2) for t in block_times]
    intra_nnz = E - cut
    report["per_part_spmm_total_ms"] = round(sum(block_times) * 1e3, 2)
    _log("at per_part_spmm_mnnz_per_s"); report["per_part_spmm_mnnz_per_s"] = round(
        intra_nnz / sum(block_times) / 1e6, 1)

    # 4. SAINT subgraph sampling
    t0 = time.time()
    n_iter, sample_n = 5, min(20000, M)
    for i in range(n_iter):
        idx = np.random.RandomState(i).choice(M, sample_n, replace=False)
        sub, e_id = ts.saint_subgraph(A, jnp.asarray(np.sort(idx)))
    dt = (time.time() - t0) / n_iter
    _log("at saint_20k_sample_s"); report["saint_20k_sample_s"] = round(dt, 3)

    # 5. neighbor sampling (batch 1024, fanouts 15/10/5); host arrays in,
    # so the sampler pipeline never waits on the device.
    colptr = A.storage.numpy_view("colptr")
    rowA = A.storage.numpy_view("row")[A.storage.numpy_view("csr2csc")]
    t0 = time.time()
    n_iter = 10
    tot_nodes = 0
    for i in range(n_iter):
        seeds = np.random.RandomState(100 + i).randint(0, M, 1024)
        nid, rows, cols, eids = ts.neighbor_sample(
            colptr, rowA, jnp.asarray(seeds), [15, 10, 5], seed=i)
        tot_nodes += int(np.asarray(nid).shape[0])
    dt = (time.time() - t0) / n_iter
    report["neighbor_sample_b1024_f15_10_5_s"] = round(dt, 3)
    report["neighbor_sample_nodes_per_batch"] = tot_nodes // n_iter

    print(json.dumps(report))


if __name__ == "__main__":
    main()
