"""Partition cut-quality head-to-head (VERDICT r4 missing #2 / item 10).

Real METIS cannot be linked here (zero-egress container: no libmetis,
no pymetis wheel), so this records the next-best evidence for the own
multilevel partitioner: a head-to-head against the PLANTED ground
truth (on stochastic-block graphs the planted assignment is the
Bayes-optimal cut in the recoverable regime) and against two
independent third-party implementations that ARE in the image —
networkx Louvain (modularity communities mapped to k balanced groups)
and sklearn spectral clustering — on the graph families the eval
configs use.  Metrics: edge-cut fraction (the METIS objective),
balance (max part weight / mean), and wall time.

    python tools/partition_quality.py [--n 20000] [--k 8]

Prints one JSON line per (graph, method) plus a summary verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def cut_and_balance(row, col, cluster, k):
    cut = float((cluster[row] != cluster[col]).mean())
    sizes = np.bincount(cluster, minlength=k)
    bal = float(sizes.max() / max(sizes.mean(), 1e-9))
    return cut, bal


def groups_to_k(labels, k, n):
    """Map arbitrary community labels to exactly k balanced groups by
    greedy bin packing of communities (largest first)."""
    ids, sizes = np.unique(labels, return_counts=True)
    order = np.argsort(-sizes)
    loads = np.zeros(k)
    gmap = {}
    for i in order:
        g = int(np.argmin(loads))
        gmap[ids[i]] = g
        loads[g] += sizes[i]
    return np.array([gmap[c] for c in labels])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--avg-deg", type=float, default=20.0)
    args = ap.parse_args()

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.partition.metis import partition_fn

    rng = np.random.RandomState(0)
    n, k = args.n, args.k
    E = int(n * args.avg_deg)

    graphs = {}
    # planted k-block SBM (products/Reddit-like; ground truth known)
    planted = rng.randint(0, k, n)
    src = rng.randint(0, n, E)
    dst = rng.randint(0, n, E)
    intra = rng.rand(E) < 0.9
    byc = [np.flatnonzero(planted == c) for c in range(k)]
    for c in range(k):
        sel = intra & (planted[src] == c)
        if byc[c].size:
            dst[sel] = byc[c][rng.randint(0, byc[c].size, int(sel.sum()))]
    graphs["sbm_k%d" % k] = (src, dst, planted)
    # finer SBM: 64 planted communities grouped into k (ClusterGCN case)
    kf = 64
    planted_f = rng.randint(0, kf, n)
    src2 = rng.randint(0, n, E)
    dst2 = rng.randint(0, n, E)
    intra2 = rng.rand(E) < 0.9
    byc2 = [np.flatnonzero(planted_f == c) for c in range(kf)]
    for c in range(kf):
        sel = intra2 & (planted_f[src2] == c)
        if byc2[c].size:
            dst2[sel] = byc2[c][
                rng.randint(0, byc2[c].size, int(sel.sum()))]
    graphs["sbm_k64_grouped"] = (src2, dst2, planted_f)
    # uniform random (no structure: every method should look similar)
    graphs["uniform"] = (rng.randint(0, n, E), rng.randint(0, n, E), None)

    results = []
    for gname, (r0, c0, truth) in graphs.items():
        A = ts.SparseTensor(
            row=np.concatenate([r0, c0]), col=np.concatenate([c0, r0]),
            sparse_sizes=(n, n),
        ).coalesce("add")
        row = np.asarray(A.storage.numpy_view("row"))
        col = np.asarray(A.storage.numpy_view("col"))
        rowptr = np.asarray(A.storage.numpy_view("rowptr"))

        def rec(method, cluster, dt):
            cut, bal = cut_and_balance(row, col, cluster, k)
            results.append({"graph": gname, "method": method,
                            "cut": round(cut, 4),
                            "balance": round(bal, 3),
                            "wall_s": round(dt, 2)})
            print(json.dumps(results[-1]), flush=True)

        t0 = time.time()
        cl = partition_fn(rowptr.astype(np.int64), col.astype(np.int64), k)
        rec("ours_multilevel", cl, time.time() - t0)

        if truth is not None:
            rec("planted_truth", groups_to_k(truth, k, n), 0.0)

        try:
            import networkx as nx

            G = nx.Graph()
            G.add_edges_from(zip(row.tolist(), col.tolist()))
            G.add_nodes_from(range(n))
            t0 = time.time()
            comms = nx.community.louvain_communities(G, seed=0)
            lab = np.zeros(n, np.int64)
            for i, s in enumerate(comms):
                lab[list(s)] = i
            rec("louvain_grouped", groups_to_k(lab, k, n),
                time.time() - t0)
        except Exception as e:  # pragma: no cover
            print(json.dumps({"graph": gname, "method": "louvain",
                              "error": str(e)}), flush=True)

        try:
            from scipy.sparse import csr_matrix
            from sklearn.cluster import SpectralClustering

            if n <= 20000:
                S = csr_matrix(
                    (np.ones(row.size, np.float32), (row, col)), (n, n)
                )
                t0 = time.time()
                sc = SpectralClustering(
                    n_clusters=k, affinity="precomputed",
                    assign_labels="kmeans", random_state=0,
                    eigen_solver="amg" if False else "arpack",
                )
                lab = sc.fit_predict(S)
                rec("sklearn_spectral", lab.astype(np.int64),
                    time.time() - t0)
        except Exception as e:  # pragma: no cover
            print(json.dumps({"graph": gname, "method": "spectral",
                              "error": str(e)}), flush=True)

    by = {}
    for r in results:
        by.setdefault(r["graph"], {})[r["method"]] = r["cut"]
    verdict = {"summary": by}
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
