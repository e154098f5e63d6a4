"""Products-config reorder probe: does a FINER partition put the
products synthetic on the MXU?

BASELINE.md round 4: after the 8-way ClusterGCN partition the products
synthetic's ~306-node communities stay scattered inside each 306K-node
part, so no (512, 512) block clears the densify break-even and the
per-partition SpMM stays on the gather path (149.6 Mnnz/s).  The noted
fix is a finer reorder so communities become contiguous BEFORE
blocking.  This probe quantifies that host-side (no chip needed): for
each candidate ordering it reports the fraction of edges landing in
>=break-even (512, 512) blocks — the number that decides the router —
at both store-dtype thresholds (f32/HIGH 0.93%, bf16/k-concat 0.26%).

Orderings:
  raw        — the synthetic's scattered node ids
  part8      — 8-way native multilevel partition (the current pipeline)
  partK      — K-way native multilevel partition, K ~ M/512 (one part
               per block; communities of ~306 nodes then tile 1-2 parts)
  oracle     — sort by the planted community id (the upper bound any
               reorder can reach)

Usage: python benchmarks/probe_products_reorder.py [--scale 0.25] [--parts K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from products_pipeline import build_graph


def stats(row, col, M, label, B=512):
    from pytorch_sparse_tpu.ops.kernels.hybrid import (
        block_break_even, dense_fraction,
    )

    for name, elem, passes in (("f32/HIGH", 4, 3.0), ("bf16", 2, 1.0)):
        be = block_break_even(B, elem=elem, passes=passes)
        frac, nb = dense_fraction(row, col, M, M, B=B, min_density=be)
        print(f"  {label:10s} [{name:8s} be={be * 100:.2f}%]: "
              f"{frac * 100:5.1f}% of edges in {nb} dense {B}^2 blocks",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--parts", type=int, default=0,
                    help="fine part count (default M//512)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts

    t0 = time.time()
    M, src, dst = build_graph(args.scale)
    # ground-truth community of each node (same RNG draws as build_graph)
    rng = np.random.RandomState(0)
    n_comm = max(int(8000 * args.scale), 8)
    comm = rng.randint(0, n_comm, M).astype(np.int32)

    A = ts.SparseTensor(
        row=jnp.asarray(src.astype(np.int64)),
        col=jnp.asarray(dst.astype(np.int64)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    row = np.asarray(A.storage.numpy_view("row"))
    col = np.asarray(A.storage.numpy_view("col"))
    E = row.shape[0]
    print(f"M={M} E={E} (coalesced, {time.time() - t0:.0f}s)", flush=True)

    stats(row, col, M, "raw")

    # oracle: community sort (what a perfect reorder reaches)
    order = np.argsort(comm, kind="stable").astype(np.int64)
    newid = np.empty(M, np.int64)
    newid[order] = np.arange(M)
    stats(newid[row], newid[col], M, "oracle")

    # 8-way (current pipeline)
    t0 = time.time()
    _, _, perm8 = ts.partition(A, 8)
    p8 = np.asarray(perm8)
    inv8 = np.empty(M, np.int64)
    inv8[p8] = np.arange(M)
    print(f"  part8 wall {time.time() - t0:.0f}s", flush=True)
    stats(inv8[row], inv8[col], M, "part8")

    # fine K-way
    Kp = args.parts or max(M // 512, 8)
    t0 = time.time()
    _, _, permK = ts.partition(A, Kp)
    pK = np.asarray(permK)
    invK = np.empty(M, np.int64)
    invK[pK] = np.arange(M)
    print(f"  part{Kp} wall {time.time() - t0:.0f}s", flush=True)
    stats(invK[row], invK[col], M, f"part{Kp}")


if __name__ == "__main__":
    main()
