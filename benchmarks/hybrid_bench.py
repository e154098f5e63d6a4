"""Hybrid block-dense + ELL SpMM vs the ELL gather path.

Reproduces the BASELINE.md hybrid numbers: a Reddit-density community
graph, METIS-ordered, then SpMM timed through both formats on the
device.  At --scale 0.1 (23.3K nodes / 11.5M nnz): ELL ~38 ms vs hybrid
~9.7 ms (3.9x).  At --scale 1.0 (233K / 115.5M): ELL ~960 ms vs hybrid
~194 ms (4.95x) — run the two formats in separate processes at full
scale (--skip-ell / --skip-hybrid) if memory-constrained: the ELL views
plus the block store together exceed a v5e's 16 GB HBM.

    python benchmarks/hybrid_bench.py --scale 0.1
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--K", type=int, default=128)
    ap.add_argument("--B", type=int, default=None,
                    help="block size (default: 1024 below 50K nodes, 512 above)")
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--bf16-blocks", action="store_true")
    ap.add_argument("--aligned", action="store_true",
                    help="block-align partition boundaries")
    ap.add_argument("--skip-ell", action="store_true")
    ap.add_argument("--skip-hybrid", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.ops.kernels.hybrid import (
        build_hybrid_from_tensor, hybrid_spmm,
    )
    from timing import device_time

    report = {}
    rng = np.random.RandomState(0)
    M = int(232_965 * args.scale)
    E = int(114_615_892 * args.scale * 1.4)
    n_comm = max(int(300 * args.scale), 4)
    comm = rng.randint(0, n_comm, M)
    order = np.argsort(comm)
    cp = np.searchsorted(comm[order], np.arange(n_comm + 1))
    src = rng.randint(0, M, E)
    intra = rng.rand(E) < 0.9
    c = comm[src[intra]]
    dst = rng.randint(0, M, E)
    dst[intra] = order[
        cp[c] + (rng.rand(int(intra.sum())) * (cp[c + 1] - cp[c]))
        .astype(np.int64)
    ]
    A = ts.SparseTensor(row=src, col=dst, sparse_sizes=(M, M)).coalesce("add")
    parts = args.parts or max(n_comm // 10, 4)
    padj, pptr, _ = A.partition(parts)
    padj = padj.set_value(jnp.ones(padj.nnz(), jnp.float32), layout="coo")
    report["nodes"], report["nnz"], report["parts"] = M, int(A.nnz()), parts
    x = jnp.asarray(rng.randn(M, args.K).astype(np.float32))

    if not args.skip_ell:
        t0 = time.time()
        padj.storage.ell()
        padj.storage.ell_t()
        report["ell_build_s"] = round(time.time() - t0, 1)
        dt = device_time(lambda m, a: ts.spmm_sum(a, m), x, padj)
        report["ell_ms"] = round(dt * 1e3, 2)
        report["ell_mnnz_per_s"] = round(padj.nnz() / dt / 1e6, 1)

    if not args.skip_hybrid:
        B = args.B or (1024 if M < 50_000 else 512)
        t0 = time.time()
        h = build_hybrid_from_tensor(
            padj, B=B,
            block_dtype=jnp.bfloat16 if args.bf16_blocks else None,
            partptr=np.asarray(pptr) if args.aligned else None,
        )
        report["hybrid_build_s"] = round(time.time() - t0, 1)
        report["hybrid_B"] = B
        report["hybrid_dense_frac"] = round(h.dense_nnz / padj.nnz(), 3)
        report["hybrid_blocks"] = int(h.blocks.shape[0] - 1)
        # correctness on a row slice vs the dense oracle
        sl = padj[:256]
        ref = np.asarray(sl.to_dense()) @ np.asarray(x)
        got = np.asarray(hybrid_spmm(h, x)[:256])
        report["hybrid_oracle_max_err"] = float(np.abs(got - ref).max())
        dt = device_time(lambda m, hh: hybrid_spmm(hh, m), x, h)
        report["hybrid_ms"] = round(dt * 1e3, 2)
        report["hybrid_mnnz_per_s"] = round(padj.nnz() / dt / 1e6, 1)

    if "ell_ms" in report and "hybrid_ms" in report:
        report["speedup"] = round(report["ell_ms"] / report["hybrid_ms"], 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
