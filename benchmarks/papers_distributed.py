"""ogbn-papers100M-config benchmark (BASELINE.json config #5).

"ogbn-papers100M (111M nodes, 1.6B nnz): row-partitioned distributed
SpMM on v5p multi-host with overlapped halo exchange."

Only one chip is reachable here, so this harness produces the three
measurable pieces that determine multi-host performance, and combines
them with the ICI/DCN bandwidth model (the jax-ml scaling-book recipe):

  1. VIRTUAL-MESH VALIDATION — the full ring-scheduled distributed SpMM
     (parallel/dist.py) executes on a forced-CPU 8-device mesh at a
     scaled-down papers100M shape (correctness vs the single-matrix
     oracle).  This is the program that would run on the pod,
     shape-for-shape.
  2. PER-SHARD CHIP MEASUREMENT — one shard of papers100M at P=64
     (111M/64 ≈ 1.73M rows, 1.6B/64 ≈ 25M edges) is exactly a
     single-chip ELL SpMM; measured on the real TPU with the slope
     method when run under the axon platform.
  3. ANALYTIC STEP MODEL — per ring step each chip sends/receives one
     (Nb, K) fp32 block over ICI while computing one edge bucket.
     step_time = max(compute_per_bucket, Nb*K*4 / BW_ici) * P.
     With v5p ICI ~90 GB/s per link and the measured per-bucket
     compute, the model reports predicted step time + weak-scaling
     efficiency (the overlap hides transfer iff compute dominates).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/papers_distributed.py --validate
  python benchmarks/papers_distributed.py --chip          # on real TPU
  python benchmarks/papers_distributed.py --model [--chip-ms X]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M_FULL = 111_059_956
E_FULL = 1_615_685_872
K = 128
P_POD = 64              # v5p pod slice assumed in the model
BW_ICI = 90e9           # bytes/s per v5p ICI link (one direction)


def _synthetic(M, E, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, M, E).astype(np.int32)
    col = rng.randint(0, M, E).astype(np.int32)
    val = rng.randn(E).astype(np.float32)
    return row, col, val


def validate():
    """Run the ring + allgather schedules on the virtual 8-device mesh."""
    import jax
    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.parallel import (
        ShardedSparseMatrix, dist_spmm, make_mesh,
    )

    P = len(jax.devices())
    M, E, k = 8192, 131072, 32
    row, col, val = _synthetic(M, E)
    A = ts.SparseTensor(
        row=jnp.asarray(row), col=jnp.asarray(col), value=jnp.asarray(val),
        sparse_sizes=(M, M),
    ).coalesce("add")
    mesh = make_mesh(P)
    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(M, k).astype(np.float32))
    xs = Ash.shard_dense(x)
    oracle = np.asarray(ts.spmm_sum(A, x))
    out = {}
    for schedule in ("ring", "allgather", "halo"):
        y = Ash.unshard_dense(
            jax.jit(lambda s: dist_spmm(Ash, s, schedule))(xs)
        )
        err = float(np.abs(np.asarray(y) - oracle).max())
        out[f"{schedule}_max_err"] = err
        assert err < 1e-2, (schedule, err)
    out["devices"] = P
    out["validated"] = True
    return out


def chip():
    """Measure one papers100M shard (P=64) on the local device."""
    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts
    from timing import device_time

    Mb = M_FULL // P_POD          # ~1.73M rows
    Eb = E_FULL // P_POD          # ~25.2M edges
    row, col, val = _synthetic(Mb, Eb)
    row = np.sort(row)
    A = ts.SparseTensor(
        row=jnp.asarray(row), col=jnp.asarray(col % Mb),
        value=jnp.asarray(val), sparse_sizes=(Mb, Mb), is_sorted=True,
        trust_data=True,
    )
    A.storage.ell()
    A.storage.ell_t()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(Mb, K).astype(np.float32))
    # Big tables: pass as jit ARGUMENT (see BASELINE.md large-graph
    # note); the dense operand is the chained carry.
    dt = device_time(lambda m, a: ts.spmm_sum(a, m), x, A)
    return {
        "shard_rows": Mb, "shard_nnz": Eb, "K": K,
        "shard_spmm_ms": round(dt * 1e3, 2),
        "shard_mnnz_per_s": round(Eb / dt / 1e6, 1),
    }


def model(chip_ms=None, cut_frac=0.05):
    """Combine per-shard compute with the ICI transfer model for both
    schedules.  ``cut_frac`` is the METIS edge-cut fraction; the halo
    schedule's traffic is proportional to the distinct remote rows,
    which we bound by the cut edges (measured multilevel-partition cuts
    on community graphs: 3-7%, PARITY.md)."""
    Mb = M_FULL // P_POD
    Eb = E_FULL // P_POD
    if chip_ms is None:
        # measured on v5e via --chip: 1.735M-row / 25.2M-edge shard at
        # K=128 = 148.8 ms (169.7 Mnnz/s); v5p is faster, so this is
        # conservative.
        chip_ms = 148.8
    compute_s = chip_ms / 1e3

    # ring: rotate full (Nb, K) blocks; P-1 transfers of Nb*K*4 bytes,
    # each overlapped with one bucket (~compute/P) of work.
    block_bytes = Mb * K * 4
    ring_step_s = max(compute_s / P_POD, block_bytes / BW_ICI) * P_POD

    # halo: ship only referenced remote rows once, overlapped with the
    # interior compute (1 - cut_frac of the edges).
    halo_rows = min(int(Eb * cut_frac), Mb * (P_POD - 1))
    halo_bytes = halo_rows * K * 4
    halo_step_s = (
        max(compute_s * (1 - cut_frac), halo_bytes / BW_ICI)
        + compute_s * cut_frac
    )
    return {
        "pod": P_POD, "rows_per_chip": Mb, "nnz_per_chip": Eb, "K": K,
        "chip_compute_ms": chip_ms,
        "ring_block_MB": round(block_bytes / 1e6, 1),
        "ring_step_ms": round(ring_step_s * 1e3, 2),
        "ring_weak_scaling_eff": round(compute_s / ring_step_s, 3),
        "metis_cut_frac": cut_frac,
        "halo_MB": round(halo_bytes / 1e6, 1),
        "halo_step_ms": round(halo_step_s * 1e3, 2),
        "halo_weak_scaling_eff": round(compute_s / halo_step_s, 3),
        "note": "halo overlap hides transfer iff interior compute >= "
                "halo transfer; METIS layout is what makes that true",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--model", action="store_true")
    ap.add_argument("--chip-ms", type=float, default=None)
    args = ap.parse_args()
    report = {}
    if args.validate:
        report["validate"] = validate()
    if args.chip:
        report["chip"] = chip()
    if args.model or not (args.validate or args.chip):
        report["model"] = model(args.chip_ms)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
