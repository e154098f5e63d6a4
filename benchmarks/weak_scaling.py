"""Weak-scaling benchmark for distributed SpMM (BASELINE.md: >=70%
efficiency at N>=2).

Problem size grows with the mesh: each shard owns a fixed row block
(M_PER, E_PER), so perfect scaling keeps time/step constant as devices
are added.  Efficiency(P) = t(1) / t(P).

On hardware this runs over real chips; without a pod, force a virtual
mesh to validate the harness and the sharded program:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/weak_scaling.py --devices 1 2 4 8

(CPU numbers validate the mechanism, not ICI bandwidth.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(P, M_per, E_per, K, schedule, partitioned=False):
    from timing import device_time

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.parallel import (
        ShardedSparseMatrix, dist_spmm, make_mesh,
    )

    M, E = M_per * P, E_per * P
    rng = np.random.RandomState(0)
    if partitioned:
        # Community graph + METIS layout: the low-cut regime where the
        # halo schedule's referenced-rows-only traffic pays off.
        n_comm = max(8 * P, 16)
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
        A = ts.SparseTensor(
            row=src, col=dst,
            value=jnp.asarray(rng.randn(E).astype(np.float32)),
            sparse_sizes=(M, M),
        ).coalesce("add")
        if P > 1:
            A, _, _ = A.partition(P)
    else:
        A = ts.SparseTensor(
            row=rng.randint(0, M, E), col=rng.randint(0, M, E),
            value=jnp.asarray(rng.randn(E).astype(np.float32)),
            sparse_sizes=(M, M),
        ).coalesce("add")
    mesh = make_mesh(P)
    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    x = Ash.shard_dense(
        jnp.asarray(rng.randn(M, K).astype(np.float32))
    )
    dt = device_time(lambda xs: dist_spmm(Ash, xs, schedule), x)
    # Per-chip bytes on the wire per step (hardware-independent).
    if schedule == "halo":
        wire = (P - 1) * Ash.halo_width * K * 4
    elif schedule == "ring":
        wire = (P - 1) * Ash.Nb * K * 4
    else:  # allgather
        wire = (P - 1) * Ash.Nb * K * 4
    return dt, A.nnz(), wire, Ash.halo_width, Ash.Nb


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--m-per", type=int, default=20_000)
    p.add_argument("--e-per", type=int, default=140_000)
    p.add_argument("--K", type=int, default=128)
    p.add_argument("--schedule", default="ring",
                   choices=["ring", "allgather", "halo"])
    p.add_argument("--partitioned", action="store_true",
                   help="community graph + METIS layout (low-cut regime)")
    args = p.parse_args()

    avail = len(jax.devices())
    print(f"# {avail} devices ({jax.devices()[0].platform}), "
          f"schedule={args.schedule}, K={args.K}, "
          f"M/chip={args.m_per}, E/chip={args.e_per}")
    t1 = None
    for P in args.devices:
        if P > avail:
            print(f"P={P:3d} skipped (only {avail} devices)")
            continue
        dt, nnz, wire, H, Nb = run(P, args.m_per, args.e_per, args.K,
                                   args.schedule, args.partitioned)
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        print(
            f"P={P:3d} {dt*1e3:9.3f} ms/step  {nnz/dt/1e6:9.1f} Mnnz/s  "
            f"weak-scaling eff={eff:5.2f}  wire/chip={wire/1e6:8.1f} MB "
            f"(halo {H}/{Nb} rows)"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
