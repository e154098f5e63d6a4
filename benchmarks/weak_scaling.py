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


# v5e ICI: 4 links/chip; a 1-D ring uses one link per direction.
# ~45 GB/s usable per link per direction (scaling-book numbers).
ICI_LINK_BW = 45e9

# Inter-host DCN: ~25 GB/s per host egress (scaling-book order of
# magnitude for pod-to-pod ethernet); shared by all chips on the host.
DCN_HOST_BW = 25e9

# Measured single-chip scatter-free SpMM rate at this shard shape
# (v5e, fp32, K=128; see --chip-shard and BASELINE.md).  Overridable.
DEFAULT_CHIP_RATE = 344e6  # nnz/s


def _graph(P, M_per, E_per, partitioned, intra=0.9, seed=0):
    import pytorch_sparse_tpu as ts

    M, E = M_per * P, E_per * P
    rng = np.random.RandomState(seed)
    if partitioned:
        # Community graph + METIS layout: the low-cut regime where the
        # halo schedule's referenced-rows-only traffic pays off.
        from pytorch_sparse_tpu.testing import community_graph

        A = community_graph(M, E, n_comm=max(8 * P, 16), intra_p=intra,
                            rng=rng)
        if P > 1:
            A, _, _ = A.partition(P)
    else:
        A = ts.SparseTensor(
            row=rng.randint(0, M, E), col=rng.randint(0, M, E),
            value=jnp.asarray(rng.randn(E).astype(np.float32)),
            sparse_sizes=(M, M),
        ).coalesce("add")
    return A


def run(P, M_per, E_per, K, schedule, partitioned=False, intra=0.9,
        A=None):
    from timing import device_time

    from pytorch_sparse_tpu.parallel import (
        ShardedSparseMatrix, dist_spmm, make_mesh,
    )

    if A is None:
        A = _graph(P, M_per, E_per, partitioned, intra)
    mesh = make_mesh(P)
    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    rng = np.random.RandomState(1)
    x = Ash.shard_dense(
        jnp.asarray(rng.randn(M_per * P, K).astype(np.float32))
    )
    dt = device_time(lambda xs: dist_spmm(Ash, xs, schedule), x)
    # Per-chip bytes on the wire per step (hardware-independent).
    if schedule == "halo":
        wire = (P - 1) * Ash.halo_width * K * 4
    else:  # ring and allgather both move every remote block
        wire = (P - 1) * Ash.Nb * K * 4
    # interior/frontier split (for the overlap model)
    row = np.asarray(A.storage.row())
    col = np.asarray(A.storage.col())
    owner = row // Ash.Mb
    frontier = (col // Ash.Nb) != owner
    e_fr = np.bincount(owner[frontier], minlength=P).max() if P > 1 else 0
    e_all = np.bincount(owner, minlength=P).max()
    return dict(
        dt=dt, nnz=A.nnz(), wire=wire, H=Ash.halo_width, Nb=Ash.Nb,
        e_shard=int(e_all), e_frontier=int(e_fr),
    )


def project_v5e(stats, P, schedule, chip_rate, hosts=1, pf=1):
    """Projected v5e step time: measured per-chip wire bytes over one
    ICI ring link, overlapped with the compute phase that has no data
    dependence on the exchange (interior for halo, rotating buckets for
    ring; allgather exposes the full transfer).

    ``hosts`` splits the data axis into an ICI/DCN hierarchy: with
    ``h = P/hosts`` chips per host, ``h-1`` of each chip's ``P-1`` halo
    packets ride ICI and the rest cross DCN, whose per-HOST egress
    (DCN_HOST_BW, shared by the host's chips) is the binding resource.
    ``pf`` models a 2-D (row x feature) mesh (``make_mesh2d``): every
    packet carries K/pf features, so all wire bytes divide by ``pf``
    (at the cost of pf x more chips for the same row count).
    """
    if P == 1:
        return stats["e_shard"] / chip_rate
    pkt = stats["wire"] / (P - 1) / pf      # bytes per (chip, peer) leg
    h = max(1, P // max(1, hosts))          # chips per host
    ici_chip = (h - 1) * pkt
    dcn_host = h * (P - h) * pkt
    t_wire = max(ici_chip / ICI_LINK_BW, dcn_host / DCN_HOST_BW)
    t_all = stats["e_shard"] / chip_rate
    t_fr = stats["e_frontier"] / chip_rate
    t_int = t_all - t_fr
    if schedule == "halo":
        # interior SpMM overlaps the all_to_all; frontier follows.
        return max(t_int, t_wire) + t_fr
    if schedule == "ring":
        # each of P-1 transfers overlaps one bucket's compute; a ring
        # neighbor step crosses DCN only at the hosts' seams, so charge
        # the slower of the two links per step.
        per_leg = max(pkt / ICI_LINK_BW, pkt / DCN_HOST_BW
                      if hosts > 1 else 0.0)
        per = t_all / P
        return t_all + max(0.0, per_leg - per) * (P - 1)
    return t_all + t_wire  # allgather: transfer exposed up front


def chip_shard_time(M_per, E_per, K):
    """Single-chip SpMM time for one shard's worth of work on the
    CURRENT device (run with the TPU attached to calibrate chip_rate)."""
    from timing import device_time

    import pytorch_sparse_tpu as ts

    rng = np.random.RandomState(0)
    A = ts.SparseTensor(
        row=rng.randint(0, M_per, E_per),
        col=rng.randint(0, M_per, E_per),
        value=jnp.asarray(rng.randn(E_per).astype(np.float32)),
        sparse_sizes=(M_per, M_per),
    ).coalesce("add")
    A.storage.ell()
    x = jnp.asarray(rng.randn(M_per, K).astype(np.float32))
    dt = device_time(lambda m, a: ts.spmm_sum(a, m), x, A)
    rate = A.nnz() / dt
    print(f"# chip shard ({M_per} rows, {A.nnz()} nnz, K={K}): "
          f"{dt*1e3:.3f} ms -> {rate/1e6:.1f} Mnnz/s")
    return rate


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
    p.add_argument("--intra", type=float, default=0.9,
                   help="intra-community edge probability")
    p.add_argument("--table", action="store_true",
                   help="full efficiency table: all schedules x P, with "
                        "measured wire bytes and v5e ICI projection")
    p.add_argument("--crossover", action="store_true",
                   help="halo-vs-ring crossover sweep over --intra values")
    p.add_argument("--chip-rate", type=float, default=DEFAULT_CHIP_RATE,
                   help="measured single-chip SpMM rate (nnz/s) for the "
                        "v5e projection; calibrate with --chip-shard")
    p.add_argument("--chip-shard", action="store_true",
                   help="measure the single-chip per-shard SpMM rate on "
                        "the current device and exit")
    p.add_argument("--hierarchy", action="store_true",
                   help="ICI/DCN hierarchy sweep: halo schedule at max P "
                        "over hosts x feature-shards, projected step time")
    args = p.parse_args()

    if args.chip_shard:
        chip_shard_time(args.m_per, args.e_per, args.K)
        return

    avail = len(jax.devices())
    print(f"# {avail} devices ({jax.devices()[0].platform}), K={args.K}, "
          f"M/chip={args.m_per}, E/chip={args.e_per}, "
          f"chip_rate={args.chip_rate/1e6:.0f} Mnnz/s, "
          f"ICI={ICI_LINK_BW/1e9:.0f} GB/s/link")

    if args.crossover:
        # Wire volume + projected efficiency as the METIS cut grows:
        # the halo-vs-ring crossover chart (VERDICT round-1 item 3).
        P = min(8, avail)
        print(f"# crossover sweep at P={P} (partitioned graphs)")
        print("intra   cut%   halo MB   ring MB   eff(halo)  eff(ring)")
        for intra in (0.5, 0.7, 0.8, 0.9, 0.95, 0.99):
            sh = run(P, args.m_per, args.e_per, args.K, "halo",
                     True, intra)
            t1 = sh["e_shard"] / args.chip_rate
            th = project_v5e(sh, P, "halo", args.chip_rate)
            tr = project_v5e(sh, P, "ring", args.chip_rate)
            cut = sh["e_frontier"] / max(sh["e_shard"], 1)
            ring_wire = (P - 1) * sh["Nb"] * args.K * 4
            print(f"{intra:5.2f}  {cut*100:5.1f}  {sh['wire']/1e6:8.1f}"
                  f"  {ring_wire/1e6:8.1f}     {t1/th:5.2f}      "
                  f"{t1/tr:5.2f}")
            sys.stdout.flush()
        return

    if args.hierarchy:
        # DCN/ICI hierarchy: the same measured halo wire, projected with
        # the data axis split across hosts (DCN_HOST_BW per host egress)
        # and optionally a 2-D feature axis (make_mesh2d) dividing every
        # packet by pf.  Shows where DCN binds and how feature sharding
        # buys the headroom back.
        P = min(8, avail)
        A = _graph(P, args.m_per, args.e_per, args.partitioned, args.intra)
        st = run(P, args.m_per, args.e_per, args.K, "halo",
                 args.partitioned, args.intra, A=A)
        t1 = st["e_shard"] / args.chip_rate
        print(f"# hierarchy sweep: halo, P={P}, wire/chip="
              f"{st['wire']/1e6:.1f} MB, DCN={DCN_HOST_BW/1e9:.0f} "
              f"GB/s/host")
        print("hosts  pf   proj ms/step   eff")
        for hosts in (1, 2, 4, 8):
            if hosts > P:
                continue
            for pf in (1, 2, 4):
                proj = project_v5e(st, P, "halo", args.chip_rate,
                                   hosts=hosts, pf=pf)
                print(f"{hosts:5d}  {pf:2d}   {proj*1e3:10.3f}   "
                      f"{t1/proj:5.2f}")
        # Measured slice-level union dedup of the hierarchical schedule
        # (parallel/hier.py): the flat projection above charges every
        # (chip, remote row) reference across DCN; the hier schedule
        # sends each remote row once per requesting SLICE.
        from pytorch_sparse_tpu.parallel import (
            HierShardedSparseMatrix, make_mesh_hier,
        )

        for S in (2, 4):
            if P % S or S >= P:
                continue
            Ah = HierShardedSparseMatrix.from_sparse_tensor(
                A, make_mesh_hier(S, P // S)
            )
            rep = Ah.wire_report(K=args.K)
            print(f"hier S={S} C={P//S}: DCN "
                  f"{rep['dcn_bytes_flat']/1e6:.1f} MB flat -> "
                  f"{rep['dcn_bytes_hier']/1e6:.1f} MB union "
                  f"({rep['dcn_dedup_factor']:.2f}x), "
                  f"ICI {rep['ici_bytes']/1e6:.1f} MB")
        sys.stdout.flush()
        return

    schedules = (
        ["halo", "ring", "allgather"] if args.table else [args.schedule]
    )
    for schedule in schedules:
        t1 = None
        p1 = None
        for P in args.devices:
            if P > avail:
                print(f"P={P:3d} skipped (only {avail} devices)")
                continue
            st = run(P, args.m_per, args.e_per, args.K, schedule,
                     args.partitioned, args.intra)
            if t1 is None:
                t1 = st["dt"]
                p1 = project_v5e(st, 1, schedule, args.chip_rate)
            eff = t1 / st["dt"]
            proj = project_v5e(st, P, schedule, args.chip_rate)
            print(
                f"{schedule:9s} P={P:3d} {st['dt']*1e3:9.3f} ms/step "
                f"(this host, eff={eff:5.2f})  wire/chip="
                f"{st['wire']/1e6:8.1f} MB  v5e-projected "
                f"{proj*1e3:7.3f} ms/step, eff={p1/proj:5.2f}"
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
