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

# Measured single-chip (fwd+bwd)/fwd SpMM time ratio (v5e, fp32, K=128:
# 6.5 ms fwd+bwd vs 3.5 ms fwd at arxiv scale, BASELINE.md; calibrate at
# the shard shape with --chip-shard --bwd).  The backward runs the
# transpose SpMM (grad_mat) plus the per-edge dot (grad_value).
DEFAULT_R_BWD = 1.86

# DCN egress available to ONE SLICE (the hierarchical schedule's binding
# cross-slice resource; scaling-book order of magnitude).
DCN_SLICE_BW = 25e9


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


def chip_shard_time(M_per, E_per, K, bwd=False):
    """Single-chip SpMM time for one shard's worth of work on the
    CURRENT device (run with the TPU attached to calibrate chip_rate).
    ``bwd`` additionally measures the fwd+bwd step to calibrate the
    backward ratio ``r_bwd`` used by the training projection."""
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
    A.storage.ell_t()
    x = jnp.asarray(rng.randn(M_per, K).astype(np.float32))
    dt = device_time(lambda m, a: ts.spmm_sum(a, m), x, A)
    rate = A.nnz() / dt
    print(f"# chip shard ({M_per} rows, {A.nnz()} nnz, K={K}): "
          f"{dt*1e3:.3f} ms -> {rate/1e6:.1f} Mnnz/s")
    if bwd:
        def step(m, a):
            loss, grads = jax.value_and_grad(
                lambda mm: jnp.sum(ts.spmm_sum(a, mm) ** 2)
            )(m)
            return grads
        dtb = device_time(step, x, A)
        print(f"# fwd+bwd: {dtb*1e3:.3f} ms -> r_bwd={dtb/dt:.2f}")
        return rate, dtb / dt
    return rate


def project_v5e_train(stats, P, schedule, chip_rate,
                      r_bwd=DEFAULT_R_BWD, hosts=1):
    """Projected v5e time for ONE SpMM layer's forward + backward.

    The backward of every schedule differentiates through the forward's
    collective, producing a transpose-direction collective of the SAME
    byte count (all_to_all^T = all_to_all; ppermute^T = reverse
    ppermute; all_gather^T = reduce_scatter), so bwd wire == fwd wire.
    Backward compute (transpose SpMM + per-edge grad dot) is
    ``(r_bwd - 1)`` x the forward SpMM (measured single-chip ratio).
    Overlap structure mirrors the forward: the halo interior backward
    has no data dependence on the reverse exchange; ring legs overlap
    per-bucket backward; allgather's reduce_scatter is exposed.
    """
    b = r_bwd - 1.0
    t_all = stats["e_shard"] / chip_rate
    if P == 1:
        return t_all * r_bwd
    pkt = stats["wire"] / (P - 1)
    h = max(1, P // max(1, hosts))
    ici_chip = (h - 1) * pkt
    dcn_host = h * (P - h) * pkt
    t_wire = max(ici_chip / ICI_LINK_BW, dcn_host / DCN_HOST_BW)
    t_fr = stats["e_frontier"] / chip_rate
    t_int = t_all - t_fr
    if schedule == "halo":
        fwd = max(t_int, t_wire) + t_fr
        bwd = max(b * t_int, t_wire) + b * t_fr
        return fwd + bwd
    if schedule == "ring":
        per_leg = max(pkt / ICI_LINK_BW,
                      pkt / DCN_HOST_BW if hosts > 1 else 0.0)
        fwd = t_all + max(0.0, per_leg - t_all / P) * (P - 1)
        bwd = b * t_all + max(0.0, per_leg - b * t_all / P) * (P - 1)
        return fwd + bwd
    # allgather: transfer exposed in both directions
    return r_bwd * t_all + 2 * t_wire


def hier_stats(A, S, C, K):
    """Wire + compute split of the hierarchical schedule on an (S, C)
    DCN x ICI mesh (built on the virtual mesh; byte counts are
    hardware-independent)."""
    from pytorch_sparse_tpu.parallel import (
        HierShardedSparseMatrix, make_mesh_hier,
    )

    P_ = S * C
    Ah = HierShardedSparseMatrix.from_sparse_tensor(
        A, make_mesh_hier(S, C)
    )
    rep = Ah.wire_report(K=K)
    row = np.asarray(A.storage.row())
    col = np.asarray(A.storage.col())
    owner = row // Ah.Mb
    frontier = (col // Ah.Nb) != owner
    e_fr = np.bincount(owner[frontier], minlength=P_).max()
    e_all = np.bincount(owner, minlength=P_).max()
    return dict(
        rep=rep, e_shard=int(e_all), e_frontier=int(e_fr), Ah=Ah,
    )


def project_hier_train(hs, S, C, chip_rate, r_bwd=DEFAULT_R_BWD,
                       fwd_only=False):
    """Projected v5e step time of the hierarchical schedule: interior
    compute overlaps BOTH the slice-deduped DCN exchange (per-slice
    egress budget) and the ICI legs; frontier compute follows.  The
    backward reverses each collective at identical byte counts."""
    b = r_bwd - 1.0
    P_ = S * C
    rep = hs["rep"]
    dcn_slice = rep["dcn_bytes_hier"] / max(S, 1)
    ici_chip = rep["ici_bytes"] / P_
    t_wire = max(dcn_slice / DCN_SLICE_BW, ici_chip / ICI_LINK_BW)
    t_all = hs["e_shard"] / chip_rate
    t_fr = hs["e_frontier"] / chip_rate
    t_int = t_all - t_fr
    fwd = max(t_int, t_wire) + t_fr
    if fwd_only:
        return fwd
    bwd = max(b * t_int, t_wire) + b * t_fr
    return fwd + bwd


def _measure_train_step(A, P, K, schedule, m_per):
    """One measured DistGCN train step (2 layers, adam) on the CURRENT
    devices.  On the virtual CPU mesh this validates that the full
    fwd+bwd+update program compiles and runs under every schedule; the
    wall time divides one core across P shards, so it is evidence, not
    an efficiency number."""
    import time

    import optax

    from pytorch_sparse_tpu.models.dist_gcn import DistGCN
    from pytorch_sparse_tpu.parallel import (
        HierShardedSparseMatrix, ShardedSparseMatrix, make_mesh,
        make_mesh_hier,
    )

    H, Cn = 64, 16
    if schedule.startswith("hier"):
        S, C = map(int, schedule[4:].split("x"))
        mesh = make_mesh_hier(S, C)
        Ash = HierShardedSparseMatrix.from_sparse_tensor(A, mesh)
        sched_arg = None
    else:
        Ash = ShardedSparseMatrix.from_sparse_tensor(A, make_mesh(P))
        sched_arg = schedule
    rng = np.random.RandomState(3)
    M = m_per * P
    x = Ash.shard_dense(jnp.asarray(rng.randn(M, K).astype(np.float32)))
    y = jnp.pad(
        jnp.asarray(rng.randint(0, Cn, M)), (0, Ash.P * Ash.Nb - M)
    ).reshape(Ash.P, Ash.Nb)
    mask = jnp.pad(
        jnp.ones(M, np.float32), (0, Ash.P * Ash.Nb - M)
    ).reshape(Ash.P, Ash.Nb)
    params = DistGCN.init(jax.random.PRNGKey(0), K, H, Cn)
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, x):
        return DistGCN.train_step(params, ost, Ash, x, y, mask, opt,
                                  sched_arg)

    params, ost, loss = step(params, ost, x)   # compile + 1st step
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        params, ost, loss = step(params, ost, x)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / 3, float(loss)


def _train_mode(args, avail):
    """Training-step weak scaling: fwd+bwd projection table (VERDICT
    round-2 item 2) for flat schedules at each P and the hierarchical
    schedule at (S, C) splits of max P, plus measured virtual-mesh
    DistGCN train steps as compile/run evidence."""
    K, r_bwd, rate = args.K, args.r_bwd, args.chip_rate
    print(f"# TRAIN weak scaling: r_bwd={r_bwd:.2f}, "
          f"DCN={DCN_SLICE_BW/1e9:.0f} GB/s/slice; backward wire == "
          f"forward wire (transpose collectives)")
    print("schedule    P   wire(f+b)/chip  v5e fwd ms  v5e f+b ms  "
          "eff(fwd)  eff(f+b)")
    for schedule in ("halo", "ring", "allgather"):
        for P in args.devices:
            if P > avail:
                continue
            st = run(P, args.m_per, args.e_per, K, schedule,
                     True, args.intra)
            t1f = st["e_shard"] / rate
            t1 = t1f * r_bwd
            pf = project_v5e(st, P, schedule, rate)
            pt = project_v5e_train(st, P, schedule, rate, r_bwd)
            print(f"{schedule:9s} {P:3d}   {2*st['wire']/1e6:10.1f} MB"
                  f"   {pf*1e3:9.3f}   {pt*1e3:9.3f}   "
                  f"{t1f/pf:6.2f}    {t1/pt:6.2f}")
            sys.stdout.flush()
    # hierarchical rows at (S, C) splits of max P
    P = min(max(args.devices), avail)
    A = _graph(P, args.m_per, args.e_per, True, args.intra)
    for S in (2, 4):
        if P % S or S >= P:
            continue
        C = P // S
        hs = hier_stats(A, S, C, K)
        rep = hs["rep"]
        t1f = hs["e_shard"] / rate
        t1 = t1f * r_bwd
        pf = project_hier_train(hs, S, C, rate, r_bwd, fwd_only=True)
        pt = project_hier_train(hs, S, C, rate, r_bwd)
        wire = 2 * (rep["dcn_bytes_hier"] + rep["ici_bytes"]) / P
        print(f"hier{S}x{C:<4d} {P:3d}   {wire/1e6:10.1f} MB"
              f"   {pf*1e3:9.3f}   {pt*1e3:9.3f}   "
              f"{t1f/pf:6.2f}    {t1/pt:6.2f}"
              f"   (DCN {rep['dcn_bytes_hier']/1e6:.1f} MB hier vs "
              f"{rep['dcn_bytes_flat']/1e6:.1f} flat, "
              f"{rep['dcn_dedup_factor']:.2f}x dedup)")
        sys.stdout.flush()
    # measured train steps on this host's mesh (evidence, not efficiency)
    print("# measured DistGCN train step (2 layers, adam) on this "
          "host's mesh:")
    scheds = ["halo", "ring", "allgather"]
    for S in (2, 4):
        if P % S == 0 and S < P:
            scheds.append(f"hier{S}x{P // S}")
    for schedule in scheds:
        dt, loss = _measure_train_step(A, P, K, schedule, args.m_per)
        print(f"  {schedule:10s} {dt*1e3:9.3f} ms/step  loss={loss:.4f}")
        sys.stdout.flush()


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
    p.add_argument("--bwd", action="store_true",
                   help="with --chip-shard: also measure fwd+bwd to "
                        "calibrate r_bwd")
    p.add_argument("--r-bwd", type=float, default=DEFAULT_R_BWD,
                   help="measured single-chip (fwd+bwd)/fwd time ratio")
    p.add_argument("--train", action="store_true",
                   help="TRAINING-step weak scaling: fwd+bwd wire "
                        "accounting per schedule (incl. the hierarchical "
                        "DCN x ICI rows) + a measured DistGCN train step "
                        "on the virtual mesh")
    p.add_argument("--hierarchy", action="store_true",
                   help="ICI/DCN hierarchy sweep: halo schedule at max P "
                        "over hosts x feature-shards, projected step time")
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="force the CPU platform with N virtual devices "
                        "(the container's sitecustomize re-pins "
                        "JAX_PLATFORMS=axon over the shell env, so the "
                        "override must happen in-process)")
    args = p.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()
        jax.config.update("jax_platforms", "cpu")

    if args.chip_shard:
        chip_shard_time(args.m_per, args.e_per, args.K, bwd=args.bwd)
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

    if args.train:
        _train_mode(args, avail)
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
