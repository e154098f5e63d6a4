"""Dense-shard (Reddit-density) distributed SpMM: the hybrid local
format's effect on the halo schedule.

The round-2/3 weak-scaling tables use sparse shards (arxiv-like deg 7)
where the group-ELL local compute is the right tool.  Eval-scale
community graphs (Reddit, products) have shards hundreds-dense —
exactly the regime the single-chip router moves onto the MXU.  The
hybrid LOCAL format (parallel/dist.py: per-shard interior dense blocks,
SPMD-uniform padded slot lists, ELL remainder + frontier) does the
same inside the halo schedule.

Modes:

* ``--validate`` (default; works on the forced-CPU 8-device mesh):
  shard the bench community graph 8 ways, run halo with both local
  formats, assert parity vs the single-device oracle, and report the
  wire volume (identical for both — the format only changes local
  compute).
* ``--chip`` (real TPU): calibrate the single-chip rate of ONE shard's
  interior matrix under (a) the ELL-only path and (b) the auto-routed
  format, then project the P=8 v5e halo step for both local formats:
  ``step = max(t_interior, wire/ICI) + t_frontier``.

Usage::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/dense_shard_scaling.py --validate
    python benchmarks/dense_shard_scaling.py --chip
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

jax.config.update("jax_default_matmul_precision", "highest")

ICI_LINK_BW = 45e9
K = 128
P_TARGET = 8


def build_graph():
    """The bench community config (Reddit-10% density), METIS order."""
    from pytorch_sparse_tpu.testing import community_graph

    M = 23_296
    return community_graph(M, 16_000_000, n_comm=30, seed=1,
                           equal_sizes=True), M


def interior_of_shard(A, p, P):
    """Shard p's interior (own-block) submatrix as a SparseTensor."""
    import pytorch_sparse_tpu as ts

    M = A.sparse_size(0)
    Mb = -(-M // P)
    row = np.asarray(A.storage.numpy_view("row"))
    col = np.asarray(A.storage.numpy_view("col"))
    val = np.asarray(A.storage.value())
    sel = (row // Mb == p) & (col // Mb == p)
    return ts.SparseTensor(
        row=jnp.asarray((row[sel] - p * Mb).astype(np.int32)),
        col=jnp.asarray((col[sel] - p * Mb).astype(np.int32)),
        value=jnp.asarray(val[sel]),
        sparse_sizes=(Mb, Mb), is_sorted=True, trust_data=True,
    )


def validate():
    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.parallel import (
        ShardedSparseMatrix, dist_spmm, make_mesh,
    )

    A, M = build_graph()
    mesh = make_mesh(P_TARGET)
    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    assert Ash.has_interior_blocks(), (
        "dense shards must clear the interior-block break-even"
    )
    nbm = Ash.int_blocks.shape[1] - 1
    rest = sum(int(np.prod(t.shape[1:])) for t in Ash.rest_itabs)
    print(f"P={P_TARGET}  Mb={Ash.Mb}  H={Ash.halo_width}  "
          f"interior block slots/shard={nbm}  rest slots/shard~{rest}")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    xs = Ash.shard_dense(x)
    want = np.asarray(ts.matmul(A, x, "sum"))
    for fmt in ("ell", "hybrid"):
        got = np.asarray(Ash.unshard_dense(
            jax.jit(dist_spmm, static_argnums=(2, 3, 4))(
                Ash, xs, "halo", "sum", fmt
            )
        ))
        scale = np.abs(want).max()
        err = np.abs(got - want).max() / scale
        wire = (P_TARGET - 1) * Ash.halo_width * K * 4
        print(f"halo/{fmt:6s}: rel err {err:.2e}  "
              f"wire {wire / 1e6:.1f} MB/chip/step")
        assert err < 1e-3, (fmt, err)
    print("validate OK: both local formats match the single-device "
          "oracle; wire identical (the format changes only local "
          "compute)")


def chip():
    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.ops.kernels import ell as ellmod

    A, M = build_graph()
    P = P_TARGET
    Mb = -(-M // P)
    # wire + frontier stats (host-side; no mesh needed)
    row = np.asarray(A.storage.numpy_view("row"))
    col = np.asarray(A.storage.numpy_view("col"))
    owner = row // Mb
    frontier = (col // Mb) != owner
    e_fr = int(np.bincount(owner[frontier], minlength=P).max())
    e_int = int(np.bincount(owner[~frontier], minlength=P).max())
    H = 0
    for p in range(P):
        for q in range(P):
            if p == q:
                continue
            sel = (owner == p) & (col // Mb == q)
            H = max(H, np.unique(col[sel]).size)
    wire = (P - 1) * H * K * 4

    Ai = interior_of_shard(A, 0, P)
    E_i = int(Ai.nnz())
    x = jnp.asarray(
        np.random.RandomState(2).randn(Mb, K).astype(np.float32)
    )
    # (a) ELL-only local rate
    Ai.storage.ell()
    Ai.storage.ell_baked()
    ell, baked = Ai.storage.ell(), Ai.storage.ell_baked()
    dt_ell = device_time(
        lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
        x, ell, baked, n_lo=2, n_hi=6,
    )
    r_ell = E_i / dt_ell
    print(f"shard interior ({Mb} rows, {E_i} nnz): ELL "
          f"{dt_ell * 1e3:.2f} ms = {r_ell / 1e9:.2f} Gnnz/s")
    # (b) auto-routed local rate (the hybrid local format's block pass).
    # The routed matmul is ~0.04 ms at this shard shape — far below the
    # tunnel's slope resolution at short chains — so chain it hundreds
    # deep.
    Bi = interior_of_shard(A, 0, P)
    h = Bi.storage.hybrid()
    dt_hyb = device_time(
        lambda m, a: ts.spmm_sum(a, m), x, Bi, n_lo=8, n_hi=264,
    )
    r_hyb = E_i / dt_hyb
    print(f"shard interior routed ({type(h).__name__}): "
          f"{dt_hyb * 1e3:.2f} ms = {r_hyb / 1e9:.2f} Gnnz/s")
    # (c) the frontier, measured both ways on the worst shard's real
    # structures: group-ELL gathers over the halo buffer vs the dense
    # frontier store (round-4 route: one read-bound MXU matmul of the
    # (Mb, P*H) baked bipartite matrix against the received buffer).
    from pytorch_sparse_tpu.parallel.dist import (
        _build_group_ell, _group_ell_apply,
    )
    from pytorch_sparse_tpu.ops.kernels.hybrid import _mxu_einsum, _prec

    val = np.asarray(A.storage.value())
    p_worst = int(np.argmax(np.bincount(owner[frontier], minlength=P)))
    selp = (owner == p_worst) & frontier
    rf = (row[selp] - p_worst * Mb).astype(np.int64)
    cf, vf = col[selp], val[selp]
    qf = cf // Mb
    buf = np.zeros(rf.shape[0], np.int64)
    for q in range(P):
        sq = qf == q
        if q == p_worst or not sq.any():
            continue
        u = np.unique(cf[sq])
        buf[sq] = q * H + np.searchsorted(u, cf[sq])
    PH = P * H
    halo = jnp.asarray(
        np.random.RandomState(3).randn(PH, K).astype(np.float32)
    )
    fr_itabs, fr_vtabs, _e, fr_inv, _c = _build_group_ell(
        [(rf, buf, vf.astype(np.float32), np.zeros_like(rf))],
        Mb, sentinel=PH,
    )
    # device_time chains through a fori_loop: the carry (halo) must keep
    # its shape, so fold the (Mb, K) output to (1, K) and broadcast-add
    # (~12 MB of extra traffic per step, 2-3% of the measured quantity).
    dt_fr_ell = device_time(
        lambda hb, it, vt, iv: hb + _group_ell_apply(
            [t[0] for t in it], [t[0] for t in vt], iv[0], hb
        ).sum(0, keepdims=True),
        halo, fr_itabs, fr_vtabs, fr_inv, n_lo=2, n_hi=6,
    )
    print(f"frontier worst shard ({rf.size} edges, buffer {PH} rows): "
          f"group-ELL {dt_fr_ell * 1e3:.2f} ms")
    import ml_dtypes

    frd_np = np.zeros((1, Mb, PH), np.float32)
    np.add.at(frd_np, (0, rf, buf), vf.astype(np.float32))
    t_frd = {}
    for sdt, lbl in ((np.float32, "f32"), (ml_dtypes.bfloat16, "bf16")):
        frd = jnp.asarray(frd_np.astype(sdt))
        dt = device_time(
            lambda hb, fd: hb + _mxu_einsum(
                "sbc,sck->sbk", jnp.float32, _prec(None), fd, hb[None]
            )[0].sum(0, keepdims=True),
            halo, frd, n_lo=8, n_hi=136,
        )
        t_frd[lbl] = dt
        print(f"frontier dense store [{lbl}] ({Mb}x{PH}, "
              f"{frd_np.nbytes * (1 if lbl == 'f32' else 0.5) / 1e6:.0f}"
              f" MB): {dt * 1e3:.2f} ms")
    t_wire = wire / (P - 1) / ICI_LINK_BW
    print(f"wire/chip/step {wire / 1e6:.1f} MB  (per-peer leg "
          f"{t_wire * 1e3:.3f} ms on ICI)")
    routes = (
        ("ell", e_int / r_ell, dt_fr_ell),
        ("hybrid", e_int / r_hyb, dt_fr_ell),
        ("hyb+frd32", e_int / r_hyb, t_frd["f32"]),
        ("hyb+frd16", e_int / r_hyb, t_frd["bf16"]),
    )
    for name, t_int, t_fr in routes:
        step = max(t_int, wire / ICI_LINK_BW) + t_fr
        print(f"projected v5e halo step (local={name:9s}): "
              f"{step * 1e3:.2f} ms  (interior {t_int * 1e3:.2f}, "
              f"wire {wire / ICI_LINK_BW * 1e3:.2f}, "
              f"frontier {t_fr * 1e3:.2f})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chip", action="store_true")
    p.add_argument("--validate", action="store_true")
    args = p.parse_args()
    if args.chip:
        chip()
    else:
        validate()


if __name__ == "__main__":
    main()
