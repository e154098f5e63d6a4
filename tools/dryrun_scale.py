"""Pod-scale program-health dryrun (VERDICT r4 item 2).

Certifies the distributed schedules BEYOND the 8-device mesh the test
suite uses: builds a P-device virtual CPU mesh (default P=16, optionally
32), shards a papers100M-SHAPED graph over it (per-shard row count and
average degree matched in ratio, scaled to CPU-test size), and

  * jits + runs the ring and halo schedules forward AND backward,
  * checks parity vs the single-device ``matmul`` oracle,
  * records trace+compile wall time against a budget,
  * records the STABLE-HLO program size of the ring step at each P —
    with the rolled ``lax.scan`` ring body (dist.py ``_ring_local``)
    the program must be ~O(1) in P, where the old ``unroll=True`` form
    grew by one inlined gather+reduce body per shard.

Run standalone (forces its own CPU device count; do NOT run inside a
process that already initialized a backend):

    python tools/dryrun_scale.py --devices 16 32 --budget-s 300

Prints one JSON line per P plus an overall verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--budget-s", type=float, default=300.0,
                    help="trace+compile budget per (P, schedule)")
    ap.add_argument("--mb", type=int, default=512,
                    help="rows per shard")
    ap.add_argument("--deg", type=float, default=14.5,
                    help="average degree (papers100M is ~14.5)")
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--hier", action="store_true",
                    help="also certify the DCN x ICI hierarchical "
                         "schedule on a (2, P/2) mesh at each P")
    args = ap.parse_args()

    n_max = max(args.devices)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_max}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n_max)
    except Exception:
        pass
    assert len(jax.devices()) >= n_max, (
        f"{len(jax.devices())} devices < {n_max}; run standalone"
    )

    from pytorch_sparse_tpu import SparseTensor, matmul
    from pytorch_sparse_tpu.parallel import (
        ShardedSparseMatrix, dist_spmm, make_mesh,
    )

    rows_sizes = {}
    ok = True
    for P in args.devices:
        Mb = args.mb
        M = P * Mb
        E = int(M * args.deg)
        rng = np.random.RandomState(7)
        # papers-shaped: power-lawish columns + uniform rows, so shards
        # have both interior and frontier edges.
        row = rng.randint(0, M, E)
        col = (rng.zipf(1.7, E) - 1) % M
        adj = SparseTensor(
            row=jnp.asarray(row.astype(np.int32)),
            col=jnp.asarray(col.astype(np.int32)),
            value=jnp.asarray(rng.rand(E).astype(np.float32)),
            sparse_sizes=(M, M),
        ).coalesce("add")
        mesh = make_mesh(P)
        Ash = ShardedSparseMatrix.from_sparse_tensor(adj, mesh)
        x_full = jnp.asarray(rng.randn(M, args.feat), jnp.float32)
        xs = Ash.shard_dense(x_full)
        want = np.asarray(matmul(adj, x_full, "sum"))

        rec = {"P": P, "M": M, "E": adj.nnz(), "K": args.feat}
        for schedule in ("ring", "halo"):
            def loss(s):
                return (dist_spmm(Ash, s, schedule, "sum") ** 2).sum()

            fwd = jax.jit(
                lambda a, s, _sch=schedule: dist_spmm(a, s, _sch, "sum")
            )
            t0 = time.perf_counter()
            lowered = fwd.lower(Ash, xs)
            hlo_chars = len(lowered.as_text())
            compiled = lowered.compile()
            t_compile = time.perf_counter() - t0
            res = np.asarray(Ash.unshard_dense(compiled(Ash, xs)))
            err = float(np.abs(res - want).max())
            t0 = time.perf_counter()
            g = jax.jit(jax.grad(loss))(xs)
            t_bwd = time.perf_counter() - t0
            grad_ok = bool(jnp.isfinite(g).all())
            rec[schedule] = {
                "compile_s": round(t_compile, 2),
                "bwd_compile_s": round(t_bwd, 2),
                "hlo_chars": hlo_chars,
                "max_err": err,
                "grad_finite": grad_ok,
            }
            rows_sizes.setdefault(schedule, {})[P] = hlo_chars
            if (t_compile > args.budget_s or err > 1e-3 * max(
                    1.0, float(np.abs(want).max())) or not grad_ok):
                ok = False
                rec[schedule]["fail"] = True
        if args.hier and P >= 4 and P % 2 == 0:
            from pytorch_sparse_tpu.parallel import (
                HierShardedSparseMatrix, dist_spmm_hier, make_mesh_hier,
            )

            meshh = make_mesh_hier(2, P // 2)
            Ahh = HierShardedSparseMatrix.from_sparse_tensor(adj, meshh)
            xh = Ahh.shard_dense(x_full)
            t0 = time.perf_counter()
            res = jax.jit(
                lambda a, s: dist_spmm_hier(a, s, "sum")
            )(Ahh, xh)
            got = np.asarray(Ahh.unshard_dense(res))
            t_h = time.perf_counter() - t0
            errh = float(np.abs(got - want).max())
            g = jax.jit(jax.grad(
                lambda s: (dist_spmm_hier(Ahh, s, "sum") ** 2).sum()
            ))(xh)
            gradh = bool(jnp.isfinite(g).all())
            rec["hier_2x%d" % (P // 2)] = {
                "compile_run_s": round(t_h, 2), "max_err": errh,
                "grad_finite": gradh,
            }
            if (t_h > args.budget_s
                    or errh > 1e-3 * max(1.0, float(np.abs(want).max()))
                    or not gradh):
                ok = False
        print(json.dumps(rec), flush=True)

    # Program-size growth check: rolled ring must be ~O(1) in P (table
    # shapes grow with P; the loop body must not be replicated).  Allow
    # 1.6x for the sharded-constant metadata growing with P.
    growth = {}
    for sched, by_p in rows_sizes.items():
        ps = sorted(by_p)
        if len(ps) >= 2:
            growth[sched] = round(
                by_p[ps[-1]] / by_p[ps[0]] / (1.0), 3
            )
            if sched == "ring" and by_p[ps[-1]] > 1.6 * by_p[ps[0]] * (
                    1.0):
                ok = False
    print(json.dumps({"ok": ok, "hlo_growth": growth}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
