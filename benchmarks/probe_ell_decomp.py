"""Decompose the ELL SpMM wall time at ogbn-arxiv scale.

The shipped path measures 3.39 ms while its ideal two-pass traffic
(gather reads 600 MB at the measured ~260 GB/s random-row rate + output
write) models to ~2.5 ms.  This probe times each component of
``ops/kernels/ell.py:ell_spmm`` in isolation on the real chip to locate
the residual and answer, with measurements rather than assumptions:

1. does the final ``inv_perm`` gather (86 MB random rows) cost a full
   extra pass, and can a consumer that tolerates bucket order skip it;
2. does the per-edge ``value`` gather + multiply cost anything beyond
   the fused loop;
3. do the unrolled per-slot gathers actually fuse with the multiply-add
   chain, or does each ``take`` materialize (compare one wide 2-D-index
   gather vs the chain at the same cap);
4. what the raw gather floor is for this table size today.

Usage: ``python benchmarks/probe_ell_decomp.py`` (real TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

jax.config.update("jax_default_matmul_precision", "highest")

import pytorch_sparse_tpu as ts
from pytorch_sparse_tpu.ops.kernels import ell as ellmod

M = 169_343
E = 1_166_243
K = 128


def build():
    rng = np.random.RandomState(0)
    row = np.sort(rng.randint(0, M, E)).astype(np.int32)
    col = rng.randint(0, M, E).astype(np.int32)
    order = np.lexsort((col, row))
    A = ts.SparseTensor(
        row=jnp.asarray(row[order]), col=jnp.asarray(col[order]),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M), is_sorted=True, trust_data=True,
    )
    A.storage.ell()
    A.storage.ell_t()
    # Prefill the baked slot tables too: cache builds are eager-only
    # (storage._tracing — round-4 leak fix), so a cold-baked closure
    # would silently measure the live-value gather path instead.
    A.storage.ell_baked()
    A.storage.ell_t_baked()
    mat = jnp.asarray(rng.randn(M, K).astype(np.float32))
    return A, mat


def report(name, dt, note="", work=None, unit="Mnnz/s"):
    """``work`` is the probe's own work count (edges, rows moved, or
    slots — NOT always whole-graph E); omitted -> no throughput column."""
    rate = f"{work / dt / 1e6:7.1f} {unit}" if work else " " * 15
    print(f"{name:28s} {dt * 1e3:7.3f} ms  {rate}  {note}")


def main():
    A, mat = build()
    ell = A.storage.ell()
    A.storage.ell_t()          # warm BOTH views: lazily-built caches
    value = A.storage.value()  # cannot be created under jit tracing
    print("caps:", ell.caps, " rows/bucket:",
          [int(e.shape[0]) for e in ell.eids])

    # 0. full production path
    dt = device_time(lambda m: ts.spmm_sum(A, m), mat)
    report("full spmm_sum", dt, work=E)

    # 1. raw gather floor: one pass over mat[col] reduced to (K,)
    col = A.storage.col()
    dt = device_time(
        lambda m: m + jnp.sum(jnp.take(m, col, axis=0), axis=0)[None, :],
        mat,
    )
    report("gather+reduce-to-K", dt, "(fusion probe: gather into reduce)",
           work=E)

    # 2. gather genuinely materialized: an optimization_barrier between
    #    the take and the sum keeps XLA from fusing the gather into the
    #    reduce (a scalar multiply would fuse and measure nothing).
    def two_pass(m):
        h = jax.lax.optimization_barrier(jnp.take(m, col, axis=0))
        return m + jnp.sum(h, axis=0)[None, :]

    dt = device_time(two_pass, mat)
    report("gather|barrier|reduce", dt, work=E)

    # 3. ell_spmm minus the final inv_perm gather
    def no_perm(m):
        value_pad = jnp.concatenate([value, jnp.zeros((1,), value.dtype)])
        outs = []
        for eids, idx in zip(ell.eids, ell.idxs):
            vals = jnp.take(value_pad, eids, axis=0)
            outs.append(ellmod._bucket_sum(m, idx, vals))
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    # The step must CONSUME the carry or XLA hoists the whole body out
    # of the timing loop as a loop invariant (measured: a hoisted body
    # reports 0.88 ms for work that takes 3 ms).
    out_bucket = no_perm(mat)
    dt = device_time(
        lambda c, m: no_perm(m + c[:1, :1] * 1e-30), out_bucket, mat
    )
    report("ell minus inv_perm", dt, work=E)

    # 4. the inv_perm gather alone at (M, K): work unit = M rows moved
    out_full = jnp.zeros((M, K), mat.dtype)
    dt = device_time(
        lambda c, o: jnp.take(
            jnp.pad(o + c[:1, :1] * 1e-30, ((0, ell.n_zero), (0, 0))),
            ell.inv_perm, axis=0,
        ),
        out_full, out_bucket,
    )
    report("inv_perm take alone", dt, work=M, unit="Mrow/s")

    # 5. ell_spmm with implicit ones (drop value gather+multiply)
    dt = device_time(lambda m: ellmod.ell_spmm(ell, None, m), mat)
    report("ell value=None", dt, work=E)

    # 5b. BAKED values: pre-gathered (R, cap) slot-layout value tables
    #     (padding slots = 0) replace the per-slot 4 B-granule gather of
    #     value_pad[eids] with contiguous reads — the candidate format
    #     cache for the production path.
    value_pad = jnp.concatenate([value, jnp.zeros((1,), value.dtype)])
    baked = [jnp.take(value_pad, eids, axis=0) for eids in ell.eids]

    def baked_spmm(m):
        outs = [
            ellmod._bucket_sum(m, idx, vals)
            for idx, vals in zip(ell.idxs, baked)
        ]
        stk = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        if ell.n_zero:
            stk = jnp.pad(stk, ((0, ell.n_zero), (0, 0)))
        return jnp.take(stk, ell.inv_perm, axis=0)

    dt = device_time(baked_spmm, mat)
    report("ell baked values (full)", dt, work=E)

    # 6. single bucket at its own cap: 2-D-index gather+sum vs unrolled
    #    chain (fusion probe at cap 8)
    bi = int(np.argmax([e.shape[0] * e.shape[1] for e in ell.eids]))
    idx, eids = ell.idxs[bi], ell.eids[bi]
    cap = idx.shape[1]
    vals = jnp.take(
        jnp.concatenate([value, jnp.zeros((1,), value.dtype)]), eids, axis=0
    )
    En = idx.shape[0] * cap

    def chain(m):
        acc = jnp.take(m, idx[:, 0], axis=0) * vals[:, 0, None]
        for j in range(1, cap):
            acc = acc + jnp.take(m, idx[:, j], axis=0) * vals[:, j, None]
        return acc

    dt = device_time(lambda m: m + jnp.sum(chain(m), axis=0)[None], mat)
    report(f"bucket[{bi}] cap={cap} chain", dt,
           f"(over {En} slots)", work=En, unit="Mslot/s")

    def wide(m):
        h = jnp.take(m, idx, axis=0) * vals[..., None]   # (R, cap, K)
        return jnp.sum(h, axis=1)

    dt = device_time(lambda m: m + jnp.sum(wide(m), axis=0)[None], mat)
    report(f"bucket[{bi}] cap={cap} 2-D take", dt, work=En, unit="Mslot/s")


if __name__ == "__main__":
    main()
