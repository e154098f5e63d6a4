"""Measure hybrid dense-part formulations on the bench community graph.

Round-3 rework landed the slot-batched formulation (one batched matmul
over occupied blocks + sorted segment-sum — ``ops/kernels/hybrid.py``)
replacing the round-2 (R, W) sentinel-padded W-loop.  This probe
records, on the real chip:

1. the production auto-routed path (``ts.spmm_sum`` — DenseFormat at
   this density);
2. the slot-batched hybrid at B in {256, 512, 1024}, DEFAULT and
   HIGHEST block-dot precision;
3. the whole-matrix dense matmul, f32 and bf16 storage.

Usage: ``python benchmarks/probe_hybrid_forms.py`` (real TPU).
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
from pytorch_sparse_tpu.ops.kernels.hybrid import (
    block_break_even, build_dense, build_hybrid, dense_spmm, hybrid_spmm,
)

M = 23_296
K = 128
HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT


def main():
    from pytorch_sparse_tpu.testing import community_graph

    A = community_graph(M, 16_000_000, n_comm=30, seed=1, equal_sizes=True)
    E = int(A.nnz())
    row = A.storage.numpy_view("row")
    col = A.storage.numpy_view("col")
    val = np.asarray(A.storage.value())
    mat = jnp.asarray(np.random.RandomState(2).randn(M, K).astype(np.float32))
    print(f"graph: M={M} E={E} density={E / M / M:.4f} "
          f"break_even(B=512)={block_break_even(512):.4f}", flush=True)

    ref = None

    def check(out):
        nonlocal ref
        o = np.asarray(out[:512])
        if ref is None:
            ref = o
            return "(ref)"
        return f"maxerr={np.abs(o - ref).max() / np.abs(ref).max():.2e}"

    # production auto-routed path
    out = ts.spmm_sum(A, mat)
    note = check(out)
    dt = device_time(lambda m: ts.spmm_sum(A, m), mat)
    routed = type(A.storage.hybrid()).__name__
    print(f"auto ({routed:12s})          {dt * 1e3:7.3f} ms "
          f"{E / dt / 1e9:5.2f} Gnnz/s  {note}", flush=True)

    for B in (256, 512, 1024):
        h = build_hybrid(row, col, val, M, M, B=B)
        rest = 0 if h.ell is None else int(h.ell[0].E)
        print(f"B={B}: nb={h.nb} dense_nnz={h.dense_nnz} "
              f"({h.dense_nnz / E:.1%}) rest={rest} "
              f"block_store={h.nb * B * B * 4 / 1e6:.0f} MB", flush=True)
        for prec, pname in ((DEF, "DEFAULT"), (HI, "HIGHEST")):
            f = lambda m: hybrid_spmm(h, m, precision=prec)
            note = check(f(mat))
            dt = device_time(f, mat)
            print(f"  slot-batched {pname:8s} {dt * 1e3:7.3f} ms "
                  f"{E / dt / 1e9:5.2f} Gnnz/s  {note}", flush=True)

    d32 = build_dense(row, col, val, M, M)
    for dname, D in (("f32", d32),
                     ("bf16", build_dense(row, col, val, M, M,
                                          dtype=jnp.bfloat16))):
        for prec, pname in ((DEF, "DEFAULT"), (HI, "HIGHEST")):
            if dname == "bf16" and pname == "HIGHEST":
                continue
            f = lambda m: dense_spmm(D, m, precision=prec)
            note = check(f(mat))
            dt = device_time(f, mat)
            print(f"full dense {dname} {pname:8s}   {dt * 1e3:7.3f} ms "
                  f"{E / dt / 1e9:5.2f} Gnnz/s  {note}", flush=True)


if __name__ == "__main__":
    main()
