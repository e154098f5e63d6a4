"""Benchmark the Pallas sorted-segment reduce + full SpMM on the TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

from pytorch_sparse_tpu.ops.kernels.spmm_pallas import (
    build_chunk_table, sorted_segment_reduce_matmul,
)


def main():
    M = 169_343
    E = 1_166_243
    K = 128

    rng = np.random.RandomState(0)
    row_np = np.sort(rng.randint(0, M, E)).astype(np.int32)
    col_np = rng.randint(0, M, E).astype(np.int32)
    row = jnp.asarray(row_np)
    col = jnp.asarray(col_np)
    val = jnp.asarray(rng.randn(E).astype(np.float32))
    mat = jnp.asarray(rng.randn(M, K).astype(np.float32))

    rowptr = np.zeros(M + 1, np.int64)
    np.add.at(rowptr, row_np + 1, 1)
    rowptr = np.cumsum(rowptr)

    for TM, C in [(128, 2048), (128, 1024), (256, 2048), (256, 4096),
                  (512, 4096), (128, 4096)]:
        cb, ce, fi, nb = build_chunk_table(rowptr, M, TM, C)
        cb, ce, fi = jnp.asarray(cb), jnp.asarray(ce), jnp.asarray(fi)

        def full_spmm(m, cb=cb, ce=ce, fi=fi, TM=TM, C=C):
            h = jnp.take(m, col, axis=0) * val[:, None]
            return sorted_segment_reduce_matmul(h, row, cb, ce, fi, M, TM, C)

        # correctness once per config
        out = full_spmm(mat)
        ref = jax.ops.segment_sum(
            jnp.take(mat, col, axis=0) * val[:, None], row, M,
            indices_are_sorted=True,
        )
        err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-30))
        dt = device_time(full_spmm, mat)
        nnzs = E / dt
        print(
            f"TM={TM:4d} C={C:5d} chunks={cb.shape[0]:6d}  "
            f"{dt*1e3:8.3f} ms  {nnzs/1e6:9.1f} Mnnz/s  relerr={err:.2e}"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
