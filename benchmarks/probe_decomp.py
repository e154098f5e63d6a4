"""Decompose SpMM time on the real TPU: gather vs segment-reduce vs fused.

Run on the axon TPU (default env).  Prints per-piece device times so we
know which stage the Pallas kernel must replace first.

Each probe is shape-preserving in its (M, K) carry (a requirement of the
slope-based timer), so stage costs are read off as differences between
composites.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time


def main():
    M = 169_343
    E = 1_166_243
    K = 128

    rng = np.random.RandomState(0)
    row = np.sort(rng.randint(0, M, E)).astype(np.int32)
    col = rng.randint(0, M, E).astype(np.int32)
    order = np.lexsort((col, row))
    row = jnp.asarray(row[order])
    col = jnp.asarray(col[order])
    val = jnp.asarray(rng.randn(E).astype(np.float32))
    mat = jnp.asarray(rng.randn(M, K).astype(np.float32))

    col_sorted = jnp.sort(col)  # best-case locality gather

    pieces = {
        # gather E rows, fold back by slicing (slice copy ~86MB)
        "gather only (+slice)": lambda m: jnp.take(m, col, axis=0)[:M],
        "gather sorted-idx (+slice)": lambda m: jnp.take(m, col_sorted, axis=0)[:M],
        "gather+mul (+slice)": lambda m: (
            jnp.take(m, col, axis=0) * val[:, None]
        )[:M],
        "full spmm (sorted flag)": lambda m: jax.ops.segment_sum(
            jnp.take(m, col, axis=0) * val[:, None], row, M,
            indices_are_sorted=True,
        ),
        "full spmm (unsorted flag)": lambda m: jax.ops.segment_sum(
            jnp.take(m, col, axis=0) * val[:, None], row, M,
            indices_are_sorted=False,
        ),
        "full spmm scatter-add": lambda m: jnp.zeros((M, K), jnp.float32)
        .at[row]
        .add(jnp.take(m, col, axis=0) * val[:, None]),
        "dense matmul MxK@KxK": lambda m: m @ jnp.eye(K, dtype=jnp.float32),
        "copy m+1": lambda m: m + 1.0,
    }

    for name, fn in pieces.items():
        try:
            dt = device_time(fn, mat)
            print(f"{name:36s} {dt * 1e3:9.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
