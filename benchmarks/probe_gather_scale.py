"""Why does the full-Reddit ELL remainder gather run at ~7.3 ns/edge
when the measured XLA gather floor at comparable table sizes is
~2-4 ns/edge?  (probe_remainder.py established the cost is real and
independent of the resident block store.)

Sweeps, all on ONE (232965, 128) f32 table (119 MB — the full-Reddit
operand):

1. flat 1-D gather+sum at E in {1M, 4M, 16M} random indices —
   does the per-edge cost scale with the gather SIZE?
2. the same 16M gather with indices SORTED — does locality matter?
3. bucket-style 2-D (R, c) gathers at chunk budgets 16M/64M/256M
   elements — does the chunk count / shape explain the gap?
4. bucket-style with value multiply + per-row sum (the actual
   _bucket_sum shape) at the remainder's real geometry.

Usage: ``python benchmarks/probe_gather_scale.py`` (real TPU).
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

K = 128
M = 232_965


def report(name, dt, edges):
    print(f"{name:44s} {dt * 1e3:8.2f} ms  {dt / edges * 1e9:5.2f} ns/e",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    mat = jnp.asarray(rng.randn(M, K).astype(np.float32))

    # 1. flat gather+sum, three sizes
    for E in (1_000_000, 4_000_000, 16_000_000):
        idx = jnp.asarray(rng.randint(0, M, E).astype(np.int32))

        def flat(m, ix):
            return m + jnp.sum(jnp.take(m, ix, axis=0), axis=0)[None]

        dt = device_time(flat, mat, idx, n_lo=2, n_hi=6)
        report(f"flat gather+sum E={E/1e6:.0f}M", dt, E)

    # 2. sorted indices, E=16M
    E = 16_000_000
    idx_sorted = jnp.asarray(np.sort(rng.randint(0, M, E)).astype(np.int32))
    dt = device_time(flat, mat, idx_sorted, n_lo=2, n_hi=6)
    report("flat gather+sum E=16M SORTED", dt, E)

    # 3. bucket-style 2-D gathers: R rows x cap slots, chunked along cap.
    #    Remainder-like geometry: R*cap = 16M slots, cap=67 (the real
    #    remainder's avg), chunk budget swept.
    cap = 64
    R = E // cap
    idx2 = jnp.asarray(rng.randint(0, M, (R, cap)).astype(np.int32))
    for budget in (16_000_000, 64_000_000, 256_000_000):
        step = max(1, min(cap, budget // max(R * K, 1)))

        def bucket(m, ix, step=step):
            tot = jnp.zeros((1, K), m.dtype)
            for s in range(0, cap, step):
                e = min(s + step, cap)
                tot = tot + jnp.sum(
                    jnp.take(m, ix[:, s:e], axis=0), axis=(0, 1)
                )[None]
            return m + tot

        dt = device_time(bucket, mat, idx2, n_lo=2, n_hi=6)
        report(f"2-D (R,{cap}) chunks={-(-cap//step)} (c={step})",
               dt, E)

    # 4. per-row sum in the real _bucket_sum shape (keepdim per row)
    def bucket_rowsum(m, ix):
        step = max(1, min(cap, 16_000_000 // max(R * K, 1)))
        acc = None
        for s in range(0, cap, step):
            e = min(s + step, cap)
            h = jnp.take(m, ix[:, s:e], axis=0)
            part = jnp.sum(h, axis=1)
            acc = part if acc is None else acc + part
        return m + jnp.sum(acc, axis=0)[None]

    dt = device_time(bucket_rowsum, mat, idx2, n_lo=2, n_hi=6)
    report("2-D (R,64) per-row sums (bucket_sum shape)", dt, E)

    # 5. flat gather where indices are pre-flattened from the 2-D table
    #    (identical index VALUES to case 3, flat shape)
    idxf = idx2.reshape(-1)

    def flat_then_reshape(m, ix):
        h = jnp.take(m, ix, axis=0).reshape(R, cap, K)
        return m + jnp.sum(h, axis=(0, 1))[None]

    dt = device_time(flat_then_reshape, mat, idxf, n_lo=2, n_hi=6)
    report("flat gather, reshape, sum (same idx)", dt, E)


if __name__ == "__main__":
    main()
