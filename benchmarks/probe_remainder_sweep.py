"""Chunk-geometry sweep over the REAL full-Reddit ELL remainder.

probe_gather_scale.py showed the per-edge gather cost at this table
size swings 4.8-10.6 ns/e with chunk geometry (column chunk c=2 is a
measured bad point, c=1 and c=8 are fine, flat is worst).  This sweep
re-times the actual remainder ``ell_spmm`` (baked values) under
different ``_CHUNK_ELEMS`` budgets and an UNROLL_MAX toggle, plus a
row-chunked formulation, to pick the shipping configuration.

Usage: ``python benchmarks/probe_remainder_sweep.py`` (real TPU; needs
the bench hybrid cache).
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

K = 128
M = 232_965


def main():
    hyb_cache = os.path.expanduser(
        "~/.cache/pytorch_sparse_tpu_bench/reddit_full_s4_hybrid.npz"
    )
    A = ts.load_npz(hyb_cache)
    h = A.storage.hybrid(auto=False)
    ell, baked = h.ell[0], h.rest_baked
    E_rest = sum(int((np.asarray(e) < ell.E).sum()) for e in ell.eids)
    n_slots = sum(int(np.prod(i.shape)) for i in ell.idxs)
    print("bucket geometry (R, cap, c@16M):")
    for idx in ell.idxs:
        R, cap = idx.shape
        print(f"  R={R:7d} cap={cap:4d} c={ellmod._chunk_cols(R, cap, K)}")
    print(f"E_rest={E_rest}  slots={n_slots}", flush=True)

    mat = jnp.asarray(
        np.random.RandomState(2).randn(M, K).astype(np.float32)
    )

    def report(name, dt):
        print(f"{name:40s} {dt * 1e3:8.2f} ms  "
              f"{dt / E_rest * 1e9:5.2f} ns/e", flush=True)

    base_chunk = ellmod._CHUNK_ELEMS
    base_unroll = ellmod.UNROLL_MAX
    try:
        for budget in (4_000_000, 16_000_000, 64_000_000, 256_000_000):
            ellmod._CHUNK_ELEMS = budget
            dt = device_time(
                lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
                mat, ell, baked, n_lo=2, n_hi=6,
            )
            report(f"ell_spmm CHUNK_ELEMS={budget/1e6:.0f}M", dt)
        # all-chunked (no unrolled takes) at the default budget
        ellmod._CHUNK_ELEMS = base_chunk
        ellmod.UNROLL_MAX = -1
        dt = device_time(
            lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
            mat, ell, baked, n_lo=2, n_hi=6,
        )
        report("ell_spmm all-chunked (UNROLL off)", dt)
        ellmod.UNROLL_MAX = -1
        for budget in (64_000_000, 256_000_000):
            ellmod._CHUNK_ELEMS = budget
            dt = device_time(
                lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
                mat, ell, baked, n_lo=2, n_hi=6,
            )
            report(f"all-chunked CHUNK_ELEMS={budget/1e6:.0f}M", dt)
    finally:
        ellmod._CHUNK_ELEMS = base_chunk
        ellmod.UNROLL_MAX = base_unroll

    # Row-chunked formulation: whole cap at once, rows split so the
    # (r, cap, K) intermediate stays under the elem budget.
    def rowchunk(m, e, b, budget):
        outs = []
        for idx, vals in zip(e.idxs, b):
            R, cap = idx.shape
            step = max(1, budget // max(cap * K, 1))
            parts = []
            for s in range(0, R, step):
                en = min(s + step, R)
                hm = jnp.take(m, idx[s:en], axis=0)  # (r, cap, K)
                parts.append(
                    jnp.sum(hm * vals[s:en][..., None], axis=1)
                )
            outs.append(parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=0))
        if e.n_zero:
            outs.append(jnp.zeros((e.n_zero, K), m.dtype))
        stacked = jnp.concatenate(outs, axis=0)
        return jnp.take(stacked, e.inv_perm, axis=0)

    for budget in (16_000_000, 64_000_000, 256_000_000):
        dt = device_time(
            lambda m, e, b, bu=budget: rowchunk(m, e, b, bu),
            mat, ell, baked, n_lo=2, n_hi=6,
        )
        report(f"row-chunked budget={budget/1e6:.0f}M", dt)


if __name__ == "__main__":
    main()
