"""Second remainder sweep: smaller chunk budgets, wider UNROLL_MAX,
row-chunk budgets (follow-up to probe_remainder_sweep.py, which found
smaller intermediates strictly better: 4M budget 6.59 ns/e < 16M 7.50
< 256M 8.35, row-chunked@16M best at 6.27)."""

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

    mat = jnp.asarray(
        np.random.RandomState(2).randn(M, K).astype(np.float32)
    )

    def report(name, dt):
        print(f"{name:44s} {dt * 1e3:8.2f} ms  "
              f"{dt / E_rest * 1e9:5.2f} ns/e", flush=True)

    def run(label):
        dt = device_time(
            lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
            mat, ell, baked, n_lo=2, n_hi=6,
        )
        report(label, dt)

    base_chunk = ellmod._CHUNK_ELEMS
    base_unroll = ellmod.UNROLL_MAX
    try:
        for budget in (1_000_000, 2_000_000):
            ellmod._CHUNK_ELEMS = budget
            run(f"ell_spmm CHUNK_ELEMS={budget/1e6:.0f}M")
        ellmod._CHUNK_ELEMS = base_chunk
        ellmod.UNROLL_MAX = 128
        run("UNROLL_MAX=128 (caps<=101 unrolled)")
        ellmod.UNROLL_MAX = 1024
        run("UNROLL_MAX=1024 (all unrolled)")
        ellmod.UNROLL_MAX = 128
        ellmod._CHUNK_ELEMS = 2_000_000
        run("UNROLL=128 + CHUNK=2M (687 bucket)")
    finally:
        ellmod._CHUNK_ELEMS = base_chunk
        ellmod.UNROLL_MAX = base_unroll

    def rowchunk(m, e, b, budget):
        outs = []
        for idx, vals in zip(e.idxs, b):
            R, cap = idx.shape
            step = max(1, budget // max(cap * K, 1))
            parts = []
            for s in range(0, R, step):
                en = min(s + step, R)
                hm = jnp.take(m, idx[s:en], axis=0)
                parts.append(
                    jnp.sum(hm * vals[s:en][..., None], axis=1)
                )
            outs.append(parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=0))
        if e.n_zero:
            outs.append(jnp.zeros((e.n_zero, K), m.dtype))
        stacked = jnp.concatenate(outs, axis=0)
        return jnp.take(stacked, e.inv_perm, axis=0)

    for budget in (4_000_000, 8_000_000):
        dt = device_time(
            lambda m, e, b, bu=budget: rowchunk(m, e, b, bu),
            mat, ell, baked, n_lo=2, n_hi=6,
        )
        report(f"row-chunked budget={budget/1e6:.0f}M", dt)


if __name__ == "__main__":
    main()
