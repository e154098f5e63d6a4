"""Third sweep: pin the row-chunk budget (sweep2: 4M -> 5.36 ns/e but
8M -> 7.81 — wildly non-monotone), check K=256 robustness, and test the
row-chunked formulation on the ARXIV-SCALE uniform graph (where the
shipped unrolled path measures 3.5 ms — if row-chunking drops it under
3.0 the uniform front's round-2 done-bar is met)."""

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


def rowchunk(m, e, b, budget, round_to=1):
    K_ = m.shape[1]
    outs = []
    for idx, vals in zip(e.idxs, b):
        R, cap = idx.shape
        step = max(1, budget // max(cap * K_, 1))
        if round_to > 1 and step > round_to:
            step = (step // round_to) * round_to
        parts = []
        for s in range(0, R, step):
            en = min(s + step, R)
            hm = jnp.take(m, idx[s:en], axis=0)
            parts.append(jnp.sum(hm * vals[s:en][..., None], axis=1))
        outs.append(parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, axis=0))
    if e.n_zero:
        outs.append(jnp.zeros((e.n_zero, K_), m.dtype))
    stacked = jnp.concatenate(outs, axis=0)
    return jnp.take(stacked, e.inv_perm, axis=0)


def main():
    hyb_cache = os.path.expanduser(
        "~/.cache/pytorch_sparse_tpu_bench/reddit_full_s4_hybrid.npz"
    )
    A = ts.load_npz(hyb_cache)
    h = A.storage.hybrid(auto=False)
    ell, baked = h.ell[0], h.rest_baked
    E_rest = sum(int((np.asarray(e) < ell.E).sum()) for e in ell.eids)
    M = 232_965
    mat = jnp.asarray(
        np.random.RandomState(2).randn(M, K).astype(np.float32)
    )

    def report(name, dt, edges):
        print(f"{name:44s} {dt * 1e3:8.2f} ms  "
              f"{dt / edges * 1e9:5.2f} ns/e", flush=True)

    for budget in (2_000_000, 3_000_000, 4_000_000, 5_000_000,
                   6_000_000):
        dt = device_time(
            lambda m, e, b, bu=budget: rowchunk(m, e, b, bu),
            mat, ell, baked, n_lo=2, n_hi=6,
        )
        report(f"reddit-rest row-chunk {budget/1e6:.0f}M", dt, E_rest)
    # step rounded to 512 rows at the 4M budget
    dt = device_time(
        lambda m, e, b: rowchunk(m, e, b, 4_000_000, round_to=512),
        mat, ell, baked, n_lo=2, n_hi=6,
    )
    report("reddit-rest row-chunk 4M round512", dt, E_rest)
    # K=256 at the 4M budget
    mat256 = jnp.asarray(
        np.random.RandomState(3).randn(M, 256).astype(np.float32)
    )
    dt = device_time(
        lambda m, e, b: rowchunk(m, e, b, 4_000_000),
        mat256, ell, baked, n_lo=2, n_hi=6,
    )
    report("reddit-rest row-chunk 4M K=256", dt, E_rest)
    del mat, mat256, A, h, ell, baked

    # ---- arxiv-scale uniform graph: shipped path vs row-chunk ----
    M2, E2 = 169_343, 1_166_243
    rng = np.random.RandomState(0)
    row = np.sort(rng.randint(0, M2, E2)).astype(np.int32)
    col = rng.randint(0, M2, E2).astype(np.int32)
    order = np.lexsort((col, row))
    A2 = ts.SparseTensor(
        row=jnp.asarray(row[order]), col=jnp.asarray(col[order]),
        value=jnp.asarray(rng.randn(E2).astype(np.float32)),
        sparse_sizes=(M2, M2), is_sorted=True, trust_data=True,
    )
    ell2 = A2.storage.ell()
    baked2 = A2.storage.ell_baked()
    mat2 = jnp.asarray(rng.randn(M2, K).astype(np.float32))
    print("arxiv caps:", ell2.caps, flush=True)
    dt = device_time(
        lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
        mat2, ell2, baked2, n_lo=2, n_hi=8,
    )
    report("arxiv uniform shipped ell_spmm", dt, E2)
    for budget in (2_000_000, 4_000_000, 8_000_000):
        dt = device_time(
            lambda m, e, b, bu=budget: rowchunk(m, e, b, bu),
            mat2, ell2, baked2, n_lo=2, n_hi=8,
        )
        report(f"arxiv uniform row-chunk {budget/1e6:.0f}M", dt, E2)


if __name__ == "__main__":
    main()
