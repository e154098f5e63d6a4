"""Decompose the full-Reddit hybrid SpMM: block pass vs ELL remainder.

BASELINE.md round 3 records the headline split as block pass ~64 ms +
ELL remainder ~116 ms (15.6M edges at 7.4 ns/edge) and calls the
remainder "the gather floor at this table size" — but the measured
random-row gather rate says the floor at a 119 MB table should be
~3.1-4 ns/edge (~50-60 ms).  This probe separates the hypotheses:

1. the remainder standalone (no multi-GB block store in the program)
   runs at the expected floor -> the cost is an HBM-pressure /
   scheduling interaction inside the combined jit;
2. the remainder standalone is already ~116 ms -> the per-edge cost is
   real (bucket shape / table size), and the attack is on the ELL side.

Usage: ``python benchmarks/probe_remainder.py`` (real TPU; needs the
bench graph cache ``~/.cache/pytorch_sparse_tpu_bench/reddit_full_s4.npz``).
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
from pytorch_sparse_tpu.ops.kernels import hybrid as hyb

K = 128
M = 232_965


def main():
    cache_dir = os.path.expanduser("~/.cache/pytorch_sparse_tpu_bench")
    hyb_cache = os.path.join(cache_dir, "reddit_full_s4_hybrid.npz")
    if os.path.exists(hyb_cache):
        A = ts.load_npz(hyb_cache)        # hybrid view rides the npz
    else:
        d = np.load(os.path.join(cache_dir, "reddit_full_s4.npz"))
        A = ts.SparseTensor(
            row=d["row"], col=d["col"], value=jnp.asarray(d["value"]),
            sparse_sizes=(M, M), is_sorted=True, trust_data=True,
        )
    E = int(A.nnz())
    h = A.storage.hybrid()
    assert isinstance(h, hyb.HybridFormat), type(h)
    ell = h.ell[0]
    E_rest = sum(int((np.asarray(e) < ell.E).sum()) for e in ell.eids)
    print(f"E={E}  nb={h.nb}  B={h.B}  remainder edges={E_rest}  "
          f"caps={ell.caps}")

    mat = jnp.asarray(np.random.RandomState(2).randn(M, K).astype(np.float32))

    def report(name, dt, work):
        print(f"{name:32s} {dt * 1e3:8.2f} ms  "
              f"{work / dt / 1e9:6.3f} Gnnz/s  {dt / work * 1e9:5.2f} ns/e")

    # 0. full hybrid (bench formulation)
    dt = device_time(lambda m, a: ts.spmm_sum(a, m), mat, A,
                     n_lo=2, n_hi=6)
    report("full hybrid spmm", dt, E)

    # 1. remainder ELL standalone (baked values), blocks still resident
    #    on device but NOT referenced by the program.
    dt = device_time(
        lambda m, e, b: ellmod.ell_spmm(e, None, m, baked=b),
        mat, ell, h.rest_baked, n_lo=2, n_hi=6,
    )
    report("remainder ell_spmm alone", dt, E_rest)

    # 2. block pass alone (ell stripped from the handle).
    h_blocks = hyb.HybridFormat(
        h.blocks, h.slot_row, h.slot_col, h.order_t, None,
        h.M, h.N, h.B, h.dense_nnz, row_map=h.row_map, M_pad=h.M_pad,
    )
    dt = device_time(
        lambda m, hb: hyb.hybrid_spmm(hb, m), mat, h_blocks,
        n_lo=2, n_hi=6,
    )
    report("block pass alone", dt, h.dense_nnz)

    # 3. remainder raw gather+sum floor: per-bucket wide takes, no
    #    values, no inv_perm (the two-pass lower bound for this table).
    #    The loop gathers every SLOT including padding, so the per-edge
    #    rate divides by the slot count; device_time chains the step
    #    through a fori_loop, so the carry must keep the (M, K) shape —
    #    `m + tot` broadcasts the (1, K) total at negligible cost next
    #    to the 15M-slot gather.
    n_slots = sum(int(np.prod(idx.shape)) for idx in ell.idxs)

    def raw(m, e):
        tot = jnp.zeros((1, K), m.dtype)
        for idx in e.idxs:
            cap = idx.shape[1]
            step = ellmod._chunk_cols(idx.shape[0], cap, K)
            for s in range(0, cap, step):
                en = min(s + step, cap)
                tot = tot + jnp.sum(
                    jnp.take(m, idx[:, s:en], axis=0), axis=(0, 1)
                )[None]
        return m + tot

    dt = device_time(raw, mat, ell, n_lo=2, n_hi=6)
    report(f"remainder raw gather+reduce ({n_slots / E_rest:.3f}x slots)",
           dt, n_slots)


if __name__ == "__main__":
    main()
