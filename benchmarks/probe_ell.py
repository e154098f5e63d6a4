"""Probe: degree-bucketed ELLPACK SpMM (scatter-free, pure XLA) vs the
Pallas reduce pipeline (gather into pre-padded h, no per-call copies)."""

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

M = 169_343
E = 1_166_243
K = 128

rng = np.random.RandomState(0)
row_np = np.sort(rng.randint(0, M, E)).astype(np.int32)
col_np = rng.randint(0, M, E).astype(np.int32)
val_np = rng.randn(E).astype(np.float32)
mat = jnp.asarray(rng.randn(M, K).astype(np.float32))

rowptr = np.zeros(M + 1, np.int64)
np.add.at(rowptr, row_np + 1, 1)
rowptr = np.cumsum(rowptr)
deg = (rowptr[1:] - rowptr[:-1]).astype(np.int64)

# ---------------- ELLPACK buckets ----------------
CAPS = [1, 2, 4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 256, 512, 1024,
        2048, 4096]


def build_ell():
    order = np.argsort(deg, kind="stable")
    buckets = []  # (rows_idx, cols_padded (R,d), vals_padded (R,d))
    for bi, cap in enumerate(CAPS):
        lo = CAPS[bi - 1] if bi > 0 else 0
        sel = order[(deg[order] > lo) & (deg[order] <= cap)]
        if sel.size == 0:
            continue
        R = sel.size
        cols = np.zeros((R, cap), np.int32)
        vals = np.zeros((R, cap), np.float32)
        for i, r in enumerate(sel):  # slow host loop; fine for a probe
            s, e = rowptr[r], rowptr[r + 1]
            cols[i, : e - s] = col_np[s:e]
            vals[i, : e - s] = val_np[s:e]
        buckets.append((sel, jnp.asarray(cols), jnp.asarray(vals)))
    zero_rows = order[deg[order] == 0]
    perm = np.concatenate([b[0] for b in buckets] + [zero_rows])
    inv = np.empty(M, np.int64)
    inv[perm] = np.arange(M)
    pad_total = sum(b[1].size for b in buckets)
    print(f"ELL pad ratio: {pad_total / E:.3f}, buckets: {len(buckets)}")
    return buckets, jnp.asarray(inv), zero_rows.size


buckets, inv_perm, n_zero = build_ell()


def ell_spmm(m):
    outs = [
        jnp.sum(jnp.take(m, cols, axis=0) * vals[..., None], axis=1)
        for (_, cols, vals) in buckets
    ]
    if n_zero:
        outs.append(jnp.zeros((n_zero, K), m.dtype))
    stacked = jnp.concatenate(outs, axis=0)
    return jnp.take(stacked, inv_perm, axis=0)


# ---------------- Pallas pipeline, pre-padded ----------------
TM, C = 128, 1024
cb, ce, fi, nb = build_chunk_table(rowptr, M, TM, C)
E_pad = (E // C + 1) * C
col_pad = np.zeros(E_pad, np.int32); col_pad[:E] = col_np
val_pad = np.zeros(E_pad, np.float32); val_pad[:E] = val_np
row_pad = np.full(E_pad, M, np.int32); row_pad[:E] = row_np
col_p, val_p = jnp.asarray(col_pad), jnp.asarray(val_pad)
row_p = jnp.asarray(row_pad)
cb, ce, fi = jnp.asarray(cb), jnp.asarray(ce), jnp.asarray(fi)


def pallas_spmm(m):
    h = jnp.take(m, col_p, axis=0) * val_p[:, None]
    return sorted_segment_reduce_matmul(h, row_p, cb, ce, fi, M, TM, C)


# correctness
ref = jax.ops.segment_sum(
    jnp.take(mat, jnp.asarray(col_np), axis=0) * jnp.asarray(val_np)[:, None],
    jnp.asarray(row_np), M, indices_are_sorted=True,
)
for name, fn in [("ell", ell_spmm), ("pallas-prepad", pallas_spmm)]:
    out = fn(mat)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-30))
    dt = device_time(fn, mat)
    print(f"{name:14s} {dt*1e3:8.3f} ms  {E/dt/1e6:9.1f} Mnnz/s  "
          f"relerr={err:.2e}")
    sys.stdout.flush()
