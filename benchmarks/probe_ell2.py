"""ELL SpMM fusion variants: 2D-index take+sum vs unrolled gather-add chain."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

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

CAPS = [2, 4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 256, 512, 1024, 2048,
        4096]

order = np.argsort(deg, kind="stable")
buckets = []
for bi, cap in enumerate(CAPS):
    lo = CAPS[bi - 1] if bi > 0 else 0
    sel = order[(deg[order] > lo) & (deg[order] <= cap)]
    if sel.size == 0:
        continue
    R = sel.size
    cols = np.zeros((R, cap), np.int32)
    vals = np.zeros((R, cap), np.float32)
    pos = rowptr[sel]
    for j in range(cap):
        m_ = (rowptr[sel] + j) < rowptr[sel + 1]
        idx = (pos + j)[m_]
        cols[m_, j] = col_np[idx]
        vals[m_, j] = val_np[idx]
    buckets.append((sel, jnp.asarray(cols), jnp.asarray(vals)))
zero_rows = order[deg[order] == 0]
perm = np.concatenate([b[0] for b in buckets] + [zero_rows])
inv = np.empty(M, np.int64)
inv[perm] = np.arange(M)
inv_perm = jnp.asarray(inv)
n_zero = zero_rows.size
pad_total = sum(int(b[1].size) for b in buckets)
print(f"pad ratio {pad_total/E:.3f}  buckets {len(buckets)}  "
      f"rows/bucket {[int(b[0].size) for b in buckets]}")
sys.stdout.flush()

UNROLL_MAX = 64


def bucket_sum_v1(m, cols, vals):
    return jnp.sum(jnp.take(m, cols, axis=0) * vals[..., None], axis=1)


def bucket_sum_v2(m, cols, vals):
    cap = cols.shape[1]
    if cap > UNROLL_MAX:
        return bucket_sum_v1(m, cols, vals)
    acc = jnp.take(m, cols[:, 0], axis=0) * vals[:, 0, None]
    for j in range(1, cap):
        acc = acc + jnp.take(m, cols[:, j], axis=0) * vals[:, j, None]
    return acc


def make_ell(bucket_sum):
    def fn(m):
        outs = [bucket_sum(m, c, v) for (_, c, v) in buckets]
        if n_zero:
            outs.append(jnp.zeros((n_zero, K), m.dtype))
        return jnp.take(jnp.concatenate(outs, axis=0), inv_perm, axis=0)
    return fn


ref = jax.ops.segment_sum(
    jnp.take(mat, jnp.asarray(col_np), axis=0) * jnp.asarray(val_np)[:, None],
    jnp.asarray(row_np), M, indices_are_sorted=True,
)
for name, fn in [("v1 take2d+sum", make_ell(bucket_sum_v1)),
                 ("v2 unrolled", make_ell(bucket_sum_v2))]:
    out = fn(mat)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-30))
    dt = device_time(fn, mat)
    print(f"{name:16s} {dt*1e3:8.3f} ms  {E/dt/1e6:9.1f} Mnnz/s  "
          f"relerr={err:.2e}")
    sys.stdout.flush()
