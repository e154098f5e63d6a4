"""Measure SpMM forward+backward (training-step shape) on the TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

import pytorch_sparse_tpu as ts

M = 169_343
E = 1_166_243
K = 128

rng = np.random.RandomState(0)
row = np.sort(rng.randint(0, M, E)).astype(np.int32)
col = rng.randint(0, M, E).astype(np.int32)
order = np.lexsort((col, row))
A = ts.SparseTensor(
    row=jnp.asarray(row[order]), col=jnp.asarray(col[order]),
    value=jnp.asarray(rng.randn(E).astype(np.float32)),
    sparse_sizes=(M, M), is_sorted=True, trust_data=True,
)
A.storage.ell()
A.storage.ell_t()
mat = jnp.asarray(rng.randn(M, K).astype(np.float32))
val = A.storage.value()


def fwd(m):
    return ts.spmm_sum(A, m)


def fwdbwd(m):
    def loss(v, mm):
        return jnp.sum(ts.spmm_sum(A.set_value(v, "coo"), mm) ** 2)

    gv, gm = jax.grad(loss, argnums=(0, 1))(val, m)
    return gm


def fwd_min(m):
    return ts.spmm_min(A, m)[0]


for name, fn in [("fwd sum", fwd), ("fwd+bwd sum", fwdbwd),
                 ("fwd min", fwd_min)]:
    dt = device_time(fn, mat)
    print(f"{name:12s} {dt*1e3:8.3f} ms  {E/dt/1e6:9.1f} Mnnz/s")
    sys.stdout.flush()
