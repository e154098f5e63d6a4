"""Uniform random walks (reference ``torch_sparse/rw.py`` +
``csrc/cpu/rw_cpu.cpp:5-43``).

Device-native: the reference pre-draws a ``(n, L)`` uniform matrix and then
walks the CSR arrays; that maps directly onto ``jax.random.uniform`` + a
``lax.scan`` of gathers, fully jit-able and batched on the VPU.  Degree-0
nodes stay in place (the walk emits the current node again).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..tensor import SparseTensor


@partial(jax.jit, static_argnames=("walk_length",))
def _walk(rowptr, col, start, key, walk_length: int):
    rand = jax.random.uniform(key, (start.shape[0], walk_length))

    def step(cur, r):
        lo = jnp.take(rowptr, cur)
        deg = jnp.take(rowptr, cur + 1) - lo
        e = lo + (r * deg.astype(r.dtype)).astype(cur.dtype)
        nxt = jnp.where(deg > 0, jnp.take(col, e), cur)
        return nxt, nxt

    _, steps = jax.lax.scan(step, start, rand.T)
    return jnp.concatenate([start[None, :], steps], axis=0).T


def random_walk(
    src: SparseTensor, start: jnp.ndarray, walk_length: int,
    key: jax.Array = None,
) -> jnp.ndarray:
    """Walks of length ``walk_length`` from ``start``; returns node ids of
    shape ``(len(start), walk_length + 1)`` including the start node."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rowptr, col, _ = src.csr()
    start = jnp.asarray(start, dtype=rowptr.dtype)
    return _walk(rowptr, col, start, key, walk_length)


SparseTensor.random_walk = (
    lambda self, start, walk_length, key=None: random_walk(
        self, start, walk_length, key)
)
