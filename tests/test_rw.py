"""Random walk tests (device-native, PRNGKey-threaded)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.sample import random_walk


def _ring(n):
    row = jnp.arange(n)
    col = (row + 1) % n
    return SparseTensor(row=row, col=col, sparse_sizes=(n, n))


def test_random_walk_ring():
    adj = _ring(5)
    start = jnp.array([0, 2])
    out = random_walk(adj, start, 4, key=jax.random.PRNGKey(0))
    # On a directed ring, walks are deterministic.
    assert out.tolist() == [[0, 1, 2, 3, 4], [2, 3, 4, 0, 1]]


def test_random_walk_isolated_stays():
    row = jnp.array([0])
    col = jnp.array([1])
    adj = SparseTensor(row=row, col=col, sparse_sizes=(3, 3))
    out = random_walk(adj, jnp.array([2]), 3, key=jax.random.PRNGKey(1))
    assert out.tolist() == [[2, 2, 2, 2]]


def test_random_walk_valid_and_deterministic():
    rng = np.random.RandomState(0)
    row = jnp.asarray(np.sort(rng.randint(0, 20, 100)))
    col = jnp.asarray(rng.randint(0, 20, 100))
    adj = SparseTensor(row=row, col=col, sparse_sizes=(20, 20)).coalesce()
    start = jnp.arange(20)
    k = jax.random.PRNGKey(3)
    out1 = random_walk(adj, start, 8, key=k)
    out2 = random_walk(adj, start, 8, key=k)
    assert out1.shape == (20, 9)
    assert (out1 == out2).all()
    assert int(out1.min()) >= 0 and int(out1.max()) < 20
