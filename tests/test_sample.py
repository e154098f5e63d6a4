"""Port of reference ``test/test_sample.py``."""

import jax.numpy as jnp

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.sample import sample, sample_adj


def test_sample():
    row = jnp.array([0, 0, 2, 2])
    col = jnp.array([1, 2, 0, 1])
    adj = SparseTensor(row=row, col=col, sparse_sizes=(3, 3))

    out = sample(adj, num_neighbors=1)
    assert int(out.min()) >= 0 and int(out.max()) <= 2


def test_sample_adj():
    row = jnp.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 4, 4, 5, 5])
    col = jnp.array([1, 2, 3, 0, 2, 0, 1, 4, 5, 0, 2, 5, 2, 4])
    value = jnp.arange(row.shape[0])
    adj_t = SparseTensor(row=row, col=col, value=value, sparse_sizes=(6, 6))

    out, n_id = sample_adj(adj_t, jnp.arange(2, 6), num_neighbors=-1)

    assert n_id.tolist() == [2, 3, 4, 5, 0, 1]

    row_o, col_o, val = out.coo()
    assert row_o.tolist() == [0, 0, 0, 0, 1, 2, 2, 3, 3]
    assert col_o.tolist() == [2, 3, 4, 5, 4, 0, 3, 0, 2]
    assert val.tolist() == [7, 8, 5, 6, 9, 10, 11, 12, 13]

    out, n_id = sample_adj(
        adj_t, jnp.arange(2, 6), num_neighbors=2, replace=True, seed=0
    )
    assert out.nnz() == 8

    out, n_id = sample_adj(
        adj_t, jnp.arange(2, 6), num_neighbors=2, replace=False, seed=0
    )
    assert out.nnz() == 7  # node 3 has only one edge...


def test_sample_adj_deterministic():
    row = jnp.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 4, 4, 5, 5])
    col = jnp.array([1, 2, 3, 0, 2, 0, 1, 4, 5, 0, 2, 5, 2, 4])
    adj_t = SparseTensor(row=row, col=col, sparse_sizes=(6, 6))

    out1, n_id1 = sample_adj(adj_t, jnp.arange(6), 2, replace=True, seed=7)
    out2, n_id2 = sample_adj(adj_t, jnp.arange(6), 2, replace=True, seed=7)
    assert n_id1.tolist() == n_id2.tolist()
    assert out1.storage.col().tolist() == out2.storage.col().tolist()
