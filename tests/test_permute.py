"""Port of reference ``test/test_permute.py``."""

import jax.numpy as jnp

from pytorch_sparse_tpu import SparseTensor


def test_permute():
    row, col = jnp.array([0, 0, 1, 2, 2]), jnp.array([0, 1, 0, 1, 2])
    value = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    adj = SparseTensor(row=row, col=col, value=value)

    row, col, value = adj.permute(jnp.array([1, 0, 2])).coo()
    assert row.tolist() == [0, 1, 1, 2, 2]
    assert col.tolist() == [1, 0, 1, 0, 2]
    assert value.tolist() == [3, 2, 1, 4, 5]
