"""Port of reference ``test/test_overload.py``."""

import jax.numpy as jnp

from pytorch_sparse_tpu import SparseTensor


def test_overload():
    row = jnp.array([0, 1, 1, 2, 2])
    col = jnp.array([1, 0, 2, 1, 2])
    mat = SparseTensor(row=row, col=col)

    other = jnp.array([1.0, 2.0, 3.0]).reshape(3, 1)
    other + mat
    mat + other
    other * mat
    mat * other

    other = jnp.array([1.0, 2.0, 3.0]).reshape(1, 3)
    other + mat
    mat + other
    other * mat
    mat * other
