"""Port of reference ``test/test_add.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor, add
from pytorch_sparse_tpu.testing import dtypes, tensor


@pytest.mark.parametrize("dtype", dtypes)
def test_add(dtype):
    rowA = jnp.array([0, 0, 1, 2, 2])
    colA = jnp.array([0, 2, 1, 0, 1])
    valueA = tensor([1, 2, 4, 1, 3], dtype)
    A = SparseTensor(row=rowA, col=colA, value=valueA)

    rowB = jnp.array([0, 0, 1, 2, 2])
    colB = jnp.array([1, 2, 2, 1, 2])
    valueB = tensor([2, 3, 1, 2, 4], dtype)
    B = SparseTensor(row=rowB, col=colB, value=valueB)

    C = A + B
    rowC, colC, valueC = C.coo()

    assert rowC.tolist() == [0, 0, 0, 1, 1, 2, 2, 2]
    assert colC.tolist() == [0, 1, 2, 1, 2, 0, 1, 2]
    assert valueC.tolist() == [1, 2, 5, 4, 1, 1, 5, 4]


def test_add_broadcast_jit():
    """Broadcast adds are static-shape, so they must trace under jit."""
    row = jnp.array([0, 1, 1, 2, 2])
    col = jnp.array([1, 0, 2, 1, 2])
    value = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    A = SparseTensor(row=row, col=col, value=value)

    rowvec = jnp.array([[1.0], [2.0], [3.0]])
    out = jax.jit(lambda a, o: add(a, o))(A, rowvec)
    assert np.allclose(
        out.to_dense(),
        A.to_dense() + jnp.where(A.to_dense() != 0, rowvec, 0.0),
    )
