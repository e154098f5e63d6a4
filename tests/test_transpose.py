"""Port of reference ``test/test_transpose.py``."""

import jax.numpy as jnp
import pytest

from pytorch_sparse_tpu import transpose
from pytorch_sparse_tpu.testing import dtypes, tensor


@pytest.mark.parametrize("dtype", dtypes)
def test_transpose_matrix(dtype):
    row = jnp.array([1, 0, 1, 2])
    col = jnp.array([0, 1, 1, 0])
    index = jnp.stack([row, col], axis=0)
    value = tensor([1, 2, 3, 4], dtype)

    index, value = transpose(index, value, m=3, n=2)
    assert index.tolist() == [[0, 0, 1, 1], [1, 2, 0, 1]]
    assert value.tolist() == [1, 4, 2, 3]


@pytest.mark.parametrize("dtype", dtypes)
def test_transpose(dtype):
    row = jnp.array([1, 0, 1, 0, 2, 1])
    col = jnp.array([0, 1, 1, 1, 0, 0])
    index = jnp.stack([row, col], axis=0)
    value = tensor([[1, 2], [2, 3], [3, 4], [4, 5], [5, 6], [6, 7]], dtype)

    index, value = transpose(index, value, m=3, n=2)
    assert index.tolist() == [[0, 0, 1, 1], [1, 2, 0, 1]]
    assert value.tolist() == [[7, 9], [5, 6], [6, 8], [3, 4]]


def test_t_roundtrip():
    row = jnp.array([0, 0, 1, 2, 2])
    col = jnp.array([0, 2, 1, 0, 1])
    value = jnp.array([1.0, 2.0, 4.0, 1.0, 3.0])
    from pytorch_sparse_tpu import SparseTensor

    A = SparseTensor(row=row, col=col, value=value)
    At = A.t()
    assert (At.to_dense() == A.to_dense().T).all()
    assert (At.t().to_dense() == A.to_dense()).all()
