"""Port of reference ``test/test_mul.py``."""

import jax.numpy as jnp
import pytest

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.testing import dtypes, tensor


@pytest.mark.parametrize("dtype", dtypes)
def test_sparse_sparse_mul(dtype):
    rowA = jnp.array([0, 0, 1, 2, 2])
    colA = jnp.array([0, 2, 1, 0, 1])
    valueA = tensor([1, 2, 4, 1, 3], dtype)
    A = SparseTensor(row=rowA, col=colA, value=valueA)

    rowB = jnp.array([0, 0, 1, 2, 2])
    colB = jnp.array([1, 2, 2, 1, 2])
    valueB = tensor([2, 3, 1, 2, 4], dtype)
    B = SparseTensor(row=rowB, col=colB, value=valueB)

    C = A * B
    rowC, colC, valueC = C.coo()

    assert rowC.tolist() == [0, 2]
    assert colC.tolist() == [2, 1]
    assert valueC.tolist() == [6, 6]


@pytest.mark.parametrize("dtype", dtypes)
def test_sparse_sparse_mul_empty(dtype):
    A = SparseTensor(
        row=jnp.array([0]), col=jnp.array([1]), value=tensor([1], dtype)
    )
    B = SparseTensor(
        row=jnp.array([1]), col=jnp.array([0]), value=tensor([2], dtype)
    )
    C = A * B
    rowC, colC, valueC = C.coo()
    assert rowC.tolist() == []
    assert colC.tolist() == []
    assert valueC.tolist() == []
