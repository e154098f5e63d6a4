"""Port of reference ``test/test_spspmm.py`` (incl. the orthogonal-matrix
identity property X @ X^T = I)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor, spspmm
from pytorch_sparse_tpu.testing import tensor


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_spspmm(dtype):
    indexA = jnp.array([[0, 0, 1, 2, 2], [1, 2, 0, 0, 1]])
    valueA = tensor([1, 2, 3, 4, 5], dtype)
    indexB = jnp.array([[0, 2], [1, 0]])
    valueB = tensor([2, 4], dtype)

    indexC, valueC = spspmm(indexA, valueA, indexB, valueB, 3, 3, 2)
    assert indexC.tolist() == [[0, 1, 2], [0, 1, 1]]
    assert valueC.tolist() == [8, 6, 8]


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_sparse_tensor_spspmm(dtype):
    x = SparseTensor(
        row=jnp.array(
            [0, 1, 1, 1, 2, 3, 4, 5, 5, 6, 6, 7, 7, 7, 8, 8, 9, 9]),
        col=jnp.array(
            [0, 5, 10, 15, 1, 2, 3, 7, 13, 6, 9, 5, 10, 15, 11, 14, 5, 15]),
        value=jnp.array([
            1, 3**-0.5, 3**-0.5, 3**-0.5, 1, 1, 1, -2**-0.5, -2**-0.5,
            -2**-0.5, -2**-0.5, 6**-0.5, -6**0.5 / 3, 6**-0.5, -2**-0.5,
            -2**-0.5, 2**-0.5, -2**-0.5
        ], dtype=dtype),
    )

    expected = jnp.eye(10, dtype=dtype)

    out = x @ x.to_dense().T
    assert np.allclose(out, expected, atol=1e-2)

    out = (x @ x.t()).to_dense()
    assert np.allclose(out, expected, atol=1e-2)
