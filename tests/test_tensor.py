"""Port of reference ``test/test_tensor.py``."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.testing import grad_dtypes


@pytest.mark.parametrize("dtype", grad_dtypes)
def test_getitem(dtype):
    m, n, k = 50, 40, 10
    rng = np.random.RandomState(0)
    mat = jnp.asarray(rng.randn(m, n), dtype)
    mat = SparseTensor.from_dense(mat)

    idx1 = rng.randint(0, m, (k,))
    idx2 = rng.randint(0, n, (k,))
    bool1 = np.zeros(m, dtype=bool)
    bool2 = np.zeros(n, dtype=bool)
    bool1[idx1] = True
    bool2[idx2] = True
    k1_bool = int(bool1.sum())
    k2_bool = int(bool2.sum())

    idx1j, idx2j = jnp.asarray(idx1), jnp.asarray(idx2)
    bool1j, bool2j = jnp.asarray(bool1), jnp.asarray(bool2)

    assert mat[:k, :k].sizes() == [k, k]
    assert mat[..., :k].sizes() == [m, k]

    assert mat[idx1j, idx2j].sizes() == [k, k]
    assert mat[idx1, idx2].sizes() == [k, k]
    assert mat[list(idx1), list(idx2)].sizes() == [k, k]

    assert mat[bool1j, bool2j].sizes() == [k1_bool, k2_bool]
    assert mat[bool1, bool2].sizes() == [k1_bool, k2_bool]

    assert mat[idx1j].sizes() == [k, n]
    assert mat[bool1j].sizes() == [k1_bool, n]


def test_to_symmetric():
    row = jnp.array([0, 0, 0, 1, 1])
    col = jnp.array([0, 1, 2, 0, 2])
    value = jnp.arange(1, 6)
    mat = SparseTensor(row=row, col=col, value=value)
    assert not mat.is_symmetric()

    mat = mat.to_symmetric()
    assert mat.is_symmetric()
    assert mat.to_dense().tolist() == [
        [2, 6, 3],
        [6, 0, 5],
        [3, 5, 0],
    ]


def test_equal():
    row = jnp.array([0, 0, 0, 1, 1])
    col = jnp.array([0, 1, 2, 0, 2])
    value = jnp.arange(1, 6)
    matA = SparseTensor(row=row, col=col, value=value)
    matB = SparseTensor(row=row, col=col, value=value)
    colC = jnp.array([0, 1, 2, 0, 1])
    matC = SparseTensor(row=row, col=colC, value=value)

    assert id(matA) != id(matB)
    assert matA == matB
    assert id(matA) != id(matC)
    assert matA != matC


def test_from_dense_roundtrip():
    rng = np.random.RandomState(1)
    dense = (rng.rand(7, 9) > 0.5) * rng.randn(7, 9)
    dense = jnp.asarray(dense, jnp.float32)
    mat = SparseTensor.from_dense(dense)
    assert np.allclose(mat.to_dense(), dense)

    sp = mat.to_scipy(layout="csr")
    back = SparseTensor.from_scipy(sp)
    assert np.allclose(back.to_dense(), dense)
