"""Port of reference ``test/test_diag.py``."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.testing import dtypes, tensor


@pytest.mark.parametrize("dtype", dtypes)
def test_remove_diag(dtype):
    row, col = jnp.array([0, 0, 1, 2]), jnp.array([0, 1, 2, 2])
    value = tensor([1, 2, 3, 4], dtype)
    mat = SparseTensor(row=row, col=col, value=value)
    mat.fill_cache_()

    mat = mat.remove_diag()
    assert mat.storage.row().tolist() == [0, 1]
    assert mat.storage.col().tolist() == [1, 2]
    assert mat.storage.value().tolist() == [2, 3]
    assert mat.storage.num_cached_keys() == 2
    assert mat.storage.rowcount().tolist() == [1, 1, 0]
    assert mat.storage.colcount().tolist() == [0, 1, 1]

    mat = SparseTensor(row=row, col=col, value=value)
    mat.fill_cache_()

    mat = mat.remove_diag(k=1)
    assert mat.storage.row().tolist() == [0, 2]
    assert mat.storage.col().tolist() == [0, 2]
    assert mat.storage.value().tolist() == [1, 4]
    assert mat.storage.num_cached_keys() == 2
    assert mat.storage.rowcount().tolist() == [1, 0, 1]
    assert mat.storage.colcount().tolist() == [1, 0, 1]


@pytest.mark.parametrize("dtype", dtypes)
def test_set_diag(dtype):
    row, col = jnp.array([0, 0, 9, 9]), jnp.array([0, 1, 0, 1])
    value = tensor([1, 2, 3, 4], dtype)
    mat = SparseTensor(row=row, col=col, value=value)

    mat = mat.set_diag(tensor([-8, -8], dtype), k=-1)
    mat = mat.set_diag(tensor([-8], dtype), k=1)

    dense = np.asarray(mat.to_dense())
    assert dense[1, 0] == -8 and dense[2, 1] == -8 and dense[0, 1] == -8


@pytest.mark.parametrize("dtype", dtypes)
def test_fill_diag(dtype):
    row, col = jnp.array([0, 0, 9, 9]), jnp.array([0, 1, 0, 1])
    value = tensor([1, 2, 3, 4], dtype)
    mat = SparseTensor(row=row, col=col, value=value)

    mat = mat.fill_diag(-8, k=-1)
    mat = mat.fill_diag(-8, k=1)


@pytest.mark.parametrize("dtype", dtypes)
def test_get_diag(dtype):
    row, col = jnp.array([0, 0, 1, 2]), jnp.array([0, 1, 2, 2])
    value = tensor([[1, 1], [2, 2], [3, 3], [4, 4]], dtype)
    mat = SparseTensor(row=row, col=col, value=value)
    assert mat.get_diag().tolist() == [[1, 1], [0, 0], [4, 4]]

    mat = SparseTensor(row=row, col=col)
    assert mat.get_diag().tolist() == [1, 0, 1]


def test_set_diag_matches_dense():
    rng = np.random.RandomState(0)
    dense = (rng.rand(6, 5) > 0.6) * rng.randn(6, 5)
    mat = SparseTensor.from_dense(jnp.asarray(dense, jnp.float32))
    for k in (-2, -1, 0, 1, 2):
        out = mat.fill_diag(7.0, k=k).to_dense()
        expected = np.array(dense, dtype=np.float32)
        n_diag = (
            min(6 + k, 5) if k < 0 else min(6, 5 - k)
        )
        start = -k if k < 0 else 0
        for d in range(n_diag):
            expected[start + d, start + d + k] = 7.0
        assert np.allclose(out, expected)
