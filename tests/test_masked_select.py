"""masked_select / masked_select_nnz vs the dense oracle (no reference
test exists for these — coverage beyond the reference suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor


def _rand(M=12, N=10, E=40, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, M, E)
    col = rng.randint(0, N, E)
    val = rng.randn(E).astype(np.float32)
    A = SparseTensor(row=row, col=col, value=jnp.asarray(val),
                     sparse_sizes=(M, N)).coalesce("add")
    return A


@pytest.mark.parametrize("dim", [0, 1])
def test_masked_select_dims(dim):
    A = _rand()
    dense = np.asarray(A.to_dense())
    rng = np.random.RandomState(1)
    mask = rng.rand(dense.shape[dim]) < 0.5
    out = A.masked_select(dim, mask)
    expected = dense[mask] if dim == 0 else dense[:, mask]
    assert np.allclose(np.asarray(out.to_dense()), expected, atol=1e-6)


def test_masked_select_nnz():
    A = _rand()
    E = A.nnz()
    rng = np.random.RandomState(2)
    mask = rng.rand(E) < 0.6
    out = A.masked_select_nnz(jnp.asarray(mask), layout="coo")
    assert out.nnz() == int(mask.sum())
    r = np.asarray(A.storage.row())[mask]
    c = np.asarray(A.storage.col())[mask]
    v = np.asarray(A.storage.value())[mask]
    assert np.array_equal(np.asarray(out.storage.row()), r)
    assert np.array_equal(np.asarray(out.storage.col()), c)
    assert np.allclose(np.asarray(out.storage.value()), v)


def test_masked_select_empty_result():
    A = _rand()
    out = A.masked_select(0, np.zeros(A.sparse_size(0), bool))
    assert out.nnz() == 0 and out.sparse_size(0) == 0
