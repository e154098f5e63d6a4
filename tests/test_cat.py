"""Port of reference ``test/test_cat.py`` (cache-preservation assertions)."""

import jax.numpy as jnp
import numpy as np

from pytorch_sparse_tpu import SparseTensor, cat


def test_cat():
    row, col = jnp.array([0, 0, 1]), jnp.array([0, 1, 2])
    mat1 = SparseTensor(row=row, col=col)
    mat1.fill_cache_()

    row, col = jnp.array([0, 0, 1, 2]), jnp.array([0, 1, 1, 0])
    mat2 = SparseTensor(row=row, col=col)
    mat2.fill_cache_()

    out = cat([mat1, mat2], dim=0)
    assert out.to_dense().tolist() == [[1, 1, 0], [0, 0, 1], [1, 1, 0],
                                       [0, 1, 0], [1, 0, 0]]
    assert out.storage.has_row()
    assert out.storage.has_rowptr()
    assert out.storage.has_rowcount()
    assert out.storage.num_cached_keys() == 1

    out = cat([mat1, mat2], dim=1)
    assert out.to_dense().tolist() == [[1, 1, 0, 1, 1], [0, 0, 1, 0, 1],
                                       [0, 0, 0, 1, 0]]
    assert out.storage.has_row()
    assert not out.storage.has_rowptr()
    assert out.storage.num_cached_keys() == 2

    out = cat([mat1, mat2], dim=(0, 1))
    assert out.to_dense().tolist() == [[1, 1, 0, 0, 0], [0, 0, 1, 0, 0],
                                       [0, 0, 0, 1, 1], [0, 0, 0, 0, 1],
                                       [0, 0, 0, 1, 0]]
    assert out.storage.has_row()
    assert out.storage.has_rowptr()
    assert out.storage.num_cached_keys() == 5

    value = jnp.asarray(np.random.randn(mat1.nnz(), 4), jnp.float32)
    mat1 = mat1.set_value(value, layout="coo")
    out = cat([mat1, mat1], dim=-1)
    assert out.storage.value().shape == (mat1.nnz(), 8)
    assert out.storage.has_row()
    assert out.storage.has_rowptr()
    assert out.storage.num_cached_keys() == 5
