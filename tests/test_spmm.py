"""Port of reference ``test/test_spmm.py`` (legacy tuple API)."""

import jax.numpy as jnp
import pytest

from pytorch_sparse_tpu import spmm
from pytorch_sparse_tpu.testing import dtypes, tensor


@pytest.mark.parametrize("dtype", dtypes)
def test_spmm(dtype):
    row = jnp.array([0, 0, 1, 2, 2])
    col = jnp.array([0, 2, 1, 0, 1])
    index = jnp.stack([row, col], axis=0)
    value = tensor([1, 2, 4, 1, 3], dtype)
    x = tensor([[1, 4], [2, 5], [3, 6]], dtype)

    out = spmm(index, value, 3, 3, x)
    assert out.tolist() == [[7, 16], [8, 20], [7, 19]]
