"""Port of reference ``test/test_convert.py`` (scipy + jax.sparse BCOO)."""

import jax.numpy as jnp

from pytorch_sparse_tpu import (
    from_jax_sparse, from_scipy, to_jax_sparse, to_scipy,
)


def test_convert_scipy():
    index = jnp.array([[0, 0, 1, 2, 2], [0, 2, 1, 0, 1]])
    value = jnp.array([1.0, 2.0, 4.0, 1.0, 3.0])
    N = 3

    out = from_scipy(to_scipy(index, value, N, N))
    assert out[0].tolist() == index.tolist()
    assert out[1].tolist() == value.tolist()


def test_convert_jax_sparse():
    index = jnp.array([[0, 0, 1, 2, 2], [0, 2, 1, 0, 1]])
    value = jnp.array([1.0, 2.0, 4.0, 1.0, 3.0])
    N = 3

    out = from_jax_sparse(to_jax_sparse(index, value, N, N))
    assert out[0].tolist() == index.tolist()
    assert out[1].tolist() == value.tolist()
