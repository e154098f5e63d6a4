"""Legacy tuple-API SpMM (reference ``torch_sparse/spmm.py:5-31``):
gather x value followed by a scatter-add."""

from __future__ import annotations

import jax.numpy as jnp

from .segment import segment_sum


def spmm(
    index: jnp.ndarray,
    value: jnp.ndarray,
    m: int,
    n: int,
    matrix: jnp.ndarray,
) -> jnp.ndarray:
    """Matrix product of a COO sparse matrix with a dense matrix."""
    assert n == matrix.shape[-2]
    row, col = index[0], index[1]
    matrix = matrix if matrix.ndim > 1 else matrix[:, None]

    out = jnp.take(matrix, col, axis=-2)
    out = out * value[:, None].astype(out.dtype)
    if matrix.ndim == 2:
        return segment_sum(out, row, m)
    # Batched: move the segment axis to front per batch via vmap.
    import jax

    return jax.vmap(lambda o: segment_sum(o, row, m))(out)
