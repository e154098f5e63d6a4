"""Legacy tuple-API identity matrix (reference ``torch_sparse/eye.py``)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..utils.convert import INDEX_DTYPE


def eye(m: int, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse identity: ``(index, value)`` with ones on the diagonal."""
    row = jnp.arange(m, dtype=INDEX_DTYPE)
    index = jnp.stack([row, row], axis=0)
    value = jnp.ones((m,), dtype=dtype or jnp.float32)
    return index, value
