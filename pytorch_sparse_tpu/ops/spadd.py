"""Legacy tuple-API sparse + sparse add (reference ``torch_sparse/spadd.py``):
concatenate then coalesce with ``op='add'``."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .coalesce import coalesce


def spadd(
    indexA: jnp.ndarray,
    valueA: Optional[jnp.ndarray],
    indexB: jnp.ndarray,
    valueB: Optional[jnp.ndarray],
    m: int,
    n: int,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    index = jnp.concatenate([indexA, indexB], axis=-1)
    value = None
    if valueA is not None and valueB is not None:
        value = jnp.concatenate([valueA, valueB], axis=0)
    return coalesce(index=index, value=value, m=m, n=n, op="add")
