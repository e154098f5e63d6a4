"""Legacy tuple-API coalesce (reference ``torch_sparse/coalesce.py:5-25``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..storage import SparseStorage


def coalesce(
    index: jnp.ndarray,
    value: Optional[jnp.ndarray],
    m: int,
    n: int,
    op: str = "add",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Row-wise sorts ``value`` and reduces duplicate entries with ``op``."""
    storage = SparseStorage(
        row=index[0], col=index[1], value=value, sparse_sizes=(m, n),
        is_sorted=False,
    )
    storage = storage.coalesce(reduce=op)
    return (
        jnp.stack([storage.row(), storage.col()], axis=0),
        storage.value(),
    )
