"""Stable index sorting (reference ``torch_sparse/utils.py:14-21``).

The reference optionally accelerates with ``pyg_lib.ops.index_sort``; on TPU
XLA's sort is already a tuned bitonic/radix network, so this is a thin wrapper
that returns ``(sorted, perm)`` with a *stable* ordering (ties keep input
order), matching ``torch.sort(stable=True)`` semantics the storage layer
relies on.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def index_sort(
    inputs: jnp.ndarray, max_value: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort a 1-D integer array, returning ``(values, permutation)``.

    ``max_value`` is accepted for API parity with the reference (a radix-sort
    hint) but unused: XLA picks its own sorting strategy.
    """
    del max_value
    perm = jnp.argsort(inputs, stable=True)
    return inputs[perm], perm


def lexsort_rows(
    primary: jnp.ndarray, secondary: jnp.ndarray
) -> jnp.ndarray:
    """Permutation sorting by ``(primary, secondary)`` lexicographically.

    Used for COO canonical ordering (sort by row, then col) without forming
    the overflow-prone ``row * N + col`` composite key the reference uses
    (``torch_sparse/storage.py:149-156``).
    """
    return jnp.lexsort((secondary, primary))
