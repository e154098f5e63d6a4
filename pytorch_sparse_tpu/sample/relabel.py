"""Frontier relabeling (reference ``csrc/cpu/relabel_cpu.cpp``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.convert import to_index_array
from ._common import expand_ranges, first_seen_relabel


def relabel(
    col: jnp.ndarray, idx: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact ``col`` against frontier ``idx``: frontier nodes keep ids
    ``0..len(idx)-1``, unseen cols get fresh ids in first-seen order
    (``relabel_cpu.cpp:5-43``)."""
    n_ids, local = first_seen_relabel(
        np.asarray(col, np.int64), np.asarray(idx, np.int64)
    )
    return to_index_array(local), to_index_array(n_ids)


def relabel_one_hop(
    rowptr: jnp.ndarray,
    col: jnp.ndarray,
    value: Optional[jnp.ndarray],
    idx: jnp.ndarray,
    bipartite: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Take the full 1-hop neighborhood of ``idx`` and relabel
    (``relabel_cpu.cpp:45-143``).  Returns (rowptr, col, value, n_id);
    ``bipartite=False`` pads the rowptr so the output is square over the
    union node set."""
    rowptr_np = np.ascontiguousarray(rowptr, np.int64)
    col_np = np.ascontiguousarray(col, np.int64)
    idx_np = np.ascontiguousarray(idx, np.int64)

    from ..csrc import bindings

    if bindings.available():
        out_rowptr, local, positions, n_ids = bindings.relabel_one_hop(
            rowptr_np, col_np, idx_np
        )
    else:
        counts = rowptr_np[idx_np + 1] - rowptr_np[idx_np]
        _, positions = expand_ranges(rowptr_np[idx_np], counts)
        gathered = col_np[positions]

        n_ids, local = first_seen_relabel(gathered, idx_np)
        out_rowptr = np.concatenate([[0], np.cumsum(counts)])
    n_new = n_ids.shape[0] - idx_np.shape[0]
    if not bipartite:
        out_rowptr = np.concatenate([
            out_rowptr,
            np.full(n_new, positions.shape[0], np.int64),
        ])

    out_value = None
    if value is not None:
        out_value = value[jnp.asarray(positions)]

    return (
        to_index_array(out_rowptr),
        to_index_array(local),
        out_value,
        to_index_array(n_ids),
    )
