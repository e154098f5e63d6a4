"""Segment reductions with the reference's empty-segment semantics.

The reference delegates segment reductions to ``torch_scatter``
(``torch_sparse/storage.py:5``, ``torch_sparse/reduce.py:4``) whose contract
is: *mean* divides by ``max(count, 1)`` and *min*/*max* write ``0`` for empty
segments (reference reducer: ``csrc/cpu/reducer.h:64-73``).  These wrappers
pin those semantics on top of ``jax.ops.segment_*`` so every caller in this
package observes identical behavior on CPU and TPU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_count(
    segment_ids: jnp.ndarray, num_segments: int, indices_are_sorted: bool = False
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape[:1], dtype=jnp.int32)
    return jax.ops.segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = segment_count(segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1).astype(total.dtype)
    return total / count.reshape((-1,) + (1,) * (total.ndim - 1))


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    out = jax.ops.segment_min(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return _zero_empty(out, segment_ids, num_segments, indices_are_sorted)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return _zero_empty(out, segment_ids, num_segments, indices_are_sorted)


def _zero_empty(out, segment_ids, num_segments, indices_are_sorted):
    """Replace the +/-inf identity of empty segments with 0 (reducer.h:70-73)."""
    count = segment_count(segment_ids, num_segments, indices_are_sorted)
    mask = (count > 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(mask, out, jnp.zeros_like(out))


def segment_reduce(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    reduce: str = "sum",
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Dispatch on reduce mode, accepting the reference's ``'add'`` alias
    (``torch_sparse/testing.py:6``: reductions = sum/add/mean/min/max)."""
    if reduce in ("sum", "add"):
        return segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    if reduce == "mean":
        return segment_mean(data, segment_ids, num_segments, indices_are_sorted)
    if reduce == "min":
        return segment_min(data, segment_ids, num_segments, indices_are_sorted)
    if reduce == "max":
        return segment_max(data, segment_ids, num_segments, indices_are_sorted)
    raise ValueError(f"Unknown reduce mode: {reduce!r}")
