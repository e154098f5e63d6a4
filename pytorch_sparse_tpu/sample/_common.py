"""Shared host-side sampling utilities.

The reference's hash maps (``phmap::flat_hash_map`` insertion-order
relabeling) become vectorized numpy: first-seen-order unique assignment via
``np.unique`` + first-position ranking.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

Seed = Union[None, int, np.random.Generator]


def as_generator(seed: Seed) -> np.random.Generator:
    if isinstance(seed, np.random.Generator):
        return seed
    return np.random.default_rng(seed)


def first_seen_relabel(
    stream: np.ndarray, priors: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Assign compact ids in first-seen order.

    ``priors`` (unique) get ids ``0..len(priors)-1``; each new value in
    ``stream`` gets the next id at its first occurrence.  Returns
    ``(n_ids, local)`` where ``n_ids`` is the id->original mapping and
    ``local`` relabels ``stream``.  Mirrors the reference's insertion-order
    ``n_id_map`` (``cpu/relabel_cpu.cpp:20-36``).
    """
    combined = np.concatenate([priors, stream])
    uniq, inverse = np.unique(combined, return_inverse=True)
    first_pos = np.full(uniq.shape[0], combined.shape[0], dtype=np.int64)
    np.minimum.at(first_pos, inverse, np.arange(combined.shape[0]))
    order = np.argsort(first_pos, kind="stable")
    rank_of_uniq = np.empty(uniq.shape[0], dtype=np.int64)
    rank_of_uniq[order] = np.arange(uniq.shape[0])
    local = rank_of_uniq[inverse]
    n_ids = combined[np.sort(first_pos)]
    return n_ids, local[priors.shape[0]:]


def expand_ranges(
    starts: np.ndarray, counts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """For each i, emit positions ``starts[i] .. starts[i]+counts[i]-1``.

    Returns ``(owner, positions)`` where ``owner[j]`` is the source index i
    of ``positions[j]``.  Vectorized replacement for the reference's nested
    CSR walks.
    """
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    owner = np.repeat(np.arange(counts.shape[0]), counts)
    run_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offset = np.arange(total) - run_start[owner]
    return owner, starts[owner] + offset


def sample_per_row(
    counts: np.ndarray,
    num_neighbors: int,
    replace: bool,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniformly sample up to ``num_neighbors`` offsets within each row.

    Returns ``(owner, offsets)``: for each kept draw, the row index and the
    in-row offset.  ``num_neighbors < 0`` means take all.  Matches the
    reference's branch structure (``cpu/sample_cpu.cpp:40-114``): rows with
    ``count == 0`` contribute nothing; without replacement, rows with
    ``count <= num_neighbors`` keep every edge.
    """
    n = counts.shape[0]
    if num_neighbors < 0:
        return expand_ranges(np.zeros(n, np.int64), counts)

    if replace:
        keep = counts > 0
        owner = np.repeat(np.arange(n)[keep], num_neighbors)
        draws = rng.random(owner.shape[0])
        offsets = (draws * counts[owner]).astype(np.int64)
        return owner, offsets

    # Without replacement: rank random keys per row, keep the smallest
    # `num_neighbors` (uniform subset, like the reference's Robert-Floyd
    # branch; only the subset matters -- per-row output is re-sorted by
    # local id downstream).
    take = np.minimum(counts, num_neighbors)
    maxc = int(counts.max()) if n > 0 else 0
    if maxc == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    keys = rng.random((n, maxc))
    keys[np.arange(maxc)[None, :] >= counts[:, None]] = np.inf
    order = np.argsort(keys, axis=1)
    owner, pick = expand_ranges(np.zeros(n, np.int64), take)
    offsets = order[owner, pick]
    return owner, offsets
