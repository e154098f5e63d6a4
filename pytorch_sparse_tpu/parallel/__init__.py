"""Multi-chip distribution layer.

The reference has **no** distributed runtime (SURVEY.md §2.3) — its METIS
``partition`` output (``partptr``, ``perm``) is only data.  Here that output
is promoted to a first-class distribution layer: row-partitioned sparse
matrices over a ``jax.sharding.Mesh``, with distributed SpMM via
``shard_map`` and XLA collectives (all_gather / ppermute ring with
compute-communication overlap), the TPU analogue of ring attention's KV
rotation (SURVEY.md §5 "long-context" mapping).  A 2-D ``(row, feature)``
mesh (``make_mesh2d``) additionally shards the dense operand's feature
dimension, dividing every collective's per-chip bytes by the feature-axis
size — the large-K / papers100M-halo lever.

Multi-slice pods add a fabric hierarchy: ICI inside a slice, DCN (an
order of magnitude slower) between slices.  ``make_mesh_hier`` +
``HierShardedSparseMatrix`` + ``dist_spmm_hier`` split the halo traffic
accordingly — intra-slice halos over ICI only, cross-slice rows
deduplicated at the slice level (the union any chip of the slice needs
crosses DCN once) — see ``hier.py``.
"""

from .mesh import make_mesh, make_mesh2d, data_axis, feat_axis  # noqa
from .dist import (  # noqa
    ShardedSparseMatrix, dist_spmm, dist_spmm_allgather, dist_spmm_halo,
    dist_spmm_ring,
)
from .hier import (  # noqa
    HierShardedSparseMatrix, dcn_axis, dist_spmm_hier, make_mesh_hier,
)
