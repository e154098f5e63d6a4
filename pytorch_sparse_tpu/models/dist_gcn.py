"""Distributed GCN: the flagship multi-chip training configuration.

Rows of the (METIS-permuted) adjacency are partitioned over the mesh;
node features and all activations live row-sharded; every graph
aggregation is a ring-overlapped distributed SpMM; dense projections act
shard-locally; parameter gradients reduce automatically because the whole
step is one jit-compiled SPMD program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..parallel.dist import ShardedSparseMatrix, dist_spmm
from .gcn import GCN


class DistGCN:
    """Stacked layout: features/logits are (P, Nb, D) arrays sharded on
    the leading axis (see :meth:`ShardedSparseMatrix.shard_dense`)."""

    init = GCN.init  # same parameter pytree

    @staticmethod
    def apply(
        params: Dict, adj: ShardedSparseMatrix, x: jnp.ndarray,
        schedule: Optional[str] = None,
        local_format: str = "auto",
    ) -> jnp.ndarray:
        """``schedule``: ring/allgather/halo for a flat
        ``ShardedSparseMatrix`` (default ring); a
        ``HierShardedSparseMatrix`` always runs its own hierarchical
        schedule — passing any other name for one is an error rather
        than being silently ignored.

        ``local_format``: the halo schedule's local compute
        (:func:`dist_spmm_halo`).  GCN training differentiates features
        and weights, never edge values, so the default ``"auto"``
        safely uses the interior dense blocks (MXU) when the matrix
        carries them."""
        from ..parallel.hier import HierShardedSparseMatrix, dist_spmm_hier

        hier = isinstance(adj, HierShardedSparseMatrix)
        if hier and schedule not in (None, "hier"):
            raise ValueError(
                f"schedule={schedule!r} requested but `adj` is a "
                "HierShardedSparseMatrix (runs the hierarchical "
                "schedule only)"
            )
        schedule = schedule or "ring"
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            x = x @ layer["w"]                       # shard-local (P,Nb,D)
            agg = (dist_spmm_hier(adj, x, local_format=local_format)
                   if hier
                   else dist_spmm(adj, x, schedule,
                                  local_format=local_format))
            x = agg + layer["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
        return x

    @staticmethod
    def loss(
        params, adj: ShardedSparseMatrix, x, labels, mask,
        schedule: Optional[str] = None,
    ) -> jnp.ndarray:
        """labels/mask: (P, Nb) stacked+sharded like x (mask zeroes the
        padding rows)."""
        logits = DistGCN.apply(params, adj, x, schedule)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

    @staticmethod
    def train_step(
        params, opt_state, adj: ShardedSparseMatrix, x, labels, mask,
        optimizer, schedule: Optional[str] = None,
    ) -> Tuple[Dict, object, jnp.ndarray]:
        loss, grads = jax.value_and_grad(DistGCN.loss)(
            params, adj, x, labels, mask, schedule
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        return params, opt_state, loss
