"""Distributed GCN: the flagship multi-chip training configuration.

Rows of the (METIS-permuted) adjacency are partitioned over the mesh;
node features and all activations live row-sharded; every graph
aggregation is a ring-overlapped distributed SpMM; dense projections act
shard-locally; parameter gradients reduce automatically because the whole
step is one jit-compiled SPMD program.
"""

from __future__ import annotations

from typing import Dict, Tuple

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
        schedule: str = "ring",
    ) -> jnp.ndarray:
        from ..parallel.hier import HierShardedSparseMatrix, dist_spmm_hier

        hier = isinstance(adj, HierShardedSparseMatrix)
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            x = x @ layer["w"]                       # shard-local (P,Nb,D)
            agg = (dist_spmm_hier(adj, x) if hier
                   else dist_spmm(adj, x, schedule))
            x = agg + layer["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
        return x

    @staticmethod
    def loss(
        params, adj: ShardedSparseMatrix, x, labels, mask,
        schedule: str = "ring",
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
        optimizer, schedule: str = "ring",
    ) -> Tuple[Dict, object, jnp.ndarray]:
        loss, grads = jax.value_and_grad(DistGCN.loss)(
            params, adj, x, labels, mask, schedule
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        return params, opt_state, loss
