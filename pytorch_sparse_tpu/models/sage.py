"""GraphSAGE (mean aggregator) — exercises the ``mean``-reduce SpMM and the
``sample_adj`` mini-batch path (reference ``sample.py:27-43`` is the
GraphSAGE loader primitive)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.matmul import spmm
from ..tensor import SparseTensor
from .gcn import _glorot


class GraphSAGE:
    @staticmethod
    def init(key, in_dim, hidden_dim, out_dim, num_layers: int = 2,
             dtype=jnp.float32) -> Dict:
        dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        keys = jax.random.split(key, 2 * num_layers)
        return {
            "layers": [
                {
                    "w_self": _glorot(keys[2 * i], dims[i], dims[i + 1], dtype),
                    "w_neigh": _glorot(
                        keys[2 * i + 1], dims[i], dims[i + 1], dtype
                    ),
                    "b": jnp.zeros((dims[i + 1],), dtype),
                }
                for i in range(num_layers)
            ]
        }

    @staticmethod
    def apply(params: Dict, adj: SparseTensor, x: jnp.ndarray) -> jnp.ndarray:
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            neigh = spmm(adj, x, reduce="mean")
            x = x @ layer["w_self"] + neigh @ layer["w_neigh"] + layer["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
        return x
