"""Graph Isomorphism Network — sum-aggregation SpMM + MLP head."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.matmul import spmm
from ..tensor import SparseTensor
from .gcn import _glorot


class GIN:
    @staticmethod
    def init(key, in_dim, hidden_dim, out_dim, num_layers: int = 2,
             dtype=jnp.float32) -> Dict:
        dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        keys = jax.random.split(key, 2 * num_layers)
        return {
            "eps": jnp.zeros((num_layers,), dtype),
            "layers": [
                {
                    "w1": _glorot(keys[2 * i], dims[i], dims[i], dtype),
                    "w2": _glorot(keys[2 * i + 1], dims[i], dims[i + 1], dtype),
                    "b1": jnp.zeros((dims[i],), dtype),
                    "b2": jnp.zeros((dims[i + 1],), dtype),
                }
                for i in range(num_layers)
            ],
        }

    @staticmethod
    def apply(params: Dict, adj: SparseTensor, x: jnp.ndarray) -> jnp.ndarray:
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            agg = spmm(adj, x, reduce="sum")
            x = (1.0 + params["eps"][i]) * x + agg
            x = jax.nn.relu(x @ layer["w1"] + layer["b1"])
            x = x @ layer["w2"] + layer["b2"]
            if i < n - 1:
                x = jax.nn.relu(x)
        return x
