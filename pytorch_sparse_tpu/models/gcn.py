"""Graph Convolutional Network on top of the SpMM stack.

The canonical consumer workload of the reference library (SpMM with a
symmetric-normalized adjacency; cf. SURVEY.md §7 step 2: "a 2-layer GCN
forward/backward is just two SpMMs + dense matmuls").  Pure functional
params (pytree dict), MXU-friendly: dense projection first, then SpMM over
the projected features so the gather width is the hidden size.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.diag import fill_diag
from ..ops.matmul import spmm
from ..tensor import SparseTensor


def gcn_norm(
    adj: SparseTensor, add_self_loops: bool = True
) -> SparseTensor:
    """A_hat = D^-1/2 (A + I) D^-1/2 with degree computed on values."""
    if adj.storage.value() is None:
        adj = adj.fill_value(1.0)
    if add_self_loops:
        adj = fill_diag(adj, 1.0)
    row, col, value = adj.coo()
    deg = jax.ops.segment_sum(
        value, row, adj.sparse_size(0), indices_are_sorted=True
    )
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    value = dinv[row] * value * dinv[col]
    return adj.set_value(value, layout="coo")


def _glorot(key, fan_in, fan_out, dtype=jnp.float32):
    scale = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, (fan_in, fan_out), dtype, minval=-scale, maxval=scale
    )


class GCN:
    """Functional n-layer GCN. ``params = GCN.init(...)``;
    ``logits = GCN.apply(params, adj_norm, x)``."""

    @staticmethod
    def init(
        key, in_dim: int, hidden_dim: int, out_dim: int, num_layers: int = 2,
        dtype=jnp.float32,
    ) -> Dict:
        dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        keys = jax.random.split(key, num_layers)
        return {
            "layers": [
                {
                    "w": _glorot(k, dims[i], dims[i + 1], dtype),
                    "b": jnp.zeros((dims[i + 1],), dtype),
                }
                for i, k in enumerate(keys)
            ]
        }

    @staticmethod
    def apply(
        params: Dict, adj, x: jnp.ndarray,
        dropout_rate: float = 0.0, dropout_key=None,
    ) -> jnp.ndarray:
        """``adj``: a SparseTensor, or a HybridFormat (block-dense MXU
        aggregation; note adjacency-VALUE gradients do not flow through
        prebuilt hybrid blocks — feature gradients do)."""
        from ..ops.kernels.hybrid import HybridFormat, hybrid_spmm

        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            # Project first (MXU matmul at full width), then aggregate
            # (SpMM gather at the narrower output width).  A hybrid
            # (block-dense + ELL) adjacency aggregates on the MXU —
            # 3.9x over the gather path on community graphs.
            x = x @ layer["w"]
            if isinstance(adj, HybridFormat):
                x = hybrid_spmm(adj, x) + layer["b"]
            else:
                x = spmm(adj, x, reduce="sum") + layer["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
                if dropout_rate > 0.0 and dropout_key is not None:
                    dropout_key, sub = jax.random.split(dropout_key)
                    keep = jax.random.bernoulli(
                        sub, 1.0 - dropout_rate, x.shape
                    )
                    x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
        return x

    @staticmethod
    def loss(params, adj, x, labels, mask=None) -> jnp.ndarray:
        logits = GCN.apply(params, adj, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        if mask is not None:
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)
        return nll.mean()
