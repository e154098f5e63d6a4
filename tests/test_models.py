"""Model-family smoke + correctness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.models import GAT, GCN, GIN, GraphSAGE, gcn_norm


def _graph(M=30, E=150, F=8, seed=0):
    rng = np.random.RandomState(seed)
    A = SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
        col=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
        sparse_sizes=(M, M),
    ).coalesce()
    x = jnp.asarray(rng.randn(M, F), jnp.float32)
    return A, x


def test_gcn_norm_rows():
    A, _ = _graph()
    An = gcn_norm(A)
    # symmetric normalization of a symmetric graph keeps values in (0, 1]
    v = An.storage.value()
    assert bool((v > 0).all()) and bool((v <= 1.0 + 1e-6).all())


def test_gcn_forward_backward():
    A, x = _graph()
    An = gcn_norm(A)
    params = GCN.init(jax.random.PRNGKey(0), 8, 16, 4)
    logits = jax.jit(GCN.apply)(params, An, x)
    assert logits.shape == (30, 4)

    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4, 30))
    loss, grads = jax.value_and_grad(GCN.loss)(params, An, x, labels)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_sage_gat_gin_forward():
    A, x = _graph()
    for cls, extra in [(GraphSAGE, {}), (GIN, {})]:
        params = cls.init(jax.random.PRNGKey(1), 8, 16, 3, **extra)
        out = jax.jit(cls.apply)(params, A, x)
        assert out.shape == (30, 3)
        assert bool(jnp.isfinite(out).all())

    params = GAT.init(jax.random.PRNGKey(2), 8, 8, 3, heads=2)
    out = jax.jit(GAT.apply)(params, A, x)
    assert out.shape == (30, 3)
    assert bool(jnp.isfinite(out).all())


def test_gcn_trains():
    """A few steps of gradient descent must reduce the loss."""
    A, x = _graph(M=20, E=80, F=6)
    An = gcn_norm(A)
    labels = jnp.asarray(np.random.RandomState(3).randint(0, 3, 20))
    params = GCN.init(jax.random.PRNGKey(3), 6, 8, 3)

    @jax.jit
    def step(params):
        loss, grads = jax.value_and_grad(GCN.loss)(params, An, x, labels)
        params = jax.tree_util.tree_map(
            lambda p, g: p - 0.5 * g, params, grads
        )
        return params, loss

    losses = []
    for _ in range(8):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
