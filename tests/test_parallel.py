"""Distributed SpMM over the virtual 8-device mesh (SURVEY.md §4: the
multi-host "fake backend" tests the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor, matmul
from pytorch_sparse_tpu.parallel import (
    ShardedSparseMatrix, dist_spmm, make_mesh,
)


def _random_adj(M, E, seed=0):
    rng = np.random.RandomState(seed)
    A = SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
        col=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    return A


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.mark.parametrize("schedule", ["allgather", "ring", "halo"])
def test_dist_spmm_matches_single_device(mesh, schedule):
    A = _random_adj(100, 700)
    x = jnp.asarray(np.random.RandomState(1).randn(100, 8), jnp.float32)
    expected = matmul(A, x, "sum")

    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    got = Ash.unshard_dense(dist_spmm(Ash, Ash.shard_dense(x), schedule))
    assert np.allclose(got, expected, atol=1e-4)


def test_halo_schedule_grads_and_width(mesh):
    # Halo width is bounded by the worst distinct-remote-column count and
    # the x-gradient matches the dense oracle through the all_to_all.
    A = _random_adj(96, 400, seed=3)
    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    assert 1 <= Ash.halo_width <= Ash.Nb
    x = jnp.asarray(np.random.RandomState(4).randn(96, 4), jnp.float32)
    xs = Ash.shard_dense(x)
    g_x = jax.jit(jax.grad(
        lambda s: (dist_spmm(Ash, s, "halo") ** 2).sum()
    ))(xs)
    expected_gx = jax.grad(
        lambda x: ((A.to_dense() @ x) ** 2).sum()
    )(x)
    assert np.allclose(Ash.unshard_dense(g_x), expected_gx, atol=1e-3)


def test_dist_spmm_grads(mesh):
    A = _random_adj(64, 300)
    x = jnp.asarray(np.random.RandomState(2).randn(64, 4), jnp.float32)
    Ash = ShardedSparseMatrix.from_sparse_tensor(A, mesh)
    xs = Ash.shard_dense(x)

    def loss(vtabs, xs):
        A2 = ShardedSparseMatrix(
            Ash.mesh, Ash.M, Ash.N, Ash.Mb, Ash.Nb,
            Ash.ring_itabs, vtabs, Ash.ring_inv,
            Ash.flat_itabs, Ash.flat_vtabs, Ash.flat_inv,
        )
        return (dist_spmm(A2, xs, "ring") ** 2).sum()

    g_val, g_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        Ash.ring_vtabs, xs
    )
    assert all(bool(jnp.isfinite(g).all()) for g in g_val)
    assert bool(jnp.isfinite(g_x).all())

    # Oracle: dense autodiff on the gathered operand.
    def dense_loss(x):
        return (np.asarray(A.to_dense()) @ x ** 1) ** 2

    expected_gx = jax.grad(
        lambda x: ((A.to_dense() @ x) ** 2).sum()
    )(x)
    got_gx = Ash.unshard_dense(g_x)
    assert np.allclose(got_gx, expected_gx, atol=1e-3)
