"""jit-traceability as a test invariant (SURVEY.md §4: the JAX analogue
of the reference's ``torch.jit.script`` checks, e.g. test_matmul.py:79).

Every op with static output shape must trace under ``jax.jit`` with the
SparseTensor flowing through as a pytree.  Data-dependent ops (coalesce,
index/masked select, SpGEMM structure pass) are eager-only by design and
raise a clear error instead — also asserted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_sparse_tpu as ts


@pytest.fixture(scope="module")
def adj():
    rng = np.random.RandomState(0)
    M, E = 40, 200
    A = ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E)),
        col=jnp.asarray(rng.randint(0, M, E)),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    A.fill_cache_()
    A.storage.ell()
    A.storage.ell_t()
    return A


def test_spmm_jits(adj):
    mat = jnp.ones((40, 8), jnp.float32)
    for reduce in ["sum", "mean", "min", "max"]:
        out = jax.jit(
            lambda a, m, r=reduce: a.spmm(m, r)
        )(adj, mat)
        assert out.shape == (40, 8)


def test_structural_ops_jit(adj):
    mat = jnp.ones((40, 8), jnp.float32)

    @jax.jit
    def f(a, m):
        b = a.t()
        d = ts.mul_nnz(a, a.storage.value() * 0 + 2.0)
        e = ts.add_nnz(a, a.storage.value())
        return (
            b.spmm(m) + d.spmm(m) + e.spmm(m),
            ts.reduction(a, dim=1, reduce="sum"),
        )

    out, red = f(adj, mat)
    assert out.shape == (40, 8) and red.shape == (40,)


def test_data_dependent_ops_raise_under_jit(adj):
    """Ops whose output nnz depends on data are eager-only by design
    (coalesce, narrow/select row slicing, diag editing)."""
    errs = (
        ValueError,
        TypeError,
        jax.errors.ConcretizationTypeError,
        jax.errors.NonConcreteBooleanIndexError,
        jax.errors.TracerIntegerConversionError,
    )
    with pytest.raises(errs):
        jax.jit(lambda a: a.coalesce("add"))(adj)
    with pytest.raises(errs):
        jax.jit(lambda a: ts.narrow(a, 0, 8, 16).nnz())(adj)
    with pytest.raises(errs):
        jax.jit(lambda a: ts.remove_diag(a).nnz())(adj)


def test_grad_through_pytree(adj):
    mat = jnp.ones((40, 8), jnp.float32)

    @jax.jit
    def loss(value, mat):
        return (adj.set_value(value, layout="coo").spmm(mat) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1))(adj.storage.value(), mat)
    assert all(np.isfinite(np.asarray(t)).all() for t in g)
