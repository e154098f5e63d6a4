"""Port of reference ``test/test_matmul.py``: SpMM forward + both gradients
against a dense oracle, across reduce modes and grad dtypes."""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor, matmul
from pytorch_sparse_tpu.testing import grad_dtypes, reductions, tolerance

BIG = 1e30


def _dense_oracle(row, col, M, N, reduce):
    """Dense reference computation with the reference's empty-row semantics
    (mean: /max(count,1); min/max: 0)."""
    row = np.asarray(row)
    col = np.asarray(col)
    mask = np.zeros((M, N), dtype=bool)
    mask[row, col] = True
    mask = jnp.asarray(mask)
    deg = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)

    def fn(value, other):
        A = jnp.zeros((M, N), jnp.float32).at[row, col].set(value)
        if reduce in ("sum", "add"):
            return jnp.einsum("mn,bnk->bmk", A, other)
        if reduce == "mean":
            return jnp.einsum("mn,bnk->bmk", A, other) / deg[None, :, None]
        prod = A[None, :, :, None] * other[:, None, :, :]
        fill = BIG if reduce == "min" else -BIG
        cand = jnp.where(mask[None, :, :, None], prod, fill)
        red = cand.min(axis=2) if reduce == "min" else cand.max(axis=2)
        empty = ~mask.any(axis=1)
        return jnp.where(empty[None, :, None], 0.0, red)

    return fn


@pytest.mark.parametrize("dtype,reduce", product(grad_dtypes, reductions))
def test_spmm(dtype, reduce):
    rng = np.random.RandomState(0)
    src = rng.randn(10, 8)
    src[2:4, :] = 0  # Remove multiple rows.
    src[:, 2:4] = 0  # Remove multiple columns.
    A = SparseTensor.from_dense(jnp.asarray(src, jnp.float32))
    row, col, value = A.coo()

    other = jnp.asarray(rng.randn(2, 8, 2), jnp.float32)
    oracle = _dense_oracle(row, col, 10, 8, reduce)
    expected, oracle_vjp = jax.vjp(oracle, value, other)
    grad_out = jnp.asarray(rng.randn(*expected.shape), jnp.float32)
    exp_gv, exp_go = oracle_vjp(grad_out)

    def ours(v, o):
        return matmul(
            A.set_value(v.astype(dtype)), o.astype(dtype), reduce
        ).astype(jnp.float32)

    out, ours_vjp = jax.vjp(ours, value, other)
    got_gv, got_go = ours_vjp(grad_out)

    atol = tolerance(dtype)
    assert np.allclose(expected, out, atol=atol)
    assert np.allclose(exp_gv, got_gv, atol=atol)
    assert np.allclose(exp_go, got_go, atol=atol)


@pytest.mark.parametrize("reduce", reductions)
def test_spmm_jit(reduce):
    """JAX analogue of the reference's torch.jit.script invariant
    (``test/test_matmul.py:79``): the op must be jit-traceable."""
    rng = np.random.RandomState(1)
    A = SparseTensor.from_dense(jnp.asarray(rng.rand(6, 5) > 0.5, jnp.float32))
    other = jnp.asarray(rng.randn(5, 3), jnp.float32)

    eager = matmul(A, other, reduce)
    jitted = jax.jit(lambda a, o: matmul(a, o, reduce))(A, other)
    assert np.allclose(eager, jitted, atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_spspmm_tensor(dtype):
    src = jnp.eye(3, dtype=dtype)
    src = SparseTensor.from_dense(src)
    out = matmul(src, src)
    assert out.sizes() == [3, 3]
    assert out.has_value()
    rowptr, col, value = out.csr()
    assert rowptr.tolist() == [0, 1, 2, 3]
    assert col.tolist() == [0, 1, 2]
    assert value.tolist() == [1, 1, 1]

    src = src.set_value(None)
    out = matmul(src, src)
    assert out.sizes() == [3, 3]
    assert not out.has_value()
    rowptr, col, value = out.csr()
    assert rowptr.tolist() == [0, 1, 2, 3]
    assert col.tolist() == [0, 1, 2]


def test_spspmm_value_grad():
    """SpGEMM value gradients (capability-parity-plus: the reference
    delegates to torch.sparse.mm, SURVEY.md §3.3)."""
    rng = np.random.RandomState(2)
    a = (rng.rand(5, 4) > 0.5) * rng.randn(5, 4)
    b = (rng.rand(4, 6) > 0.5) * rng.randn(4, 6)
    A = SparseTensor.from_dense(jnp.asarray(a, jnp.float32))
    B = SparseTensor.from_dense(jnp.asarray(b, jnp.float32))
    rowA, colA, valA = A.coo()
    rowB, colB, valB = B.coo()

    def ours(va, vb):
        C = matmul(A.set_value(va), B.set_value(vb))
        return (C.storage.value() ** 2).sum()

    def oracle(va, vb):
        da = jnp.zeros((5, 4)).at[rowA, colA].set(va)
        db = jnp.zeros((4, 6)).at[rowB, colB].set(vb)
        return ((da @ db) ** 2).sum()

    g_ours = jax.grad(ours, argnums=(0, 1))(valA, valB)
    g_oracle = jax.grad(oracle, argnums=(0, 1))(valA, valB)
    assert np.allclose(g_ours[0], g_oracle[0], atol=1e-5)
    assert np.allclose(g_ours[1], g_oracle[1], atol=1e-5)
