"""Port of reference ``test/test_matmul.py``: SpMM forward + both gradients
against a dense oracle, across reduce modes and grad dtypes."""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor, matmul
from pytorch_sparse_tpu.testing import (
    grad_dtypes, grad_dtypes_x64, reductions, strict_tolerance, tolerance,
)

BIG = 1e30


def _ordered_oracle(row, col, M, reduce, v, o, g):
    """fp32 oracle reproducing the kernels' summation order — CSR edge
    order per row (``cpu/spmm_cpu.cpp:60-95``), CSC order for the
    transposed gradient pass (``csrc/spmm.cpp:100-108``) — so fp32
    matches at the reference bound atol=1e-7 (``test/test_matmul.py:
    45-47``).  Returns (out, grad_value, grad_other) as numpy f32."""
    row = np.asarray(row)
    col = np.asarray(col)
    E = row.shape[0]
    v = np.asarray(v, np.float32)
    o = np.asarray(o, np.float32)
    g = np.asarray(g, np.float32).copy()
    deg = np.bincount(row, minlength=M)
    csc = np.lexsort((row, col))
    if reduce in ("sum", "add", "mean"):
        out = np.zeros((o.shape[0], M, o.shape[2]), np.float32)
        for e in range(E):
            out[:, row[e]] += v[e] * o[:, col[e]]
        if reduce == "mean":
            d = np.maximum(deg, 1).astype(np.float32)[None, :, None]
            out = out / d
            g = g / d
        gv = np.array(
            [np.float32(np.sum(o[:, col[e]] * g[:, row[e]]))
             for e in range(E)], np.float32,
        )
        go = np.zeros_like(o)
        for e in csc:
            go[:, col[e]] += v[e] * g[:, row[e]]
        return out, gv, go
    # min/max: first CSR-order achiever wins (reducer.h:52-62); empty
    # rows produce 0 with sentinel arg == E.
    big = np.float32(np.inf if reduce == "min" else -np.inf)
    best = np.full((o.shape[0], M, o.shape[2]), big, np.float32)
    arg = np.full(best.shape, E, np.int64)
    for e in range(E):
        cand = v[e] * o[:, col[e]]
        cur = best[:, row[e]]
        better = cand < cur if reduce == "min" else cand > cur
        best[:, row[e]] = np.where(better, cand, cur)
        arg[:, row[e]] = np.where(better, e, arg[:, row[e]])
    out = np.where(arg == E, np.float32(0), best)
    tmp = np.zeros((o.shape[0], E, o.shape[2]), np.float32)
    for e in range(E):
        tmp[:, e] = np.where(arg[:, row[e]] == e, g[:, row[e]], 0)
    gv = np.array(
        [np.float32(np.sum(tmp[:, e] * o[:, col[e]])) for e in range(E)],
        np.float32,
    )
    go = np.zeros_like(o)
    for e in csc:
        go[:, col[e]] += v[e] * tmp[:, e]
    return out, gv, go


def _dense_oracle(row, col, M, N, reduce, dtype=jnp.float32):
    """Dense reference computation with the reference's empty-row semantics
    (mean: /max(count,1); min/max: 0)."""
    row = np.asarray(row)
    col = np.asarray(col)
    mask = np.zeros((M, N), dtype=bool)
    mask[row, col] = True
    mask = jnp.asarray(mask)
    deg = jnp.maximum(mask.sum(axis=1), 1).astype(dtype)

    def fn(value, other):
        A = jnp.zeros((M, N), dtype).at[row, col].set(value)
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
def test_spmm_fp32_strict(reduce):
    """fp32 forward + both grads at the reference bound atol=1e-7
    (``test/test_matmul.py:45-47``) against the order-matched oracle."""
    rng = np.random.RandomState(3)
    src = rng.randn(10, 8)
    src[2:4, :] = 0
    src[:, 2:4] = 0
    A = SparseTensor.from_dense(jnp.asarray(src, jnp.float32))
    row, col, value = A.coo()
    other = jnp.asarray(rng.randn(2, 8, 2), jnp.float32)

    def ours(v, o):
        return matmul(A.set_value(v), o, reduce)

    out, vjp = jax.vjp(ours, value, other)
    grad_out = jnp.asarray(rng.randn(*out.shape), jnp.float32)
    gv, go = vjp(grad_out)
    exp_out, exp_gv, exp_go = _ordered_oracle(
        row, col, 10, reduce, value, other, grad_out
    )
    # np.allclose default rtol=1e-5 matches torch.allclose — the
    # reference's `atol=1e-7` bound is exactly this check.  The ordered
    # oracle makes fwd and grad_mat bit-exact; grad_value's per-edge dot
    # differs by ~2 ulp (FMA in the einsum contraction).
    atol = strict_tolerance(jnp.float32)
    assert np.allclose(exp_out, out, atol=atol, rtol=0)
    assert np.allclose(exp_gv, gv, atol=atol)
    assert np.allclose(exp_go, go, atol=atol, rtol=0)


@pytest.mark.parametrize("dtype,reduce", product(grad_dtypes_x64, reductions))
def test_spmm_float64(dtype, reduce):
    """Reference sweeps double (``testing.py:6-19``); run it in a
    ``jax.enable_x64()`` scope against the dense oracle at 1e-7."""
    with jax.enable_x64():
        rng = np.random.RandomState(4)
        src = rng.randn(10, 8)
        src[2:4, :] = 0
        src[:, 2:4] = 0
        A = SparseTensor.from_dense(jnp.asarray(src, dtype))
        row, col, value = A.coo()
        other = jnp.asarray(rng.randn(2, 8, 2), dtype)
        oracle = _dense_oracle(row, col, 10, 8, reduce, dtype)
        expected, oracle_vjp = jax.vjp(oracle, value, other)
        grad_out = jnp.asarray(rng.randn(*expected.shape), dtype)
        exp_gv, exp_go = oracle_vjp(grad_out)

        out, vjp = jax.vjp(lambda v, o: matmul(A.set_value(v), o, reduce),
                           value, other)
        gv, go = vjp(grad_out)
        assert np.allclose(expected, out, atol=1e-7)
        assert np.allclose(exp_gv, gv, atol=1e-7)
        assert np.allclose(exp_go, go, atol=1e-7)


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
