"""Tests for the scatter-free ELLPACK SpMM fast path (ops/kernels/ell.py)
and the Pallas sorted-segment reduce kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_sparse_tpu as ts
from pytorch_sparse_tpu.ops.kernels.ell import ell_spmm


def _random_graph(M, N, E, seed=0, with_value=True):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, M, E).astype(np.int32)
    col = rng.randint(0, N, E).astype(np.int32)
    value = rng.randn(E).astype(np.float32) if with_value else None
    A = ts.SparseTensor(
        row=jnp.asarray(row), col=jnp.asarray(col),
        value=None if value is None else jnp.asarray(value),
        sparse_sizes=(M, N),
    )
    return A


def _dense_oracle(A, mat):
    return np.asarray(A.to_dense()) @ np.asarray(mat)


@pytest.mark.parametrize("with_value", [True, False])
@pytest.mark.parametrize("shape", [(60, 50, 400), (33, 70, 1), (20, 20, 0)])
def test_ell_spmm_matches_oracle(shape, with_value):
    M, N, E = shape
    A = _random_graph(M, N, E, seed=E + with_value, with_value=with_value)
    mat = jnp.asarray(np.random.RandomState(1).randn(N, 16).astype(np.float32))

    ell = A.storage.ell()
    assert ell is not None
    out = ell_spmm(ell, A.storage.value(), mat)
    ref = _dense_oracle(A, mat)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_ell_skewed_degrees():
    # One very dense row (forces a wide bucket) + many empty rows.
    M, N = 300, 40
    rng = np.random.RandomState(3)
    row = np.concatenate([np.zeros(500, np.int64), rng.randint(1, 10, 50)])
    col = rng.randint(0, N, row.shape[0])
    val = rng.randn(row.shape[0]).astype(np.float32)
    A = ts.SparseTensor(
        row=jnp.asarray(row), col=jnp.asarray(col), value=jnp.asarray(val),
        sparse_sizes=(M, N),
    ).coalesce("add")
    mat = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    out = ts.spmm_sum(A, mat)
    np.testing.assert_allclose(
        np.asarray(out), _dense_oracle(A, mat), atol=1e-4
    )


def test_ell_spmm_sum_gradients_match_segment_path():
    M, N, E, K = 40, 30, 200, 8
    A = _random_graph(M, N, E, seed=7)
    rng = np.random.RandomState(2)
    mat = jnp.asarray(rng.randn(N, K).astype(np.float32))
    cot = jnp.asarray(rng.randn(M, K).astype(np.float32))

    from pytorch_sparse_tpu.ops.matmul import _spmm_sum

    row, col = A.storage.row(), A.storage.col()
    value = A.storage.value()

    def f_ell(value, mat):
        B = ts.SparseTensor(
            row=row, col=col, value=value, sparse_sizes=(M, N),
            is_sorted=True, trust_data=True,
        )
        return jnp.vdot(ts.spmm_sum(B, mat), cot)

    def f_seg(value, mat):
        return jnp.vdot(_spmm_sum(M, row, col, value, mat), cot)

    g_ell = jax.grad(f_ell, argnums=(0, 1))(value, mat)
    g_seg = jax.grad(f_seg, argnums=(0, 1))(value, mat)
    np.testing.assert_allclose(
        np.asarray(g_ell[0]), np.asarray(g_seg[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_ell[1]), np.asarray(g_seg[1]), atol=1e-4
    )


def test_ell_mean_gradients():
    M, N, E, K = 25, 25, 120, 4
    A = _random_graph(M, N, E, seed=11)
    rng = np.random.RandomState(4)
    mat = jnp.asarray(rng.randn(N, K).astype(np.float32))

    deg = np.maximum(np.asarray(A.storage.rowcount()), 1)
    dense = np.asarray(A.to_dense())

    def f(mat):
        return jnp.sum(A.spmm(mat, "mean") ** 2)

    out = A.spmm(mat, "mean")
    ref = dense @ np.asarray(mat) / deg[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    g = jax.grad(f)(mat)
    g_ref = (dense / deg[:, None]).T @ (2 * ref)
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-3)


def test_ell_survives_jit_via_pytree():
    M, N, E, K = 50, 50, 300, 8
    A = _random_graph(M, N, E, seed=5)
    A.storage.ell()
    A.storage.ell_t()
    mat = jnp.asarray(np.random.RandomState(6).randn(N, K).astype(np.float32))

    @jax.jit
    def f(A, mat):
        return ts.spmm_sum(A, mat)

    out = f(A, mat)
    np.testing.assert_allclose(
        np.asarray(out), _dense_oracle(A, mat), atol=1e-4
    )


def test_ell_set_value_keeps_structure():
    M, N, E = 30, 30, 150
    A = _random_graph(M, N, E, seed=9)
    assert A.storage.ell() is not None
    rng = np.random.RandomState(10)
    B = A.set_value(jnp.asarray(rng.randn(A.nnz()).astype(np.float32)),
                    layout="coo")
    assert B.storage.has_ell()
    mat = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(ts.spmm_sum(B, mat)), _dense_oracle(B, mat), atol=1e-4
    )


def test_build_ell_transpose_view():
    M, N, E = 35, 28, 180
    A = _random_graph(M, N, E, seed=13)
    ell_t = A.storage.ell_t()
    mat = jnp.asarray(np.random.RandomState(1).randn(M, 8).astype(np.float32))
    out = ell_spmm(ell_t, A.storage.value(), mat)
    ref = np.asarray(A.to_dense()).T @ np.asarray(mat)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


@pytest.mark.parametrize("reduce", ["min", "max"])
def test_ell_minmax_matches_segment_path(reduce):
    from pytorch_sparse_tpu.ops.matmul import _spmm_min, _spmm_max

    M, N, E, K = 45, 35, 220, 8
    A = _random_graph(M, N, E, seed=21)
    rng = np.random.RandomState(3)
    mat = jnp.asarray(rng.randn(N, K).astype(np.float32))
    cot = jnp.asarray(rng.randn(M, K).astype(np.float32))

    row, col = A.storage.row(), A.storage.col()
    value = A.storage.value()
    seg_fn = _spmm_min if reduce == "min" else _spmm_max

    out_ell, arg_ell = (ts.spmm_min if reduce == "min" else ts.spmm_max)(
        A, mat
    )
    out_seg, arg_seg = seg_fn(M, row, col, value, mat)
    np.testing.assert_allclose(
        np.asarray(out_ell), np.asarray(out_seg), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(arg_ell), np.asarray(arg_seg))

    def f_ell(value, mat):
        B = ts.SparseTensor(row=row, col=col, value=value,
                            sparse_sizes=(M, N), is_sorted=True,
                            trust_data=True)
        out = (ts.spmm_min if reduce == "min" else ts.spmm_max)(B, mat)[0]
        return jnp.vdot(out, cot)

    def f_seg(value, mat):
        return jnp.vdot(seg_fn(M, row, col, value, mat)[0], cot)

    g_ell = jax.grad(f_ell, argnums=(0, 1))(value, mat)
    g_seg = jax.grad(f_seg, argnums=(0, 1))(value, mat)
    np.testing.assert_allclose(np.asarray(g_ell[0]), np.asarray(g_seg[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ell[1]), np.asarray(g_seg[1]),
                               atol=1e-5)


def test_ell_edge_softmax_matches_segment():
    from pytorch_sparse_tpu.models.gat import edge_softmax
    from pytorch_sparse_tpu.ops.kernels.ell import ell_edge_softmax

    A = _random_graph(45, 45, 250, seed=17)
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(A.nnz(), 4).astype(np.float32))
    a1 = ell_edge_softmax(A.storage.ell(), logits)
    a2 = edge_softmax(A.storage.row(), logits, 45)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


@pytest.mark.parametrize("reduce", ["sum", "mean", "min", "max"])
def test_batched_spmm(reduce):
    """Batched dense operand (B, N, K) — reference spmm kernels accept a
    batch dim (cpu/spmm_cpu.cpp:45)."""
    M, N, E, B, K = 30, 25, 150, 3, 8
    A = _random_graph(M, N, E, seed=23)
    rng = np.random.RandomState(6)
    mats = jnp.asarray(rng.randn(B, N, K).astype(np.float32))
    out = A.spmm(mats, reduce)
    assert out.shape == (B, M, K)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(A.spmm(mats[b], reduce)),
            atol=1e-5,
        )


def test_cold_cache_closure_jit_no_tracer_leak():
    """A tensor with COLD caches closed over by a jitted function must
    not leak tracers: cache builds are eager-only (storage._tracing),
    so under tracing the op falls back to the trace-safe segment path,
    and repeated jits (different static shapes) stay consistent.
    Regression: jax 0.9 UnexpectedTracerError via ell_baked filling
    inside a fori_loop trace (probe_ell_decomp, round 4)."""
    import jax

    rng = np.random.RandomState(3)
    M, E = 300, 4000
    row = np.sort(rng.randint(0, M, E))
    col = rng.randint(0, M, E)
    order = np.lexsort((col, row))
    A = ts.SparseTensor(
        row=jnp.asarray(row[order]), col=jnp.asarray(col[order]),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M), is_sorted=True, trust_data=True,
    )
    assert not A.storage.has_ell()
    x1 = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    x2 = jnp.asarray(rng.randn(M, 16).astype(np.float32))
    f = jax.jit(lambda m: ts.spmm_sum(A, m))
    out1 = f(x1)            # first trace: caches cold
    out2 = f(x2)            # second trace (new K): must not see leaks
    assert not A.storage.has_ell()  # no cache was built under tracing
    dense = np.zeros((M, M), np.float32)
    np.add.at(dense, (row[order], col[order]),
              np.asarray(A.storage.value()))
    np.testing.assert_allclose(np.asarray(out1), dense @ np.asarray(x1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), dense @ np.asarray(x2),
                               atol=1e-4)
    # eager prefill engages the fast path for later jits
    A.storage.ell(), A.storage.ell_t()
    assert A.storage.has_ell()
    out3 = jax.jit(lambda m: ts.spmm_sum(A, m))(x1)
    np.testing.assert_allclose(np.asarray(out3), dense @ np.asarray(x1),
                               atol=1e-4)
