"""Property-based invariants over random graphs (hypothesis).

These complement the ported reference tests with randomized structure:
round-trips, involutions, and oracle equalities that must hold for any
sparse matrix.
"""

import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

import pytorch_sparse_tpu as ts

# This container is ONE shared, contended core: example generation can
# blow hypothesis' wall-clock health checks while the suite competes
# with TPU benches for the CPU (observed FailedHealthCheck[too_slow]
# with the test passing in isolation).  Slowness is environmental, not
# a property failure — suppress the timing-based checks suite-wide.
settings.register_profile(
    "shared-core",
    suppress_health_check=[HealthCheck.too_slow],
    deadline=None,
)
settings.load_profile("shared-core")


@st.composite
def graphs(draw, max_n=24, max_e=80, with_value=True):
    M = draw(st.integers(1, max_n))
    N = draw(st.integers(1, max_n))
    E = draw(st.integers(0, max_e))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    row = rng.randint(0, M, E)
    col = rng.randint(0, N, E)
    value = rng.randn(E).astype(np.float32) if with_value else None
    A = ts.SparseTensor(
        row=jnp.asarray(row), col=jnp.asarray(col),
        value=None if value is None else jnp.asarray(value),
        sparse_sizes=(M, N),
    ).coalesce("add")
    return A


@settings(max_examples=10, deadline=None)
@given(graphs())
def test_dense_roundtrip(A):
    D = np.asarray(A.to_dense())
    B = ts.SparseTensor.from_dense(jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(B.to_dense()), D, atol=1e-6)


@settings(max_examples=10, deadline=None)
@given(graphs())
def test_transpose_involution(A):
    B = A.t().t()
    np.testing.assert_allclose(
        np.asarray(B.to_dense()), np.asarray(A.to_dense()), atol=1e-6
    )


@settings(max_examples=8, deadline=None)
@given(graphs(), st.integers(1, 6))
def test_spmm_matches_dense(A, K):
    rng = np.random.RandomState(K)
    X = rng.randn(A.sparse_size(1), K).astype(np.float32)
    out = np.asarray(A.spmm(jnp.asarray(X), "sum"))
    ref = np.asarray(A.to_dense()) @ X
    np.testing.assert_allclose(out, ref, atol=1e-4)


@settings(max_examples=8, deadline=None)
@given(graphs())
def test_row_col_reductions_match_dense(A):
    D = np.asarray(A.to_dense())
    np.testing.assert_allclose(
        np.asarray(ts.reduction(A, 1, "sum")), D.sum(1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ts.reduction(A, 0, "sum")), D.sum(0), atol=1e-4
    )


@settings(max_examples=8, deadline=None)
@given(graphs(max_n=16, max_e=50))
def test_spspmm_matches_dense(A):
    B = A.t()
    C = ts.matmul(A, B, "sum")
    ref = np.asarray(A.to_dense()) @ np.asarray(B.to_dense())
    np.testing.assert_allclose(np.asarray(C.to_dense()), ref, atol=1e-3)


@settings(max_examples=8, deadline=None)
@given(graphs(), st.integers(0, 2**31 - 1))
def test_narrow_cat_roundtrip(A, seed):
    M = A.sparse_size(0)
    if M < 2:
        return
    k = M // 2
    top = ts.narrow(A, 0, 0, k)
    bot = ts.narrow(A, 0, k, M - k)
    B = ts.cat([top, bot], dim=0)
    np.testing.assert_allclose(
        np.asarray(B.to_dense()), np.asarray(A.to_dense()), atol=1e-6
    )


@settings(max_examples=6, deadline=None)
@given(graphs(with_value=True))
def test_remove_then_set_diag(A):
    if A.sparse_size(0) != A.sparse_size(1):
        return
    D = np.asarray(A.to_dense())
    B = ts.set_diag(ts.remove_diag(A), jnp.ones(A.sparse_size(0)))
    expect = D.copy()
    np.fill_diagonal(expect, 1.0)
    np.testing.assert_allclose(np.asarray(B.to_dense()), expect, atol=1e-6)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 24), st.integers(0, 80))
def test_host_and_device_construction_agree(seed, n, e):
    # Numpy-input (host fast path) and jnp-input (device path)
    # constructions must produce identical storages and derived views.
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    val = rng.randn(e).astype(np.float32)
    Ah = ts.SparseTensor(row=row, col=col, value=jnp.asarray(val),
                         sparse_sizes=(n, n))
    Ad = ts.SparseTensor(row=jnp.asarray(row), col=jnp.asarray(col),
                         value=jnp.asarray(val), sparse_sizes=(n, n))
    for name in ("row", "col", "rowptr", "colptr", "csr2csc", "csc2csr"):
        vh = np.asarray(getattr(Ah.storage, name)())
        vd = np.asarray(getattr(Ad.storage, name)())
        np.testing.assert_array_equal(vh, vd, err_msg=name)
    np.testing.assert_allclose(np.asarray(Ah.storage.value()),
                               np.asarray(Ad.storage.value()), atol=0)
    # coalesce equivalence (host path vs device path)
    Ch, Cd = Ah.coalesce("add"), Ad.coalesce("add")
    np.testing.assert_array_equal(np.asarray(Ch.storage.row()),
                                  np.asarray(Cd.storage.row()))
    np.testing.assert_array_equal(np.asarray(Ch.storage.col()),
                                  np.asarray(Cd.storage.col()))
    # host reduceat sums sequentially, XLA segment_sum pairwise — equal
    # only to f32 rounding
    np.testing.assert_allclose(np.asarray(Ch.storage.value()),
                               np.asarray(Cd.storage.value()),
                               rtol=1e-5, atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_host_transpose_narrow_agree_with_dense(seed):
    rng = np.random.RandomState(seed)
    M, N, E = 15, 12, 60
    A = ts.SparseTensor(row=rng.randint(0, M, E), col=rng.randint(0, N, E),
                        value=jnp.asarray(rng.randn(E).astype(np.float32)),
                        sparse_sizes=(M, N)).coalesce("add")
    D = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(A.t().to_dense()), D.T, atol=1e-6)
    blk = A.narrow(0, 3, 7).narrow(1, 2, 6)
    np.testing.assert_allclose(np.asarray(blk.to_dense()), D[3:10, 2:8],
                               atol=1e-6)
