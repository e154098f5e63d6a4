"""Checkpoint/resume of sparse tensors incl. format caches (SURVEY.md §5:
reference delegates persistence to torch pickling; here .npz)."""

import jax.numpy as jnp
import numpy as np

import pytorch_sparse_tpu as ts


def test_npz_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    M, E = 40, 160
    A = ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E)),
        col=jnp.asarray(rng.randint(0, M, E)),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    A.fill_cache_()
    A.storage.ell()
    A.storage.ell_t()

    path = str(tmp_path / "adj.npz")
    ts.save_npz(path, A)
    B = ts.load_npz(path)

    assert B.sparse_sizes() == A.sparse_sizes()
    assert B.nnz() == A.nnz()
    assert sorted(B.storage.cached_keys()) == sorted(A.storage.cached_keys())
    assert B.storage.has_ell() and B.storage.has_ell_t()
    np.testing.assert_array_equal(
        np.asarray(A.to_dense()), np.asarray(B.to_dense())
    )
    # restored ELL view actually drives SpMM
    mat = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(ts.spmm_sum(B, mat)),
        np.asarray(A.to_dense()) @ np.asarray(mat),
        atol=1e-4,
    )


def test_npz_roundtrip_bfloat16(tmp_path):
    """ml_dtypes values (numpy kind 'V') survive the npz round-trip;
    np.savez alone would store them as raw '|V2' void bytes."""
    rng = np.random.RandomState(2)
    M, E = 20, 60
    A = ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E)),
        col=jnp.asarray(rng.randint(0, M, E)),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    A = A.set_value(A.storage.value().astype(jnp.bfloat16), layout="coo")
    path = str(tmp_path / "bf16.npz")
    ts.save_npz(path, A)
    B = ts.load_npz(path)
    assert B.storage.value().dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(A.storage.value().astype(jnp.float32)),
        np.asarray(B.storage.value().astype(jnp.float32)),
    )


def test_npz_roundtrip_hybrid(tmp_path):
    """The hybrid block view (the expensive build at eval scale) rides
    the checkpoint: restored blocks + remainder tables drive spmm_sum
    bit-identically to the original."""
    from pytorch_sparse_tpu.ops.kernels.hybrid import build_hybrid_from_tensor

    rng = np.random.RandomState(3)
    M = 96
    # one dense community block + random remainder
    r1 = rng.randint(0, 32, 600)
    c1 = rng.randint(0, 32, 600)
    r2 = rng.randint(0, M, 200)
    c2 = rng.randint(0, M, 200)
    A = ts.SparseTensor(
        row=jnp.asarray(np.concatenate([r1, r2])),
        col=jnp.asarray(np.concatenate([c1, c2])),
        value=jnp.asarray(rng.randn(800).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    h = build_hybrid_from_tensor(A, B=32, min_density=0.05)
    assert h.nb > 0 and h.ell is not None
    A.storage.set_hybrid_(h)

    path = str(tmp_path / "hyb.npz")
    ts.save_npz(path, A)
    B = ts.load_npz(path)
    assert B.storage.has_hybrid()
    h2 = B.storage.hybrid(auto=False)
    assert (h2.M, h2.N, h2.B, h2.nb, h2.dense_nnz) == (
        h.M, h.N, h.B, h.nb, h.dense_nnz
    )
    mat = jnp.asarray(rng.randn(M, 16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(ts.spmm_sum(A, mat)), np.asarray(ts.spmm_sum(B, mat))
    )


def test_npz_roundtrip_dense_format_bf16(tmp_path):
    """DenseFormat (incl. a bf16 store, numpy kind 'V') survives the
    round-trip."""
    from pytorch_sparse_tpu.ops.kernels.hybrid import DenseFormat, dense_spmm

    rng = np.random.RandomState(4)
    M = 48
    A = ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, 900)),
        col=jnp.asarray(rng.randint(0, M, 900)),
        value=jnp.asarray(rng.randn(900).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    d = DenseFormat(A.to_dense().astype(jnp.bfloat16), M, M)
    A.storage.set_hybrid_(d)
    path = str(tmp_path / "dense.npz")
    ts.save_npz(path, A)
    B = ts.load_npz(path)
    d2 = B.storage.hybrid(auto=False)
    assert isinstance(d2, DenseFormat) and d2.dense.dtype == jnp.bfloat16
    mat = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(dense_spmm(d, mat)), np.asarray(dense_spmm(d2, mat))
    )


def test_npz_roundtrip_no_value_no_cache(tmp_path):
    rng = np.random.RandomState(1)
    A = ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, 10, 30)),
        col=jnp.asarray(rng.randint(0, 10, 30)),
        sparse_sizes=(10, 10),
    ).coalesce("add")
    path = str(tmp_path / "a.npz")
    ts.save_npz(path, A)
    B = ts.load_npz(path)
    assert not B.has_value()
    np.testing.assert_array_equal(
        np.asarray(A.to_dense()), np.asarray(B.to_dense())
    )
