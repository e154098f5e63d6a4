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
