"""Reference-API parity methods: dtype casts, device moves, torch interop
(reference tensor.py:442-528, 103-148, 553-622)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_sparse_tpu as ts


def _adj(M=20, E=60, seed=0):
    rng = np.random.RandomState(seed)
    return ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E)),
        col=jnp.asarray(rng.randint(0, M, E)),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")


def test_dtype_casts():
    A = _adj()
    assert A.double().dtype() in (jnp.float64, jnp.float32)  # x64 flag off
    assert A.bfloat16().dtype() == jnp.bfloat16
    assert A.half().dtype() == jnp.float16
    assert A.int().dtype() == jnp.int32
    assert A.float().dtype() == jnp.float32
    assert A.is_floating_point()
    assert not A.int().is_floating_point()
    B = A.type_as(A.bfloat16())
    assert B.dtype() == jnp.bfloat16


def test_device_and_memory_api():
    A = _adj()
    B = A.cpu()
    assert B.device().platform == "cpu"
    assert not B.is_cuda
    assert A.pin_memory() is A and not A.is_pinned()
    assert A.share_memory_() is A and not A.is_shared()
    C = A.to(jnp.bfloat16)
    assert C.dtype() == jnp.bfloat16


def test_detach_and_requires_grad():
    A = _adj()
    assert np.allclose(
        np.asarray(A.detach().storage.value()),
        np.asarray(A.storage.value()),
    )
    with pytest.warns(UserWarning):
        A.requires_grad_(True)


def test_avg_bandwidth():
    A = _adj()
    row, col, _ = A.coo()
    expected = float(np.abs(np.asarray(row) - np.asarray(col)).mean())
    assert abs(A.avg_bandwidth() - expected) < 1e-5


def test_torch_sparse_roundtrip():
    torch = pytest.importorskip("torch")
    A = _adj()
    coo = A.to_torch_sparse_coo_tensor()
    B = ts.SparseTensor.from_torch_sparse_coo_tensor(coo)
    assert np.allclose(np.asarray(A.to_dense()), np.asarray(B.to_dense()))

    csr = A.to_torch_sparse_csr_tensor()
    C = ts.SparseTensor.from_torch_sparse_csr_tensor(csr)
    assert np.allclose(np.asarray(A.to_dense()), np.asarray(C.to_dense()))

    csc = A.to_torch_sparse_csc_tensor()
    dense = torch.asarray(np.asarray(A.to_dense()))
    assert torch.allclose(csc.to_dense(), dense)
