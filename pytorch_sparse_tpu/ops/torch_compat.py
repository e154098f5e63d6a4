"""Reference-API parity methods for :class:`SparseTensor`.

The reference exposes torch-flavored dtype/device/memory methods on its
tensor (``torch_sparse/tensor.py:442-528, 586-622``) and torch.sparse
interop constructors/exports (``tensor.py:103-148, 553-585``).  This
module attaches JAX-appropriate equivalents:

* dtype casts map to value-array casts (indices stay int32);
* ``cpu()`` / ``cuda()`` / ``to()`` map to ``jax.device_put`` (``cuda``
  targets the default accelerator — on this stack, the TPU);
* pinning / shared-memory are no-ops (XLA owns transfers; there is no
  user-visible pinned or shared host memory), kept for drop-in source
  compatibility;
* ``detach`` maps to ``jax.lax.stop_gradient`` on the value;
* torch.sparse interop round-trips through the CPU torch build.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor

# ----------------------------------------------------------------------
# dtype casts (reference tensor.py:442-504)
# ----------------------------------------------------------------------

_CASTS = {
    "float": jnp.float32,
    "double": jnp.float64,
    "half": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "int": jnp.int32,
    "long": jnp.int64,
    "short": jnp.int16,
    "byte": jnp.uint8,
    "char": jnp.int8,
    "bool": jnp.bool_,
}


def _make_cast(dtype):
    def cast(self: SparseTensor) -> SparseTensor:
        value = self.storage.value()
        if value is None or value.dtype == dtype:
            return self
        return self.from_storage(self.storage.astype_value(dtype))

    return cast


for _name, _dtype in _CASTS.items():
    setattr(SparseTensor, _name, _make_cast(_dtype))


def is_floating_point(self: SparseTensor) -> bool:
    value = self.storage.value()
    return value is not None and jnp.issubdtype(value.dtype, jnp.floating)


SparseTensor.is_floating_point = is_floating_point


def type(self: SparseTensor, dtype=None, non_blocking: bool = False):
    if dtype is None:
        return self.dtype()
    value = self.storage.value()
    if value is not None and value.dtype == dtype:
        return self
    return self.from_storage(self.storage.astype_value(dtype))


def type_as(self: SparseTensor, other) -> SparseTensor:
    dtype = getattr(other, "dtype", None)
    if callable(dtype):
        dtype = dtype()
    return type(self, dtype)


SparseTensor.type = type
SparseTensor.type_as = type_as


# ----------------------------------------------------------------------
# device moves (reference tensor.py:506-528, 586-622)
# ----------------------------------------------------------------------

def cpu(self: SparseTensor) -> SparseTensor:
    return self.to_device(jax.devices("cpu")[0])


def cuda(self: SparseTensor, device=None, non_blocking: bool = False):
    """Move to the default accelerator (TPU on this stack)."""
    return self.to_device(device if device is not None else jax.devices()[0])


def device_as(self: SparseTensor, other, non_blocking: bool = False):
    dev = getattr(other, "device", None)
    dev = dev() if callable(dev) else dev
    return self.to_device(dev)


def is_cuda(self: SparseTensor) -> bool:
    return self.device().platform != "cpu"


def to(self: SparseTensor, *args, **kwargs) -> SparseTensor:
    """dtype and/or device move, torch-style dispatch."""
    out = self
    for arg in list(args) + list(kwargs.values()):
        if isinstance(arg, jax.Device):
            out = out.to_device(arg)
        elif arg in (None, True, False):
            continue
        else:
            out = type(out, arg)
    return out


SparseTensor.cpu = cpu
SparseTensor.cuda = cuda
SparseTensor.device_as = device_as
SparseTensor.is_cuda = property(is_cuda)
SparseTensor.to = to


# ----------------------------------------------------------------------
# memory pinning / sharing (reference tensor.py:591-622): no-ops — XLA
# manages transfer staging and there is no shared-host-memory mode.
# ----------------------------------------------------------------------

def pin_memory(self: SparseTensor) -> SparseTensor:
    return self


def is_pinned(self: SparseTensor) -> bool:
    return False


def share_memory_(self: SparseTensor) -> SparseTensor:
    return self


def is_shared(self: SparseTensor) -> bool:
    return False


SparseTensor.pin_memory = pin_memory
SparseTensor.is_pinned = is_pinned
SparseTensor.share_memory_ = share_memory_
SparseTensor.is_shared = is_shared


# ----------------------------------------------------------------------
# autograd handles
# ----------------------------------------------------------------------

def detach(self: SparseTensor) -> SparseTensor:
    value = self.storage.value()
    if value is None:
        return self
    return self.set_value(jax.lax.stop_gradient(value), layout="coo")


def requires_grad_(self: SparseTensor, requires_grad: bool = True,
                   dtype=None) -> SparseTensor:
    if requires_grad:
        warnings.warn(
            "JAX tracks gradients functionally (jax.grad over value); "
            "requires_grad_ is a no-op kept for API compatibility."
        )
    return self


SparseTensor.detach = detach
SparseTensor.detach_ = detach
SparseTensor.requires_grad_ = requires_grad_


# ----------------------------------------------------------------------
# structure metrics
# ----------------------------------------------------------------------

def avg_bandwidth(self: SparseTensor) -> float:
    row, col, _ = self.coo()
    if row.shape[0] == 0:
        return 0.0
    return float(jnp.mean(jnp.abs(row - col).astype(jnp.float32)))


SparseTensor.avg_bandwidth = avg_bandwidth


# ----------------------------------------------------------------------
# torch.sparse interop (reference tensor.py:103-148, 553-585); uses the
# CPU torch build available alongside.
# ----------------------------------------------------------------------

def to_torch_sparse_coo_tensor(self: SparseTensor, dtype=None):
    import torch

    row, col, value = self.coo()
    index = torch.from_numpy(
        np.stack([np.asarray(row), np.asarray(col)]).astype(np.int64)
    )
    M, N = self.sparse_sizes()
    if value is None:
        value = jnp.ones(row.shape, dtype=dtype or jnp.float32)
    return torch.sparse_coo_tensor(
        index, torch.from_numpy(np.asarray(value)), (M, N)
    )


def to_torch_sparse_csr_tensor(self: SparseTensor, dtype=None):
    import torch

    rowptr, col, value = self.csr()
    M, N = self.sparse_sizes()
    if value is None:
        value = jnp.ones(col.shape, dtype=dtype or jnp.float32)
    return torch.sparse_csr_tensor(
        torch.from_numpy(np.asarray(rowptr).astype(np.int64)),
        torch.from_numpy(np.asarray(col).astype(np.int64)),
        torch.from_numpy(np.asarray(value)), (M, N),
    )


def to_torch_sparse_csc_tensor(self: SparseTensor, dtype=None):
    import torch

    colptr, row, value = self.csc()
    M, N = self.sparse_sizes()
    if value is None:
        value = jnp.ones(row.shape, dtype=dtype or jnp.float32)
    return torch.sparse_csc_tensor(
        torch.from_numpy(np.asarray(colptr).astype(np.int64)),
        torch.from_numpy(np.asarray(row).astype(np.int64)),
        torch.from_numpy(np.asarray(value)), (M, N),
    )


def from_torch_sparse_coo_tensor(mat, has_value: bool = True):
    mat = mat.coalesce()
    index = mat.indices().cpu().numpy()
    value = mat.values().cpu().numpy() if has_value else None
    return SparseTensor(
        row=jnp.asarray(index[0]), col=jnp.asarray(index[1]),
        value=None if value is None else jnp.asarray(value),
        sparse_sizes=(mat.size(0), mat.size(1)),
    )


def from_torch_sparse_csr_tensor(mat, has_value: bool = True):
    rowptr = mat.crow_indices().cpu().numpy()
    col = mat.col_indices().cpu().numpy()
    value = mat.values().cpu().numpy() if has_value else None
    return SparseTensor(
        rowptr=jnp.asarray(rowptr), col=jnp.asarray(col),
        value=None if value is None else jnp.asarray(value),
        sparse_sizes=(mat.size(0), mat.size(1)),
        is_sorted=True, trust_data=True,
    )


SparseTensor.to_torch_sparse_coo_tensor = to_torch_sparse_coo_tensor
SparseTensor.to_torch_sparse_csr_tensor = to_torch_sparse_csr_tensor
SparseTensor.to_torch_sparse_csc_tensor = to_torch_sparse_csc_tensor
SparseTensor.from_torch_sparse_coo_tensor = staticmethod(
    from_torch_sparse_coo_tensor
)
SparseTensor.from_torch_sparse_csr_tensor = staticmethod(
    from_torch_sparse_csr_tensor
)


# ----------------------------------------------------------------------
# Storage-level parity methods (reference storage.py:561-710)
# ----------------------------------------------------------------------
from ..storage import SparseStorage  # noqa: E402


def _st_cuda(self, device=None, non_blocking: bool = False):
    return self.to_device(
        device if device is not None else jax.devices()[0]
    )


def _st_type(self, dtype=None, non_blocking: bool = False):
    if dtype is None:
        value = self.value()
        return value.dtype if value is not None else None
    return self.astype_value(dtype)


def _st_type_as(self, other):
    value = other.value() if hasattr(other, "value") else None
    return self if value is None else self.astype_value(value.dtype)


def _st_device_as(self, other, non_blocking: bool = False):
    dev = getattr(other, "device", None)
    dev = dev() if callable(dev) else dev
    return self.to_device(dev)


SparseStorage.cuda = _st_cuda
SparseStorage.type = _st_type
SparseStorage.type_as = _st_type_as
SparseStorage.device_as = _st_device_as
SparseStorage.pin_memory = lambda self: self
SparseStorage.is_pinned = lambda self: False


def _st_share_memory_(self) -> "SparseStorage":
    """Storage-level sharing shim (reference ``storage.py:742-767``
    walks every cached array and moves it to POSIX shared memory for
    DataLoader worker processes).  XLA device buffers have no shared-
    host-memory mode and host-side numpy views are already zero-copy
    within a process, so this is a documented no-op returning ``self``
    — mirroring the SparseTensor-level shim above, now present at BOTH
    layers like the reference."""
    return self


SparseStorage.share_memory_ = _st_share_memory_
SparseStorage.is_shared = lambda self: False
