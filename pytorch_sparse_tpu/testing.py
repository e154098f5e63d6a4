"""Test parametrization matrix (reference ``torch_sparse/testing.py:6-19``)."""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

reductions = ["sum", "add", "mean", "min", "max"]

dtypes: List[Any] = [jnp.float16, jnp.float32, jnp.int32, jnp.bfloat16]
grad_dtypes: List[Any] = [jnp.float16, jnp.float32, jnp.bfloat16]

# Reference sweep also covers double/long (``testing.py:6-19``); those
# need 64-bit mode — exercise them inside a ``jax.enable_x64()`` scope.
dtypes_x64: List[Any] = [jnp.float64, jnp.int64]
grad_dtypes_x64: List[Any] = [jnp.float64]

devices = [jax.devices()[0]]


def tensor(x: Any, dtype) -> Any:
    """List -> array helper (reference ``testing.py:21-22``)."""
    return None if x is None else jnp.asarray(x, dtype=dtype)


def tolerance(dtype) -> float:
    """Per-dtype bounds for oracles that REASSOCIATE sums (dense einsum
    etc.): 1e-1 for half dtypes, 1e-5 absorbing fp32 rounding order."""
    if dtype in (jnp.float16, jnp.bfloat16):
        return 1e-1
    if dtype == jnp.float64:
        return 1e-7
    # The dense oracle reassociates sums differently than the segment
    # reduction; 1e-5 absorbs fp32 rounding differences (the reference's
    # 1e-7 works there because its oracle is the same scatter order).
    return 1e-5


def strict_tolerance(dtype) -> float:
    """Reference tolerances verbatim (``test/test_matmul.py:45-51``):
    1e-7 for fp32/fp64, 1e-1 for half/bfloat16.  Valid only against an
    oracle that reproduces the kernels' summation order (CSR edge order
    per row; CSC order for the transposed gradient pass)."""
    if dtype in (jnp.float16, jnp.bfloat16):
        return 1e-1
    return 1e-7
