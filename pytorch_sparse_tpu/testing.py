"""Test parametrization matrix (reference ``torch_sparse/testing.py:6-19``)."""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

reductions = ["sum", "add", "mean", "min", "max"]

dtypes: List[Any] = [jnp.float32, jnp.int32, jnp.bfloat16]
grad_dtypes: List[Any] = [jnp.float32, jnp.bfloat16]

devices = [jax.devices()[0]]


def tensor(x: Any, dtype) -> Any:
    """List -> array helper (reference ``testing.py:21-22``)."""
    return None if x is None else jnp.asarray(x, dtype=dtype)


def tolerance(dtype) -> float:
    """Reference tolerances (``test/test_matmul.py:45-51``): 1e-7 for fp32,
    1e-1 for half/bfloat16."""
    if dtype in (jnp.float16, jnp.bfloat16):
        return 1e-1
    # The dense oracle reassociates sums differently than the segment
    # reduction; 1e-5 absorbs fp32 rounding differences (the reference's
    # 1e-7 works there because its oracle is the same scatter order).
    return 1e-5
