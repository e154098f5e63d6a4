"""Test parametrization matrix (reference ``torch_sparse/testing.py:6-19``)
plus the shared synthetic-graph generators used by tests and benchmarks."""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

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


def community_graph(
    M: int,
    E: int,
    n_comm: int,
    intra_p: float = 0.9,
    rng: Optional[np.random.RandomState] = None,
    seed: int = 0,
    equal_sizes: bool = False,
    values: bool = True,
):
    """Synthetic community graph in community-sorted (METIS-like) layout.

    ``intra_p`` of the edges stay inside the source node's community.
    ``equal_sizes`` uses ``n_comm`` contiguous equal blocks; otherwise
    community sizes are multinomial (random assignment, nodes laid out
    community-contiguously via an argsort permutation).  The single
    source of truth for the generator shared by ``bench.py``,
    ``tests/test_hybrid.py`` and ``benchmarks/weak_scaling.py`` — keep
    them measuring the same graph family.

    Returns a coalesced :class:`SparseTensor`; duplicate draws merge by
    ``add`` and, when ``values``, fresh N(0,1) values are attached after
    coalescing (one value per surviving nnz).
    """
    from .tensor import SparseTensor

    if rng is None:
        rng = np.random.RandomState(seed)
    if equal_sizes:
        cp = np.linspace(0, M, n_comm + 1).astype(np.int64)
        comm_of = np.repeat(np.arange(n_comm), np.diff(cp))
        order = np.arange(M, dtype=np.int64)
    else:
        comm_of = rng.randint(0, n_comm, M)
        order = np.argsort(comm_of)
        cp = np.searchsorted(comm_of[order], np.arange(n_comm + 1))
    src = rng.randint(0, M, E)
    intra = rng.rand(E) < intra_p
    c = comm_of[src[intra]]
    dst = rng.randint(0, M, E)
    lo, hi = cp[c], cp[c + 1]
    dst[intra] = order[
        lo + (rng.rand(int(intra.sum())) * (hi - lo)).astype(np.int64)
    ]
    A = SparseTensor(row=src, col=dst, sparse_sizes=(M, M)).coalesce("add")
    if values:
        A = A.set_value(
            jnp.asarray(rng.randn(A.nnz()).astype(np.float32)),
            layout="coo",
        )
    return A


def strict_tolerance(dtype) -> float:
    """Reference tolerances verbatim (``test/test_matmul.py:45-51``):
    1e-7 for fp32/fp64, 1e-1 for half/bfloat16.  Valid only against an
    oracle that reproduces the kernels' summation order (CSR edge order
    per row; CSC order for the transposed gradient pass)."""
    if dtype in (jnp.float16, jnp.bfloat16):
        return 1e-1
    return 1e-7
