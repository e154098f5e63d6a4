"""Legacy tuple conversions (reference ``torch_sparse/convert.py``), with the
torch.sparse endpoints mapped to JAX's BCOO."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.convert import INDEX_DTYPE


def to_jax_sparse(index, value, m, n):
    from jax.experimental import sparse as jsparse

    indices = jnp.stack([index[0], index[1]], axis=1)
    return jsparse.BCOO((value, indices), shape=(m, n))


def from_jax_sparse(A):
    index = jnp.stack([A.indices[:, 0], A.indices[:, 1]], axis=0)
    return index.astype(INDEX_DTYPE), A.data


# Aliases matching the reference names for drop-in parity.
to_torch_sparse = to_jax_sparse
from_torch_sparse = from_jax_sparse


def to_scipy(index, value, m, n):
    import scipy.sparse

    row, col = np.asarray(index[0]), np.asarray(index[1])
    return scipy.sparse.coo_matrix((np.asarray(value), (row, col)), (m, n))


def from_scipy(A):
    A = A.tocoo()
    row = jnp.asarray(A.row.astype(np.int32))
    col = jnp.asarray(A.col.astype(np.int32))
    value = jnp.asarray(A.data)
    index = jnp.stack([row, col], axis=0)
    return index, value
