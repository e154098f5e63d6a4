"""Reverse Cuthill-McKee bandwidth reduction
(reference ``torch_sparse/bandwidth.py:9-26``, via scipy).

RCM reordering is a locality optimization that matters even more on TPU than
CPU: a smaller bandwidth means the SpMM gather of ``mat[col]`` touches a
narrower window of HBM per row tile (see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor
from .permute import permute


def reverse_cuthill_mckee(
    src: SparseTensor, is_symmetric: Optional[bool] = None
) -> Tuple[SparseTensor, jnp.ndarray]:
    import scipy.sparse as sp

    if is_symmetric is None:
        is_symmetric = src.is_symmetric()
    if not is_symmetric:
        src = src.to_symmetric()

    sp_src = src.to_scipy(layout="csr")
    perm = sp.csgraph.reverse_cuthill_mckee(sp_src, symmetric_mode=True)
    perm = jnp.asarray(perm.astype(np.int32))
    out = permute(src, perm)
    return out, perm


SparseTensor.reverse_cuthill_mckee = reverse_cuthill_mckee
