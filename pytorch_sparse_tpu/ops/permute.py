"""Symmetric permutation (reference ``torch_sparse/permute.py:5-8``)."""

from __future__ import annotations

from ..tensor import SparseTensor
from .index_select import index_select


def permute(src: SparseTensor, perm) -> SparseTensor:
    assert src.is_quadratic()
    return index_select(index_select(src, 0, perm), 1, perm)


SparseTensor.permute = lambda self, perm: permute(self, perm)
