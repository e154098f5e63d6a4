"""User-facing ``SparseTensor`` facade over :class:`SparseStorage`.

TPU-native counterpart of the reference ``torch_sparse/tensor.py:12-775``.
A ``SparseTensor`` is a registered pytree, so it can be passed through
``jax.jit`` / ``jax.grad`` / ``pjit`` directly — the JAX analogue of the
reference's ``torch.jit.script``-compatibility design constraint
(``tensor.py:12-13``).

Free-function ops (matmul, add, mul, reduce, cat, ...) live in
``pytorch_sparse_tpu.ops`` and attach methods onto this class at import
time, mirroring the reference's monkey-patching op modules
(``matmul.py:166-171``, ``add.py:100-108``, ``mul.py:128-136``).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .storage import SparseStorage
from .utils.convert import INDEX_DTYPE


class SparseTensor:
    storage: SparseStorage

    def __init__(
        self,
        row: Optional[jnp.ndarray] = None,
        rowptr: Optional[jnp.ndarray] = None,
        col: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        sparse_sizes: Optional[Tuple[Optional[int], Optional[int]]] = None,
        is_sorted: bool = False,
        trust_data: bool = False,
    ):
        self.storage = SparseStorage(
            row=row, rowptr=rowptr, col=col, value=value,
            sparse_sizes=sparse_sizes, is_sorted=is_sorted,
            trust_data=trust_data,
        )

    @classmethod
    def from_storage(cls, storage: SparseStorage) -> "SparseTensor":
        out = object.__new__(cls)
        out.storage = storage
        return out

    # ------------------------------------------------------------------
    # Constructors (reference tensor.py:59-204, 709-739)
    # ------------------------------------------------------------------
    @classmethod
    def from_edge_index(
        cls,
        edge_index: jnp.ndarray,
        edge_attr: Optional[jnp.ndarray] = None,
        sparse_sizes: Optional[Tuple[Optional[int], Optional[int]]] = None,
        is_sorted: bool = False,
        trust_data: bool = False,
    ) -> "SparseTensor":
        return cls(
            row=edge_index[0], rowptr=None, col=edge_index[1],
            value=edge_attr, sparse_sizes=sparse_sizes, is_sorted=is_sorted,
            trust_data=trust_data,
        )

    @classmethod
    def from_dense(
        cls, mat: jnp.ndarray, has_value: bool = True
    ) -> "SparseTensor":
        """Reference ``tensor.py:78-101``: nonzeros of a dense (2D+) array."""
        mat = jnp.asarray(mat)
        if mat.ndim > 2:
            nonzero = jnp.abs(mat).sum(axis=tuple(range(2, mat.ndim))) != 0
        else:
            nonzero = mat != 0
        row, col = jnp.nonzero(nonzero)
        value: Optional[jnp.ndarray] = None
        if has_value:
            value = mat[row, col]
        return cls(
            row=row.astype(INDEX_DTYPE), rowptr=None,
            col=col.astype(INDEX_DTYPE), value=value,
            sparse_sizes=(int(mat.shape[0]), int(mat.shape[1])),
            is_sorted=True, trust_data=True,
        )

    @classmethod
    def from_scipy(cls, mat) -> "SparseTensor":
        """Reference ``tensor.py:709-739``."""
        import scipy.sparse

        colptr = None
        if isinstance(mat, scipy.sparse.csc_matrix):
            colptr = jnp.asarray(mat.indptr, dtype=INDEX_DTYPE)
        mat = mat.tocsr()
        rowptr = jnp.asarray(mat.indptr, dtype=INDEX_DTYPE)
        mat = mat.tocoo()
        row = jnp.asarray(mat.row, dtype=INDEX_DTYPE)
        col = jnp.asarray(mat.col, dtype=INDEX_DTYPE)
        value = jnp.asarray(mat.data)
        sparse_sizes = (int(mat.shape[0]), int(mat.shape[1]))

        storage = SparseStorage(
            row=row, rowptr=rowptr, col=col, value=value,
            sparse_sizes=sparse_sizes, colptr=colptr,
            is_sorted=True, trust_data=True,
        )
        return cls.from_storage(storage)

    @classmethod
    def eye(
        cls,
        M: int,
        N: Optional[int] = None,
        has_value: bool = True,
        dtype: Optional[Any] = None,
        fill_cache: bool = False,
    ) -> "SparseTensor":
        """Identity matrix with optionally pre-filled caches
        (reference ``tensor.py:150-204`` / ``eye.py:4-22``)."""
        N = M if N is None else N
        k = min(M, N)
        row = jnp.arange(k, dtype=INDEX_DTYPE)
        col = row
        rowptr = jnp.concatenate(
            [jnp.arange(k + 1, dtype=INDEX_DTYPE),
             jnp.full((max(M - k, 0),), k, dtype=INDEX_DTYPE)]
        )
        value = None
        if has_value:
            value = jnp.ones((k,), dtype=dtype or jnp.float32)

        rowcount = colptr = colcount = csr2csc = csc2csr = None
        if fill_cache:
            rowcount = jnp.concatenate(
                [jnp.ones((k,), INDEX_DTYPE),
                 jnp.zeros((max(M - k, 0),), INDEX_DTYPE)]
            )
            colptr = jnp.concatenate(
                [jnp.arange(k + 1, dtype=INDEX_DTYPE),
                 jnp.full((max(N - k, 0),), k, dtype=INDEX_DTYPE)]
            )
            colcount = jnp.concatenate(
                [jnp.ones((k,), INDEX_DTYPE),
                 jnp.zeros((max(N - k, 0),), INDEX_DTYPE)]
            )
            csr2csc = csc2csr = row

        storage = SparseStorage(
            row=row, rowptr=rowptr, col=col, value=value,
            sparse_sizes=(M, N), rowcount=rowcount, colptr=colptr,
            colcount=colcount, csr2csc=csr2csc, csc2csr=csc2csr,
            is_sorted=True, trust_data=True,
        )
        return cls.from_storage(storage)

    # ------------------------------------------------------------------
    # Basic accessors
    # ------------------------------------------------------------------
    def coo(self) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        return self.storage.row(), self.storage.col(), self.storage.value()

    def csr(self) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        return self.storage.rowptr(), self.storage.col(), self.storage.value()

    def csc(self) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        perm = self.storage.csr2csc()
        value = self.storage.value()
        if value is not None:
            value = value[perm]
        return self.storage.colptr(), self.storage.row()[perm], value

    def has_value(self) -> bool:
        return self.storage.has_value()

    def set_value(
        self, value: Optional[jnp.ndarray], layout: Optional[str] = None
    ) -> "SparseTensor":
        return self.from_storage(self.storage.set_value(value, layout))

    set_value_ = set_value

    def fill_value(self, fill_value: float, dtype=None) -> "SparseTensor":
        value = jnp.full(
            (self.nnz(),), fill_value, dtype=dtype or jnp.float32
        )
        return self.set_value(value, layout="coo")

    fill_value_ = fill_value

    def sparse_sizes(self) -> Tuple[int, int]:
        return self.storage.sparse_sizes()

    def sparse_size(self, dim: int) -> int:
        return self.storage.sparse_size(dim)

    def sparse_resize(self, sparse_sizes: Tuple[int, int]) -> "SparseTensor":
        return self.from_storage(self.storage.sparse_resize(sparse_sizes))

    def sparse_reshape(self, num_rows: int, num_cols: int) -> "SparseTensor":
        return self.from_storage(
            self.storage.sparse_reshape(num_rows, num_cols)
        )

    def nnz(self) -> int:
        return self.storage.nnz()

    def numel(self) -> int:
        return self.nnz() if not self.has_value() else int(
            np.prod(self.storage.value().shape)
        )

    def coalesce(self, reduce: str = "add") -> "SparseTensor":
        return self.from_storage(self.storage.coalesce(reduce))

    def is_coalesced(self) -> bool:
        return self.storage.is_coalesced()

    def fill_cache_(self) -> "SparseTensor":
        self.storage.fill_cache_()
        return self

    def clear_cache_(self) -> "SparseTensor":
        self.storage.clear_cache_()
        return self

    def copy(self) -> "SparseTensor":
        return self.from_storage(self.storage.copy())

    clone = copy
    detach = copy

    def requires_grad(self) -> bool:
        return False  # autograd flows through jax.grad, not flags.

    # ------------------------------------------------------------------
    # Structure predicates (reference tensor.py:293-313, 359-402)
    # ------------------------------------------------------------------
    def is_symmetric(self) -> bool:
        if self.sparse_size(0) != self.sparse_size(1):
            return False
        rowptr, col, val1 = self.csr()
        colptr, row, val2 = self.csc()
        index_sym = bool(jnp.array_equal(rowptr, colptr)) and bool(
            jnp.array_equal(col, row)
        )
        if not index_sym:
            return False
        if val1 is not None:
            return bool(jnp.all(val1 == val2))
        return True

    def to_symmetric(self, reduce: str = "sum") -> "SparseTensor":
        """Reference ``tensor.py:404-438``: symmetrize A <- reduce(A, A^T)."""
        N = max(self.sparse_size(0), self.sparse_size(1))
        row, col, value = self.coo()
        new_row = jnp.concatenate([row, col])
        new_col = jnp.concatenate([col, row])
        if value is not None:
            value = jnp.concatenate([value, value])
        out = SparseTensor(
            row=new_row, col=new_col, value=value, sparse_sizes=(N, N)
        )
        return out.coalesce(reduce)

    def density(self) -> float:
        M, N = self.sparse_sizes()
        if M == 0 or N == 0:
            return 0.0
        return self.nnz() / (M * N)

    def sparsity(self) -> float:
        return 1.0 - self.density()

    def avg_row_length(self) -> float:
        M = self.sparse_size(0)
        return self.nnz() / M if M > 0 else 0.0

    def avg_col_length(self) -> float:
        N = self.sparse_size(1)
        return self.nnz() / N if N > 0 else 0.0

    def bandwidth(self) -> int:
        row, col, _ = self.coo()
        if row.shape[0] == 0:
            return 0
        return int(jnp.abs(row - col).max())

    def bandwidth_proportion(self, bandwidth: int) -> float:
        row, col, _ = self.coo()
        if row.shape[0] == 0:
            return 0.0
        return float(jnp.mean(jnp.abs(row - col) <= bandwidth))

    def is_quadratic(self) -> bool:
        return self.sparse_size(0) == self.sparse_size(1)

    # ------------------------------------------------------------------
    # Conversions out (reference tensor.py:530-585, 742-771)
    # ------------------------------------------------------------------
    def to_dense(self, dtype=None) -> jnp.ndarray:
        row, col, value = self.coo()
        M, N = self.sparse_sizes()
        if value is None:
            value = jnp.ones(row.shape, dtype=dtype or jnp.float32)
        shape = (M, N) + tuple(value.shape[1:])
        out = jnp.zeros(shape, dtype=value.dtype)
        return out.at[row, col].add(value)

    def to_scipy(self, dtype=None, layout: Optional[str] = None):
        import scipy.sparse

        from .storage import get_layout

        layout = get_layout(layout) if layout is not None else "csr"
        M, N = self.sparse_sizes()
        if layout == "coo":
            row, col, value = self.coo()
            value = (
                np.ones(row.shape, dtype=dtype or np.float32)
                if value is None else np.asarray(value)
            )
            return scipy.sparse.coo_matrix(
                (value, (np.asarray(row), np.asarray(col))), (M, N)
            )
        elif layout == "csr":
            rowptr, col, value = self.csr()
            value = (
                np.ones(col.shape, dtype=dtype or np.float32)
                if value is None else np.asarray(value)
            )
            return scipy.sparse.csr_matrix(
                (value, np.asarray(col), np.asarray(rowptr)), (M, N)
            )
        elif layout == "csc":
            colptr, row, value = self.csc()
            value = (
                np.ones(row.shape, dtype=dtype or np.float32)
                if value is None else np.asarray(value)
            )
            return scipy.sparse.csc_matrix(
                (value, np.asarray(row), np.asarray(colptr)), (M, N)
            )

    def to_jax_sparse_bcoo(self):
        """JAX-native analogue of ``to_torch_sparse_coo_tensor``
        (reference ``tensor.py:553-563``)."""
        from jax.experimental import sparse as jsparse

        row, col, value = self.coo()
        if value is None:
            value = jnp.ones(row.shape, dtype=jnp.float32)
        indices = jnp.stack([row, col], axis=1)
        return jsparse.BCOO(
            (value, indices), shape=self.sparse_sizes() + value.shape[1:]
        )

    @classmethod
    def from_jax_sparse_bcoo(cls, mat) -> "SparseTensor":
        indices = mat.indices
        return cls(
            row=indices[:, 0], col=indices[:, 1], value=mat.data,
            sparse_sizes=(int(mat.shape[0]), int(mat.shape[1])),
            is_sorted=False,
        )

    # ------------------------------------------------------------------
    # Sizes / dtype / device plumbing
    # ------------------------------------------------------------------
    def size(self, dim: Optional[int] = None):
        value = self.storage.value()
        size: Tuple[int, ...] = self.sparse_sizes()
        if value is not None and value.ndim > 1:
            size = size + tuple(value.shape[1:])
        if dim is None:
            return size
        return size[dim]

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.size()

    def sizes(self) -> List[int]:
        return list(self.size())

    def dim(self) -> int:
        return len(self.size())

    def device(self):
        devs = self.storage.col().devices()
        return next(iter(devs))

    def dtype(self):
        value = self.storage.value()
        return value.dtype if value is not None else None

    def astype(self, dtype) -> "SparseTensor":
        return self.from_storage(self.storage.astype_value(dtype))

    def to_device(self, device) -> "SparseTensor":
        return self.from_storage(self.storage.to_device(device))

    # ------------------------------------------------------------------
    # Python protocol
    # ------------------------------------------------------------------
    def __eq__(self, other) -> bool:  # reference tensor.py:293-313
        if not isinstance(other, SparseTensor):
            return False
        if self.sparse_sizes() != other.sparse_sizes():
            return False
        rowptrA, colA, valueA = self.csr()
        rowptrB, colB, valueB = other.csr()
        if colA.shape != colB.shape:
            return False
        if not bool(jnp.array_equal(rowptrA, rowptrB)):
            return False
        if not bool(jnp.array_equal(colA, colB)):
            return False
        if valueA is None and valueB is None:
            return True
        if valueA is None or valueB is None:
            return False
        return valueA.shape == valueB.shape and bool(
            jnp.array_equal(valueA, valueB)
        )

    __hash__ = object.__hash__

    def __getitem__(self, index: Any) -> "SparseTensor":
        """numpy-style indexing (reference ``tensor.py:624-671``):
        int -> select; slice -> narrow; int array -> index_select;
        bool array -> masked_select; Ellipsis passes through."""
        index = index if isinstance(index, tuple) else (index,)
        # Expand Ellipsis (identity check: `in` would compare arrays).
        if any(item is Ellipsis for item in index):
            pos = next(
                i for i, item in enumerate(index) if item is Ellipsis
            )
            fill = (slice(None),) * (2 - (len(index) - 1))
            index = index[:pos] + fill + index[pos + 1:]
        out = self
        dim = 0
        for item in index:
            if isinstance(item, slice):
                if item == slice(None):
                    dim += 1
                    continue
                start = item.start or 0
                if start < 0:
                    start = self.sparse_size(dim) + start
                stop = (
                    self.sparse_size(dim) if item.stop is None else item.stop
                )
                if stop < 0:
                    stop = self.sparse_size(dim) + stop
                assert item.step is None or item.step == 1
                out = out.narrow(dim, start, max(stop - start, 0))
                dim += 1
            elif isinstance(item, int):
                out = out.select(dim, item)
                dim += 1
            elif isinstance(item, (jnp.ndarray, np.ndarray, list)):
                item = jnp.asarray(item)
                if item.dtype == jnp.bool_:
                    out = out.masked_select(dim, item)
                else:
                    out = out.index_select(dim, item)
                dim += 1
            else:
                raise IndexError(
                    f"Unsupported index type {type(item)} at dim {dim}"
                )
        return out

    def __repr__(self) -> str:
        row, col, value = self.coo()
        M, N = self.sparse_sizes()
        info = [f"size=({M}, {N})", f"nnz={self.nnz()}"]
        if value is not None:
            info.append(f"dtype={value.dtype}")
        info.append(f"density={100 * self.density():.2f}%")
        return f"{self.__class__.__name__}({', '.join(info)})"


def _tensor_flatten(t: SparseTensor):
    return (t.storage,), None


def _tensor_unflatten(aux, children) -> SparseTensor:
    del aux
    obj = object.__new__(SparseTensor)
    obj.storage = children[0]
    return obj


jax.tree_util.register_pytree_node(
    SparseTensor, _tensor_flatten, _tensor_unflatten
)
