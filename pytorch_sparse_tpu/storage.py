"""Core sparse storage: COO/CSR/CSC with explicit, observable format caching.

TPU-native re-design of the reference's ``SparseStorage``
(``torch_sparse/storage.py:21-767``).  Same information model — mandatory
``col``, one of ``row``/``rowptr``, optional ``value``, and five derived
cache arrays (``rowcount``, ``colptr``, ``colcount``, ``csr2csc``,
``csc2csr``) — but arranged for JAX:

* The object is a **pytree**: array fields are leaves, ``sparse_sizes`` is
  static aux data, so a ``SparseStorage`` flows through ``jax.jit`` /
  ``jax.grad`` / ``shard_map`` directly.  Cache state is part of the pytree
  structure (a filled cache is a leaf, an unfilled one is ``None``), which
  makes the reference's observable cache discipline (``fill_cache_`` /
  ``clear_cache_`` tests, ``test/test_storage.py:46-92``) a *structural*
  property here.
* Lazy memoization is kept (``row()``/``rowptr()``/``colptr()``/... compute
  on first call and cache on the instance, mirroring
  ``storage.py:186-429``), and is trace-safe: instances are re-created per
  trace by pytree unflattening, so cached tracers never leak across traces.
* nnz and sparse_sizes are static Python ints — every derived array has a
  static shape, so all format conversions are jit-compilable.  Operations
  whose *output* nnz is data-dependent (``coalesce`` with duplicates) run
  eagerly (outside ``jit``), exactly like the reference runs them at graph
  construction time.

Index dtype is int32 (TPU-native); int64 inputs are downcast.
"""

from __future__ import annotations

import warnings
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .csrc import bindings as _bindings
from .segment import segment_reduce, segment_count
from .utils.convert import INDEX_DTYPE, ind2ptr, ptr2ind
from .utils.host_sort import _NATIVE_MIN as _NATIVE_COALESCE_MIN
from .utils.host_sort import lexsort2, lexsort2_decode
from .utils.index_sort import lexsort_rows

layouts = ["coo", "csr", "csc"]


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def _tracing() -> bool:
    """True while a jit/vmap trace is active.  Cache BUILDS are
    eager-only: when a tensor with cold caches is closed over by a
    jitted function, its arrays are concrete (`_is_concrete` passes)
    but any new device array built during the trace is entangled with
    it — caching such an array on the shared storage object leaks it
    into the next trace (jax 0.9 ``UnexpectedTracerError``).  Under
    tracing the accessors return the already-filled cache or ``None``
    (callers fall back to trace-safe paths); prefill eagerly for the
    fast paths (``storage.ell()``, first eager ``spmm``, CLAUDE.md)."""
    try:
        from jax._src.core import trace_state_clean

        return not trace_state_clean()
    except Exception:
        try:
            from jax._src.core import EvalTrace, trace_ctx

            return not isinstance(trace_ctx.trace, EvalTrace)
        except Exception:
            return False


def _as_index(x) -> jnp.ndarray:
    # Host inputs cast in numpy first: a device-side astype is an eager
    # XLA op that recompiles for every new shape, which wrecks host-side
    # sampling pipelines whose frontier sizes vary per batch.
    if isinstance(x, (np.ndarray, list, tuple)):
        return jnp.asarray(np.asarray(x, dtype=INDEX_DTYPE))
    x = jnp.asarray(x)
    if x.dtype != INDEX_DTYPE:
        x = x.astype(INDEX_DTYPE)
    return x


def _host_int64(x) -> Tuple[Optional[np.ndarray], bool]:
    """``(host int64 view-or-copy, owned)`` when ``x`` is host-resident,
    else ``(None, False)``.

    Device arrays return None on purpose: the remote-TPU tunnel pulls
    device->host at ~35 MB/s (vs ~1 GB/s host->device), so host-side
    fast paths only activate for data that never left the host.
    ``owned=False`` means the array aliases caller memory: it may be
    READ freely during construction (probe/sort/validation) but must be
    defensively copied before being retained in the host-view cache
    (full-array copies cost seconds at 100M+ edges on this host, so the
    copy is deferred until a cache seed actually retains the array —
    the sort path replaces it with a fresh array anyway).
    """
    if isinstance(x, np.ndarray):
        arr = np.ascontiguousarray(x, dtype=np.int64)
        return arr, arr is not x and arr.base is not x
    if isinstance(x, (list, tuple)):
        return np.asarray(x, dtype=np.int64), True
    return None, False


def get_layout(layout: Optional[str] = None) -> str:
    """Reference ``torch_sparse/storage.py:12-18``: default layout is COO
    with a warning when unspecified."""
    if layout is None:
        layout = "coo"
        warnings.warn(
            "`layout` argument unset, using default layout `coo`. "
            "This may lead to unexpected behavior."
        )
    assert layout in layouts
    return layout


class SparseStorage:
    """Single source of truth for a sparse matrix layout.

    Mirrors the field set of the reference storage (``storage.py:23-32``).
    """

    _row: Optional[jnp.ndarray]
    _rowptr: Optional[jnp.ndarray]
    _col: jnp.ndarray
    _value: Optional[jnp.ndarray]
    _sparse_sizes: Tuple[int, int]
    _rowcount: Optional[jnp.ndarray]
    _colptr: Optional[jnp.ndarray]
    _colcount: Optional[jnp.ndarray]
    _csr2csc: Optional[jnp.ndarray]
    _csc2csr: Optional[jnp.ndarray]
    # Degree-bucketed ELLPACK views (TPU SpMM fast path; ops/kernels/ell.py).
    _ell: Optional[Any]
    _ell_t: Optional[Any]
    # Hybrid block-dense + ELL view (MXU fast path on community graphs;
    # ops/kernels/hybrid.py).  Value-DEPENDENT (blocks bake the values):
    # set_value invalidates it, unlike the edge-id-based ELL views.
    _hybrid: Optional[Any]

    def __init__(
        self,
        row: Optional[jnp.ndarray] = None,
        rowptr: Optional[jnp.ndarray] = None,
        col: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        sparse_sizes: Optional[Tuple[Optional[int], Optional[int]]] = None,
        rowcount: Optional[jnp.ndarray] = None,
        colptr: Optional[jnp.ndarray] = None,
        colcount: Optional[jnp.ndarray] = None,
        csr2csc: Optional[jnp.ndarray] = None,
        csc2csr: Optional[jnp.ndarray] = None,
        is_sorted: bool = False,
        trust_data: bool = False,
        _host_data_owned: bool = False,
    ):
        assert row is not None or rowptr is not None
        assert col is not None
        # Host copies (numpy/list inputs) power host-side probes, sorts
        # and derived-view builds — one eager device op per new shape
        # costs a full remote compile on the TPU tunnel, and pulling
        # arrays back from the device is ~30x slower than pushing.
        host_row, row_owned = _host_int64(row)
        host_col, col_owned = _host_int64(col)
        host_rowptr, rowptr_owned = _host_int64(rowptr)
        if _host_data_owned:
            # Internal rebuild (coalesce, select, ...): the caller hands
            # over freshly built arrays — no defensive copy needed.
            row_owned = col_owned = rowptr_owned = True
        col = _as_index(col)
        assert col.ndim == 1

        if row is not None:
            row = _as_index(row)
            assert row.ndim == 1
            assert row.shape[0] == col.shape[0]
        if rowptr is not None:
            rowptr = _as_index(rowptr)
            assert rowptr.ndim == 1

        # --- Shape inference (reference storage.py:56-136). Requires
        # concrete data; under tracing, sparse_sizes must be given.
        M: Optional[int] = None
        N: Optional[int] = None
        if sparse_sizes is not None:
            M, N = sparse_sizes[0], sparse_sizes[1]
        if M is None:
            if rowptr is not None:
                M = int(rowptr.shape[0]) - 1
            elif host_row is not None:
                M = int(host_row.max()) + 1 if host_row.shape[0] > 0 else 0
            elif _is_concrete(row):
                M = int(row.max()) + 1 if row.shape[0] > 0 else 0
            else:
                raise ValueError(
                    "sparse_sizes[0] must be given when `row` is traced"
                )
        if N is None:
            if host_col is not None:
                N = int(host_col.max()) + 1 if host_col.shape[0] > 0 else 0
            elif _is_concrete(col):
                N = int(col.max()) + 1 if col.shape[0] > 0 else 0
            else:
                raise ValueError(
                    "sparse_sizes[1] must be given when `col` is traced"
                )
        M, N = int(M), int(N)

        if not trust_data and _is_concrete(col) and col.shape[0] > 0:
            cmin, cmax = (
                (int(host_col.min()), int(host_col.max()))
                if host_col is not None
                else (int(col.min()), int(col.max()))
            )
            assert cmin >= 0 and cmax < N, (
                "`col` contains indices outside [0, N)"
            )
            if row is not None and _is_concrete(row):
                rmin, rmax = (
                    (int(host_row.min()), int(host_row.max()))
                    if host_row is not None
                    else (int(row.min()), int(row.max()))
                )
                assert rmin >= 0 and rmax < M
            if rowptr is not None and _is_concrete(rowptr):
                hp = host_rowptr if host_rowptr is not None else rowptr
                assert int(hp[0]) == 0 and int(hp[-1]) == col.shape[0]

        if value is not None:
            # numpy values stay on host until after the sort block so the
            # host fast path can permute them without a device gather.
            if not isinstance(value, np.ndarray):
                value = jnp.asarray(value)
            assert value.shape[0] == col.shape[0]

        if rowcount is not None:
            rowcount = _as_index(rowcount)
            assert rowcount.shape[0] == M
        if colptr is not None:
            colptr = _as_index(colptr)
            assert colptr.shape[0] == N + 1
        if colcount is not None:
            colcount = _as_index(colcount)
            assert colcount.shape[0] == N
        if csr2csc is not None:
            csr2csc = _as_index(csr2csc)
            assert csr2csc.shape[0] == col.shape[0]
        if csc2csr is not None:
            csc2csr = _as_index(csc2csr)
            assert csc2csr.shape[0] == col.shape[0]

        # --- Sortedness probe + canonical (row, col) sort
        # (reference storage.py:149-163).
        if not is_sorted and rowptr is None:
            if not _is_concrete(row) or not _is_concrete(col):
                raise ValueError(
                    "Cannot probe sortedness of traced indices; pass "
                    "`is_sorted=True` (or construct eagerly)."
                )
            if host_row is not None and host_col is not None:
                # Host probe + sort: numpy is both faster at these sizes
                # and free of the per-shape remote-compile cost.
                if host_row.shape[0] > 1:
                    keys_sorted = bool(np.all(
                        (host_row[1:] > host_row[:-1])
                        | ((host_row[1:] == host_row[:-1])
                           & (host_col[1:] >= host_col[:-1]))
                    ))
                else:
                    keys_sorted = True
                if not keys_sorted:
                    # Sorted row/col come decoded from the sorted radix
                    # keys (no random gathers); 1-D f32/f64 host values
                    # ride the sort as the radix payload (native.cpp
                    # sort_edges_*) so no perm is materialized and no
                    # random value gather runs.  `not trust_data`
                    # guarantees the index bounds the key encoding needs
                    # were validated above.
                    val_np = value if isinstance(value, np.ndarray) else None
                    if (
                        _bindings.available()
                        and not trust_data
                        and host_row.shape[0] >= _NATIVE_COALESCE_MIN
                        and 0 < N and 0 < M <= (1 << 64) // N
                    ):
                        carried = (
                            val_np is not None and val_np.ndim == 1
                            and val_np.dtype in (np.float32, np.float64)
                        )
                        host_row, host_col, third = _bindings.sort_edges(
                            host_row, host_col,
                            val_np if carried else None, M, N,
                        )
                        if carried:
                            value = jnp.asarray(third)
                        elif val_np is not None:
                            value = jnp.asarray(val_np[third])
                        elif value is not None:
                            value = value[jnp.asarray(third)]
                    else:
                        perm_np, host_row, host_col = lexsort2_decode(
                            host_row, host_col
                        )
                        if value is not None:
                            if isinstance(value, np.ndarray):
                                value = jnp.asarray(value[perm_np])
                            else:
                                value = value[jnp.asarray(perm_np)]
                    row_owned = col_owned = True  # sort outputs are fresh
                    row = _as_index(host_row)
                    col = _as_index(host_col)
                    csr2csc = csc2csr = None
            else:
                if row.shape[0] > 1:
                    keys_sorted = bool(
                        jnp.all(
                            (row[1:] > row[:-1])
                            | ((row[1:] == row[:-1]) & (col[1:] >= col[:-1]))
                        )
                    )
                else:
                    keys_sorted = True
                if not keys_sorted:
                    perm = lexsort_rows(row, col)
                    row = row[perm]
                    col = col[perm]
                    if value is not None:
                        if isinstance(value, np.ndarray):
                            value = jnp.asarray(value)
                        value = value[perm]
                    csr2csc = csc2csr = None
                    # The device sort reordered the indices; any host
                    # copy captured above is now stale — drop it.
                    host_row = host_col = None

        if isinstance(value, np.ndarray):
            value = jnp.asarray(value)

        self._row = row
        self._rowptr = rowptr
        self._col = col
        self._value = value
        self._sparse_sizes = (M, N)
        self._rowcount = rowcount
        self._colptr = colptr
        self._colcount = colcount
        self._csr2csc = csr2csc
        self._csc2csr = csc2csr
        self._ell = None
        self._ell_t = None
        self._hybrid = None
        self._ell_baked = None
        self._ell_t_baked = None

        # Seed the host-copy cache (numpy_view) with arrays that never
        # left the host, so host-side algorithms (samplers, SpGEMM,
        # derived-view builds) skip the slow device->host pull.
        np_cache = {}
        if host_row is not None:
            np_cache["row"] = host_row if row_owned else host_row.copy()
        if host_col is not None:
            np_cache["col"] = host_col if col_owned else host_col.copy()
        if host_rowptr is not None:
            np_cache["rowptr"] = (host_rowptr if rowptr_owned
                                  else host_rowptr.copy())
        if np_cache:
            self._np_cache = np_cache

    @classmethod
    def empty(cls) -> "SparseStorage":
        row = jnp.zeros((0,), dtype=INDEX_DTYPE)
        col = jnp.zeros((0,), dtype=INDEX_DTYPE)
        return cls(row=row, col=col, sparse_sizes=(0, 0), is_sorted=True,
                   trust_data=True)

    # ------------------------------------------------------------------
    # Format views (lazy, memoized — reference storage.py:186-213).
    # ------------------------------------------------------------------
    def has_row(self) -> bool:
        return self._row is not None

    def _np_cached(self, name: str) -> Optional[np.ndarray]:
        """Host copy of a view if one exists WITHOUT pulling from device."""
        cache = getattr(self, "_np_cache", None)
        return None if cache is None else cache.get(name)

    def _np_seed(self, name: str, arr: np.ndarray) -> np.ndarray:
        cache = getattr(self, "_np_cache", None)
        if cache is None:
            cache = self._np_cache = {}
        cache[name] = np.ascontiguousarray(arr, np.int64)
        return cache[name]

    def _memo(self, attr: str, value: jnp.ndarray) -> jnp.ndarray:
        """Memoize a derived device view — except while a trace is
        active: device arrays created during tracing are entangled with
        the trace, and a CLOSED-OVER storage object outlives it, so
        caching one leaks it into later traces/eager calls (jax 0.9
        ``UnexpectedTracerError``).  The numpy host cache (``_np_seed``)
        still memoizes, so only the final device transfer repeats per
        trace."""
        if not _tracing():
            setattr(self, attr, value)
        return value

    def row(self) -> jnp.ndarray:
        if self._row is None:
            hptr = self._np_cached("rowptr")
            if hptr is not None:
                hrow = np.repeat(
                    np.arange(hptr.shape[0] - 1, dtype=np.int64),
                    np.diff(hptr),
                )
                self._np_seed("row", hrow)
                return self._memo("_row", _as_index(hrow))
            return self._memo(
                "_row", ptr2ind(self._rowptr, self._col.shape[0])
            )
        return self._row

    def has_rowptr(self) -> bool:
        return self._rowptr is not None

    def rowptr(self) -> jnp.ndarray:
        if self._rowptr is None:
            hrow = self._np_cached("row")
            if hrow is not None:
                # ind2ptr on host: rowptr[i] = first nnz with row >= i.
                hptr = np.searchsorted(
                    hrow,
                    np.arange(self._sparse_sizes[0] + 1, dtype=np.int64),
                )
                self._np_seed("rowptr", hptr)
                return self._memo("_rowptr", _as_index(hptr))
            return self._memo(
                "_rowptr", ind2ptr(self._row, self._sparse_sizes[0])
            )
        return self._rowptr

    def col(self) -> jnp.ndarray:
        return self._col

    def has_value(self) -> bool:
        return self._value is not None

    def value(self) -> Optional[jnp.ndarray]:
        return self._value

    def set_value(
        self, value: Optional[jnp.ndarray], layout: Optional[str] = None
    ) -> "SparseStorage":
        """Functional value replacement with layout reinterpretation
        (reference ``storage.py:224-264``): a ``'csc'``-ordered value is
        permuted back into CSR order via ``csc2csr``."""
        if value is not None:
            value = jnp.asarray(value)
            if get_layout(layout) == "csc":
                value = value[self.csc2csr()]
            assert value.shape[0] == self._col.shape[0]
        out = SparseStorage(
            row=self._row, rowptr=self._rowptr, col=self._col, value=value,
            sparse_sizes=self._sparse_sizes, rowcount=self._rowcount,
            colptr=self._colptr, colcount=self._colcount,
            csr2csc=self._csr2csc, csc2csr=self._csc2csr,
            is_sorted=True, trust_data=True,
        )
        # ELL views and host copies index edges, not values — they
        # survive value swaps.
        out._ell, out._ell_t = self._ell, self._ell_t
        cache = getattr(self, "_np_cache", None)
        if cache:
            out._np_cache = dict(cache)
        return out

    # The reference distinguishes in-place `set_value_`; arrays are
    # immutable in JAX so both spellings return a new storage.
    set_value_ = set_value

    # ------------------------------------------------------------------
    # Sizes
    # ------------------------------------------------------------------
    def sparse_sizes(self) -> Tuple[int, int]:
        return self._sparse_sizes

    def sparse_size(self, dim: int) -> int:
        return self._sparse_sizes[dim]

    def nnz(self) -> int:
        return int(self._col.shape[0])

    def sparse_resize(self, sparse_sizes: Tuple[int, int]) -> "SparseStorage":
        """Grow/shrink the logical matrix shape, patching caches where cheap
        and dropping them otherwise (reference ``storage.py:272-315``)."""
        old_M, old_N = self._sparse_sizes
        M, N = int(sparse_sizes[0]), int(sparse_sizes[1])

        rowptr, rowcount = self._rowptr, self._rowcount
        if M != old_M:
            if rowptr is not None:
                if M > old_M:
                    pad = jnp.full((M - old_M,), self.nnz(), dtype=INDEX_DTYPE)
                    rowptr = jnp.concatenate([rowptr, pad])
                else:
                    rowptr = rowptr[: M + 1]
            if rowcount is not None:
                if M > old_M:
                    rowcount = jnp.concatenate(
                        [rowcount, jnp.zeros((M - old_M,), dtype=INDEX_DTYPE)]
                    )
                else:
                    rowcount = rowcount[:M]

        colptr, colcount = self._colptr, self._colcount
        if N != old_N:
            if colptr is not None:
                if N > old_N:
                    pad = jnp.full((N - old_N,), self.nnz(), dtype=INDEX_DTYPE)
                    colptr = jnp.concatenate([colptr, pad])
                else:
                    colptr = None
            if colcount is not None:
                if N > old_N:
                    colcount = jnp.concatenate(
                        [colcount, jnp.zeros((N - old_N,), dtype=INDEX_DTYPE)]
                    )
                else:
                    colcount = None

        return SparseStorage(
            row=self._row, rowptr=rowptr, col=self._col, value=self._value,
            sparse_sizes=(M, N), rowcount=rowcount, colptr=colptr,
            colcount=colcount, csr2csc=self._csr2csc, csc2csr=self._csc2csr,
            is_sorted=True, trust_data=True,
        )

    def sparse_reshape(self, num_rows: int, num_cols: int) -> "SparseStorage":
        """Reinterpret flattened nnz positions in a new (M, N) grid
        (reference ``storage.py:317-351``)."""
        assert num_rows > 0 or num_rows == -1
        assert num_cols > 0 or num_cols == -1
        assert num_rows > 0 or num_cols > 0

        total = self.sparse_size(0) * self.sparse_size(1)
        if num_rows == -1:
            num_rows = total // num_cols
        if num_cols == -1:
            num_cols = total // num_rows
        assert num_rows * num_cols == total

        # Flattened-position math needs 64-bit (M*N can exceed int32);
        # under jax_enable_x64=False a device astype(int64) silently
        # truncates, so compute on the host in exact int64 when concrete.
        r, c = self.row(), self._col
        if _is_concrete(r) and _is_concrete(c):
            import numpy as np

            idx = (
                np.asarray(r, np.int64) * self.sparse_size(1)
                + np.asarray(c, np.int64)
            )
            row = _as_index(idx // num_cols)
            col = _as_index(idx % num_cols)
        else:
            if self.sparse_size(0) * self.sparse_size(1) >= 2**31:
                raise ValueError(
                    "sparse_reshape under tracing needs M*N < 2**31 "
                    "(enable jax_enable_x64 or reshape eagerly)"
                )
            idx = r * self.sparse_size(1) + c
            row = (idx // num_cols).astype(INDEX_DTYPE)
            col = (idx % num_cols).astype(INDEX_DTYPE)
        return SparseStorage(
            row=row, rowptr=None, col=col, value=self._value,
            sparse_sizes=(int(num_rows), int(num_cols)),
            is_sorted=True, trust_data=True,
        )

    # ------------------------------------------------------------------
    # Derived caches (reference storage.py:355-429)
    # ------------------------------------------------------------------
    def has_rowcount(self) -> bool:
        return self._rowcount is not None

    def rowcount(self) -> jnp.ndarray:
        if self._rowcount is None:
            rowptr = self.rowptr()
            hptr = self._np_cached("rowptr")
            if hptr is not None:
                return self._memo("_rowcount", _as_index(np.diff(hptr)))
            return self._memo("_rowcount", rowptr[1:] - rowptr[:-1])
        return self._rowcount

    def has_colptr(self) -> bool:
        return self._colptr is not None

    def colptr(self) -> jnp.ndarray:
        if self._colptr is None:
            hcol = self._np_cached("col")
            if hcol is not None:
                counts = np.bincount(hcol, minlength=self._sparse_sizes[1])
                hptr = np.concatenate([[0], np.cumsum(counts)])
                self._np_seed("colptr", hptr)
                return self._memo("_colptr", _as_index(hptr))
            if self._csr2csc is not None:
                return self._memo("_colptr", ind2ptr(
                    self._col[self._csr2csc], self._sparse_sizes[1]
                ))
            # counts -> cumulative sum (no sort needed).
            counts = segment_count(self._col, self._sparse_sizes[1])
            return self._memo("_colptr", jnp.concatenate(
                [jnp.zeros((1,), INDEX_DTYPE),
                 jnp.cumsum(counts).astype(INDEX_DTYPE)]
            ))
        return self._colptr

    def has_colcount(self) -> bool:
        return self._colcount is not None

    def colcount(self) -> jnp.ndarray:
        if self._colcount is None:
            hcol = self._np_cached("col")
            hptr = self._np_cached("colptr")
            if hptr is not None:
                return self._memo("_colcount", _as_index(np.diff(hptr)))
            if hcol is not None:
                return self._memo("_colcount", _as_index(
                    np.bincount(hcol, minlength=self._sparse_sizes[1])
                ))
            if self._colptr is not None:
                return self._memo(
                    "_colcount", self._colptr[1:] - self._colptr[:-1]
                )
            return self._memo("_colcount", segment_count(
                self._col, self._sparse_sizes[1]
            ).astype(INDEX_DTYPE))
        return self._colcount

    def has_csr2csc(self) -> bool:
        return self._csr2csc is not None

    def csr2csc(self) -> jnp.ndarray:
        """Permutation taking CSR-ordered nnz to CSC order: stable sort by
        (col, row) — reference ``storage.py:407-416``."""
        if self._csr2csc is None:
            hcol = self._np_cached("col")
            if hcol is not None:
                self.row()  # may host-build from rowptr and seed the cache
            hrow = self._np_cached("row")
            if hcol is not None and hrow is not None:
                perm = lexsort2(hcol, hrow)
                self._np_seed("csr2csc", perm)
                return self._memo("_csr2csc", _as_index(perm))
            return self._memo("_csr2csc", lexsort_rows(
                self._col, self.row()
            ).astype(INDEX_DTYPE))
        return self._csr2csc

    def csr2csc_decode_host(self):
        """``(csr2csc, col[csr2csc], row[csr2csc])`` as numpy arrays via
        one native sort+decode (no random gathers), or None when no host
        views exist.  Seeds the csr2csc caches; the sorted outputs are
        exactly the transposed tensor's (row, col)."""
        hcol = self._np_cached("col")
        if hcol is not None:
            self.row()  # may host-build from rowptr and seed the cache
        hrow = self._np_cached("row")
        if hcol is None or hrow is None:
            return None
        hperm = self._np_cached("csr2csc")
        if hperm is not None:
            return hperm, hcol[hperm], hrow[hperm]
        perm, col_s, row_s = lexsort2_decode(hcol, hrow)
        self._np_seed("csr2csc", perm)
        if self._csr2csc is None and not _tracing():
            self._csr2csc = _as_index(perm)
        return perm, col_s, row_s

    def has_csc2csr(self) -> bool:
        return self._csc2csr is not None

    def csc2csr(self) -> jnp.ndarray:
        if self._csc2csr is None:
            csr2csc = self.csr2csc()
            hperm = self._np_cached("csr2csc")
            if hperm is not None:
                inv = np.empty_like(hperm)
                inv[hperm] = np.arange(hperm.shape[0], dtype=np.int64)
                self._np_seed("csc2csr", inv)
                return self._memo("_csc2csr", _as_index(inv))
            return self._memo("_csc2csr", (
                jnp.zeros_like(csr2csc)
                .at[csr2csc]
                .set(jnp.arange(csr2csc.shape[0], dtype=INDEX_DTYPE))
            ))
        return self._csc2csr

    # ------------------------------------------------------------------
    # ELLPACK views (TPU SpMM fast path; not a reference cache — see
    # ops/kernels/ell.py).  Built eagerly on first use; under tracing
    # they are only available if already filled (they ride the pytree).
    # ------------------------------------------------------------------
    def has_ell(self) -> bool:
        return self._ell is not None

    def ell(self):
        """ELLPACK view of the CSR layout (gather index = col)."""
        if self._ell is None:
            import numpy as np

            from .ops.kernels.ell import build_ell

            if _tracing():
                return None  # eager-only build
            rowptr, col = self.rowptr(), self._col
            if not _is_concrete(rowptr) or not _is_concrete(col):
                return None
            self._ell = build_ell(
                np.asarray(rowptr), np.asarray(col), None,
                self._sparse_sizes[0],
            )
        return self._ell

    def has_ell_t(self) -> bool:
        return self._ell_t is not None

    def ell_t(self):
        """ELLPACK view of the transpose (CSC layout, gather index = row);
        edge ids reference the original CSR edge order via csr2csc."""
        if self._ell_t is None:
            import numpy as np

            from .ops.kernels.ell import build_ell

            if _tracing():
                return None  # eager-only build
            colptr = self.colptr()
            csr2csc = self.csr2csc()
            row = self.row()
            if (
                not _is_concrete(colptr)
                or not _is_concrete(csr2csc)
                or not _is_concrete(row)
            ):
                return None
            perm = np.asarray(csr2csc)
            self._ell_t = build_ell(
                np.asarray(colptr), np.asarray(row)[perm], perm,
                self._sparse_sizes[1],
            )
        return self._ell_t

    # ------------------------------------------------------------------
    # Baked slot-layout value tables for the ELL views: replace the
    # forward's per-slot 4 B-granule gather of ``value_pad[eids]`` with
    # contiguous (R, cap) reads (~1 ms at arxiv scale, measured
    # benchmarks/probe_ell_decomp.py).  Value-DEPENDENT: ``set_value``
    # drops them (the edge-id ELL views themselves survive).
    # ------------------------------------------------------------------
    def ell_baked(self):
        if getattr(self, "_ell_baked", None) is not None:
            return self._ell_baked
        if (self._value is None or not _is_concrete(self._value)
                or _tracing()):
            return None
        ell = self.ell()
        if ell is None:
            return None
        from .ops.kernels.ell import bake_values

        self._ell_baked = bake_values(ell, self._value)
        return self._ell_baked

    def ell_t_baked(self):
        if getattr(self, "_ell_t_baked", None) is not None:
            return self._ell_t_baked
        if (self._value is None or not _is_concrete(self._value)
                or _tracing()):
            return None
        ell_t = self.ell_t()
        if ell_t is None:
            return None
        from .ops.kernels.ell import bake_values

        self._ell_t_baked = bake_values(ell_t, self._value)
        return self._ell_t_baked

    # ------------------------------------------------------------------
    # Hybrid block-dense + ELL view (ops/kernels/hybrid.py).  Auto-built
    # on first (eager) request when the measured block-density stats
    # predict an MXU win — community graphs at Reddit-like densities see
    # 4-5x over the gather path (BASELINE.md); uniform/sparse graphs set
    # a skip marker and stay on the ELL path.
    # ------------------------------------------------------------------
    _HYBRID_B = 512               # stats/auto-build block size
    _HYBRID_MIN_EDGES = 200_000   # below this the ELL path is sub-ms
    _HYBRID_MIN_FRACTION = 0.30   # dense-edge share for a >=1.4x model win
    # f32 block-store budget (v5e has 16 GB HBM; full-Reddit f32 blocks
    # are ~7.5 GB and the operands/remainder tables fit beside them —
    # f32 keeps the oracle err at ~1e-5 where bf16 stores sit at ~2e-3).
    _HYBRID_MAX_BLOCK_BYTES = 8 << 30
    # Whole-matrix dense route: if the OVERALL density clears the
    # densify break-even and the (M, N) store fits this HBM budget, one
    # MXU matmul beats any table walk (DenseFormat).
    _DENSE_MAX_BYTES = int(2.5e9)

    def has_hybrid(self) -> bool:
        return self._hybrid is not None

    def set_hybrid_(self, h) -> "SparseStorage":
        """Install a pre-built :class:`HybridFormat` (e.g. one built
        block-aligned with a ``partptr`` after ``partition()``)."""
        self._hybrid = h
        self._hybrid_skip = None
        return self

    def hybrid(self, auto: bool = True, K_hint: Optional[int] = None):
        """Cached hybrid view; ``auto`` builds it eagerly when the
        density stats say the MXU path wins.  Returns None under
        tracing (unless already filled — it rides the pytree) and on
        graphs where the format would not pay.

        ``K_hint`` is the caller's feature width (``other.shape[-1]`` of
        the first SpMM): the densify break-even prices the block cost
        (X temporaries + MXU flops scale with K) against the per-edge
        gather cost, so a K=16 workload densifies at ~0.7x the K=128
        density threshold.  The view is priced at the FIRST call's K and
        cached; a prior skip is re-evaluated when a narrower K arrives
        (narrower K only lowers the threshold)."""
        K = int(K_hint) if K_hint else 128
        if self._hybrid is not None:
            return self._hybrid
        skip_K = getattr(self, "_hybrid_skip", None)
        if not auto or (skip_K is not None and K >= skip_K):
            return None
        if _tracing():
            return None  # eager-only build; decide on a later call
        value = self._value
        if value is not None:
            if not _is_concrete(value):
                return None  # traced values can't be baked into blocks
            if not jnp.issubdtype(value.dtype, jnp.floating):
                # int/bool values follow the exact ELL path
                self._hybrid_skip = 0  # skip at every K
                return None
        M, N = self._sparse_sizes
        B = self._HYBRID_B
        if (self._col.shape[0] < self._HYBRID_MIN_EDGES
                or min(M, N) < 4 * B):
            self._hybrid_skip = 0
            return None
        row = self.numpy_view("row")
        col = self.numpy_view("col")
        if row is None or col is None:
            return None  # tracing: decide on a later eager call
        from .ops.kernels.hybrid import (
            block_break_even, build_dense, build_hybrid, dense_fraction,
            get_store_budget, quantization_rel_err,
        )

        # build_hybrid allocates blocks in the value dtype (f32 for
        # implicit ones), so size the cap with the actual element width.
        elem = 4 if value is None else max(
            4, jnp.dtype(value.dtype).itemsize
        )
        val = None if value is None else np.asarray(value)
        # Store-dtype rule (MEASURED, VERDICT r3 item 3): bf16 stores
        # halve the read-bound MXU routes, but round the values at rest.
        # Pick bf16 when the actual values' quantization error fits the
        # declared budget (default 0.0 = lossless only: implicit ones,
        # integer counts); q is the empirical output-error scale.
        q = quantization_rel_err(val) if elem <= 4 else float("inf")
        store_bf16 = q <= get_store_budget()
        s_elem = 2 if store_bf16 else elem
        # Break-even priced for the actual store dtype: f32 blocks at
        # the default HIGH precision cost ~3x their raw read (bf16x3
        # split copies + 3 passes), bf16 blocks run one k-concat pass.
        # K-aware (VERDICT r4 item 7): priced at the caller's K.
        be = block_break_even(B, K_hint=K, elem=s_elem,
                              passes=1.0 if store_bf16 else 3.0)
        # Whole-matrix dense route: overall density past the block
        # break-even means EVERY block region pays to densify — skip the
        # tables and run one MXU matmul (probe_hybrid_forms.py: ~3x over
        # the block walk at Reddit-10% density).
        E = row.shape[0]
        if (E / (M * N) >= be
                and M * N * s_elem <= self._DENSE_MAX_BYTES):
            self._hybrid = build_dense(
                row, col, val, M, N,
                dtype=jnp.bfloat16 if store_bf16 else None,
            )
            return self._hybrid
        frac, nb = dense_fraction(row, col, M, N, B=B, min_density=be)
        if frac < self._HYBRID_MIN_FRACTION:
            self._hybrid_skip = K  # re-evaluate only for narrower K
            return None
        # Block store: bf16 within the declared budget, and as the
        # fallback when the f32 store would blow the HBM cap (halves
        # bytes AND read traffic).
        block_dtype = jnp.bfloat16 if store_bf16 else None
        blk_bytes = (nb + 1) * B * B * s_elem
        if blk_bytes > self._HYBRID_MAX_BLOCK_BYTES:
            if (elem <= 4
                    and (nb + 1) * B * B * 2 <= self._HYBRID_MAX_BLOCK_BYTES):
                block_dtype = jnp.bfloat16
            else:
                self._hybrid_skip = 0
                return None
        self._hybrid = build_hybrid(row, col, val, M, N, B=B,
                                    min_density=be,
                                    block_dtype=block_dtype)
        return self._hybrid

    # ------------------------------------------------------------------
    # Memoized host-side int64 views for the samplers/partitioner (the
    # C-ABI kernels take int64; converting 5-10 MB of CSR arrays per
    # sampler call dominated sampling time otherwise).  Host caches, not
    # pytree leaves.
    # ------------------------------------------------------------------
    def numpy_view(self, name: str):
        """Host int64 copy of ``row/rowptr/col/colptr/csr2csc/...``,
        memoized per storage instance; None under tracing.  Pulls from
        the device when no host copy exists (slow over the TPU tunnel;
        construction from numpy arrays pre-seeds the cache)."""
        cache = getattr(self, "_np_cache", None)
        if cache is None:
            cache = self._np_cache = {}
        if name not in cache:
            arr = getattr(self, name)()
            if not _is_concrete(arr):
                return None
            if name not in cache:
                # (the getter may have host-built and seeded the view —
                # only pull from the device when it really didn't)
                cache[name] = np.ascontiguousarray(
                    np.asarray(arr), np.int64)
        return cache[name]

    def numpy_view_cached(self, name: str) -> Optional[np.ndarray]:
        """Host copy if obtainable WITHOUT any device transfer: cached,
        or derivable on host from another cached view. None otherwise."""
        v = self._np_cached(name)
        if v is not None:
            return v
        if name == "row" and self._np_cached("rowptr") is not None:
            self.row()
            return self._np_cached("row")
        if name == "rowptr" and self._np_cached("row") is not None:
            self.rowptr()
            return self._np_cached("rowptr")
        return None

    # ------------------------------------------------------------------
    # Coalescing (reference storage.py:431-466). Output nnz is
    # data-dependent -> eager-only when duplicates exist.
    # ------------------------------------------------------------------
    def is_coalesced(self) -> bool:
        hrow = self.numpy_view_cached("row")
        hcol = self.numpy_view_cached("col")
        if hrow is not None and hcol is not None:
            if hrow.shape[0] < 2:
                return True
            if _bindings.available() and hrow.shape[0] >= _NATIVE_COALESCE_MIN:
                return not _bindings.sorted_has_dup(hrow, hcol)
            return not bool(np.any(
                (hrow[1:] == hrow[:-1]) & (hcol[1:] == hcol[:-1])
            ))
        row, col = self.row(), self._col
        if row.shape[0] < 2:
            return True
        same = (row[1:] == row[:-1]) & (col[1:] == col[:-1])
        return not bool(jnp.any(same))

    def coalesce(self, reduce: str = "add") -> "SparseStorage":
        hrow = self.numpy_view_cached("row")
        hcol = self.numpy_view_cached("col")
        if hrow is not None and hcol is not None:
            return self._coalesce_host(hrow, hcol, reduce)
        row, col, value = self.row(), self._col, self._value
        E = row.shape[0]
        if E == 0:
            return self
        if not _is_concrete(row) or not _is_concrete(col):
            raise ValueError(
                "coalesce() has data-dependent output size and must run "
                "eagerly (outside jit)."
            )
        keep = jnp.concatenate(
            [jnp.ones((1,), bool),
             (row[1:] != row[:-1]) | (col[1:] != col[:-1])]
        )
        if bool(jnp.all(keep)):
            return self
        # Segment id of each nnz in the deduplicated output.
        seg = jnp.cumsum(keep.astype(INDEX_DTYPE)) - 1
        n_out = int(seg[-1]) + 1
        new_row = row[keep]
        new_col = col[keep]
        new_value = None
        if value is not None:
            new_value = segment_reduce(
                value, seg, n_out, reduce=reduce, indices_are_sorted=True
            )
        return SparseStorage(
            row=new_row, rowptr=None, col=new_col, value=new_value,
            sparse_sizes=self._sparse_sizes, is_sorted=True, trust_data=True,
        )

    # Pull budget for routing a concrete device value array through the
    # host coalesce path (tunnel pulls run ~35 MB/s; beyond this the
    # device segment_reduce wins even with its one-off compile).
    _COALESCE_PULL_MAX_BYTES = 1 << 26

    def _coalesce_host(self, hrow: np.ndarray, hcol: np.ndarray,
                       reduce: str) -> "SparseStorage":
        """Dedupe on host arrays: no device round-trip for the indices,
        fused native sweeps (count/fill/reduce, csrc native.cpp) above
        the crossover, numpy ``reduceat`` otherwise; device
        segment_reduce (with a host-computed, pushed segment map) for
        big/traced values."""
        if reduce not in ("add", "sum", "mean", "min", "max"):
            raise ValueError(f"Unknown reduce: {reduce!r}")
        E = hrow.shape[0]
        if E == 0:
            return self
        value = self._value
        # The pull budget guards the ~35 MB/s device->host tunnel; on a
        # host (cpu) backend np.asarray(value) is a local copy, so any
        # size may take the host reduce path.
        pull_ok = value is not None and _is_concrete(value) and (
            value.size * value.dtype.itemsize
            <= self._COALESCE_PULL_MAX_BYTES
            or (isinstance(value, jnp.ndarray)
                and next(iter(value.devices())).platform == "cpu")
        )
        native = (
            _bindings.available() and E >= _NATIVE_COALESCE_MIN
            and hrow.dtype.kind in "iu" and hcol.dtype.kind in "iu"
        )
        if native:
            # One early-exit dup probe, then two fused sweeps replace the
            # five full-array numpy passes (keep mask / all / boolean
            # index x2 / flatnonzero): 40 s -> ~4 s at 160M edges.
            if not _bindings.sorted_has_dup(hrow, hcol):
                return self
            want_seg = value is not None and not pull_ok
            new_row, new_col, starts, seg_np = _bindings.coalesce_fill(
                hrow, hcol, want_seg=want_seg
            )
            starts_trunc = starts[:-1]
        else:
            keep = np.concatenate(
                [[True], (hrow[1:] != hrow[:-1]) | (hcol[1:] != hcol[:-1])]
            )
            if keep.all():
                return self
            new_row = hrow[keep]
            new_col = hcol[keep]
            starts = None
            starts_trunc = None
            seg_np = None
            if value is not None:
                starts_trunc = np.flatnonzero(keep)
                starts = np.concatenate([starts_trunc, [E]])
                if not pull_ok:
                    seg_np = (np.cumsum(keep) - 1).astype(
                        np.int64 if E >= 2**31 else np.int32
                    )
        new_value = None
        if value is not None:
            if pull_ok:
                v = np.asarray(value)
                if (
                    native
                    and v.dtype in (np.float32, np.float64)
                    and v.flags.c_contiguous
                ):
                    out = _bindings.segment_reduce_val(v, starts, reduce)
                elif reduce in ("add", "sum"):
                    out = np.add.reduceat(v, starts_trunc, axis=0)
                elif reduce == "mean":
                    cnt = np.diff(starts)
                    shape = (-1,) + (1,) * (v.ndim - 1)
                    out = (np.add.reduceat(v.astype(np.float64),
                                           starts_trunc, axis=0)
                           / cnt.reshape(shape)).astype(v.dtype)
                elif reduce == "min":
                    out = np.minimum.reduceat(v, starts_trunc, axis=0)
                else:
                    out = np.maximum.reduceat(v, starts_trunc, axis=0)
                new_value = jnp.asarray(out)
            else:
                new_value = segment_reduce(
                    value, jnp.asarray(seg_np), int(new_row.shape[0]),
                    reduce=reduce, indices_are_sorted=True,
                )
        return SparseStorage(
            row=new_row, rowptr=None, col=new_col, value=new_value,
            sparse_sizes=self._sparse_sizes, is_sorted=True, trust_data=True,
            _host_data_owned=True,
        )

    # ------------------------------------------------------------------
    # Cache control (reference storage.py:468-501)
    # ------------------------------------------------------------------
    def fill_cache_(self) -> "SparseStorage":
        self.row()
        self.rowptr()
        self.rowcount()
        self.colptr()
        self.colcount()
        self.csr2csc()
        self.csc2csr()
        return self

    def clear_cache_(self) -> "SparseStorage":
        self._rowcount = None
        self._colptr = None
        self._colcount = None
        self._csr2csc = None
        self._csc2csr = None
        self._ell = None
        self._ell_t = None
        self._hybrid = None
        self._hybrid_skip = None
        self._ell_baked = None
        self._ell_t_baked = None
        return self

    def cached_keys(self) -> List[str]:
        keys = []
        for key in ["rowcount", "colptr", "colcount", "csr2csc", "csc2csr"]:
            if getattr(self, f"_{key}") is not None:
                keys.append(key)
        return keys

    def num_cached_keys(self) -> int:
        return len(self.cached_keys())

    # ------------------------------------------------------------------
    # Copy / device / dtype (reference storage.py:503-710)
    # ------------------------------------------------------------------
    def copy(self) -> "SparseStorage":
        out = SparseStorage(
            row=self._row, rowptr=self._rowptr, col=self._col,
            value=self._value, sparse_sizes=self._sparse_sizes,
            rowcount=self._rowcount, colptr=self._colptr,
            colcount=self._colcount, csr2csc=self._csr2csc,
            csc2csr=self._csc2csr, is_sorted=True, trust_data=True,
        )
        out._ell, out._ell_t = self._ell, self._ell_t
        out._hybrid = self._hybrid
        out._ell_baked = getattr(self, "_ell_baked", None)
        out._ell_t_baked = getattr(self, "_ell_t_baked", None)
        cache = getattr(self, "_np_cache", None)
        if cache:
            out._np_cache = dict(cache)
        return out

    clone = copy  # JAX arrays are immutable; copy == clone.

    def apply_value(self, fn) -> "SparseStorage":
        value = self._value
        if value is not None:
            value = fn(value)
        return self.set_value(value, layout="coo")

    def apply(self, fn) -> "SparseStorage":
        """Apply ``fn`` to every array field (device moves etc.),
        reference ``storage.py:531-546``."""
        def opt(x):
            return None if x is None else fn(x)

        out = SparseStorage(
            row=opt(self._row), rowptr=opt(self._rowptr), col=fn(self._col),
            value=opt(self._value), sparse_sizes=self._sparse_sizes,
            rowcount=opt(self._rowcount), colptr=opt(self._colptr),
            colcount=opt(self._colcount), csr2csc=opt(self._csr2csc),
            csc2csr=opt(self._csc2csr), is_sorted=True, trust_data=True,
        )
        if self._ell is not None:
            out._ell = jax.tree_util.tree_map(fn, self._ell)
        if self._ell_t is not None:
            out._ell_t = jax.tree_util.tree_map(fn, self._ell_t)
        if self._hybrid is not None:
            out._hybrid = jax.tree_util.tree_map(fn, self._hybrid)
        for name in ("_ell_baked", "_ell_t_baked"):
            baked = getattr(self, name, None)
            if baked is not None:
                setattr(out, name, jax.tree_util.tree_map(fn, baked))
        return out

    def to_device(self, device) -> "SparseStorage":
        return self.apply(lambda x: jax.device_put(x, device))

    def astype_value(self, dtype) -> "SparseStorage":
        return self.apply_value(lambda v: v.astype(dtype))

    def __repr__(self) -> str:
        M, N = self._sparse_sizes
        return (
            f"{self.__class__.__name__}(sparse_sizes=({M}, {N}), "
            f"nnz={self.nnz()}, cached={self.cached_keys()})"
        )


def _storage_flatten(s: SparseStorage):
    children = (
        s._row, s._rowptr, s._col, s._value, s._rowcount, s._colptr,
        s._colcount, s._csr2csc, s._csc2csr, s._ell, s._ell_t,
        s._hybrid, getattr(s, "_ell_baked", None),
        getattr(s, "_ell_t_baked", None),
    )
    return children, s._sparse_sizes


def _storage_unflatten(aux, children) -> SparseStorage:
    obj = object.__new__(SparseStorage)
    (obj._row, obj._rowptr, obj._col, obj._value, obj._rowcount, obj._colptr,
     obj._colcount, obj._csr2csc, obj._csc2csr, obj._ell,
     obj._ell_t, obj._hybrid, obj._ell_baked,
     obj._ell_t_baked) = children
    obj._sparse_sizes = aux
    return obj


jax.tree_util.register_pytree_node(
    SparseStorage, _storage_flatten, _storage_unflatten
)
