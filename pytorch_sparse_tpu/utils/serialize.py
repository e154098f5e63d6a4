"""Checkpoint/resume for sparse tensors.

The reference has no serialization of its own — persistence is delegated
to torch pickling of the component tensors (SURVEY.md §5).  The TPU
equivalent: save/load the storage arrays (including any filled format
caches) as an ``.npz`` archive, so a graph's expensive preprocessing
(sort, csr2csc, ELL tables, hybrid block build) is paid once and
restored byte-identical.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

_FIELDS = (
    "_row", "_rowptr", "_col", "_value", "_rowcount", "_colptr",
    "_colcount", "_csr2csc", "_csc2csr",
)


def _pack(arr: np.ndarray, payload: dict, key: str) -> None:
    """Store ``arr`` under ``key``; ml_dtypes values (bfloat16, float8…)
    have numpy kind 'V' which ``np.savez`` round-trips as raw void bytes
    that ``jnp.asarray`` then rejects — store them as unsigned words plus
    a ``<key>.dtype`` record instead."""
    a = np.asarray(arr)
    if a.dtype.kind == "V":
        payload[f"{key}.dtype"] = np.str_(a.dtype.name)
        a = a.view(np.dtype(f"u{a.dtype.itemsize}"))
    payload[key] = a


def _unpack(data: dict, key: str) -> np.ndarray:
    a = data[key]
    dt = data.get(f"{key}.dtype")
    if dt is not None:
        import ml_dtypes  # noqa: F401  (registers the dtype names)

        a = a.view(np.dtype(str(dt)))
    return a


def _save_ell(payload: dict, prefix: str, ell) -> None:
    payload[f"{prefix}.meta"] = np.asarray(
        [len(ell.caps), ell.E, ell.M, ell.n_zero] + list(ell.caps),
        np.int64,
    )
    payload[f"{prefix}.inv_perm"] = np.asarray(ell.inv_perm)
    payload[f"{prefix}.edge_slot"] = np.asarray(ell.edge_slot)
    for b in range(len(ell.caps)):
        payload[f"{prefix}.eids{b}"] = np.asarray(ell.eids[b])
        payload[f"{prefix}.idxs{b}"] = np.asarray(ell.idxs[b])
        payload[f"{prefix}.rows{b}"] = np.asarray(ell.rows[b])


def _load_ell(data: dict, prefix: str):
    from ..ops.kernels.ell import EllFormat

    key = f"{prefix}.meta"
    if key not in data:
        return None
    meta = data[key]
    n_caps, E, M_ell, n_zero = (int(x) for x in meta[:4])
    caps = tuple(int(x) for x in meta[4:4 + n_caps])
    return EllFormat(
        [jnp.asarray(data[f"{prefix}.eids{b}"]) for b in range(n_caps)],
        [jnp.asarray(data[f"{prefix}.idxs{b}"]) for b in range(n_caps)],
        [jnp.asarray(data[f"{prefix}.rows{b}"]) for b in range(n_caps)],
        jnp.asarray(data[f"{prefix}.inv_perm"]),
        jnp.asarray(data[f"{prefix}.edge_slot"]),
        caps, E, M_ell, n_zero,
    )


def _save_baked(payload: dict, prefix: str, baked) -> None:
    payload[f"{prefix}.n"] = np.asarray([len(baked)], np.int64)
    for b, t in enumerate(baked):
        _pack(t, payload, f"{prefix}.{b}")


def _load_baked(data: dict, prefix: str):
    key = f"{prefix}.n"
    if key not in data:
        return None
    n = int(data[key][0])
    return tuple(jnp.asarray(_unpack(data, f"{prefix}.{b}"))
                 for b in range(n))


def _save_hybrid(payload: dict, h) -> None:
    from ..ops.kernels.hybrid import DenseFormat, HybridFormat

    if isinstance(h, DenseFormat):
        payload["_hybrid.kind"] = np.str_("dense")
        payload["_hybrid.meta"] = np.asarray([h.M, h.N], np.int64)
        _pack(h.dense, payload, "_hybrid.dense")
        return
    assert isinstance(h, HybridFormat), type(h)
    payload["_hybrid.kind"] = np.str_("hybrid")
    payload["_hybrid.meta"] = np.asarray(
        [h.M, h.N, h.B, h.dense_nnz, h.M_pad], np.int64
    )
    _pack(h.blocks, payload, "_hybrid.blocks")
    payload["_hybrid.slot_row"] = np.asarray(h.slot_row)
    payload["_hybrid.slot_col"] = np.asarray(h.slot_col)
    payload["_hybrid.order_t"] = np.asarray(h.order_t)
    if h.row_map is not None:
        payload["_hybrid.row_map"] = np.asarray(h.row_map)
    if h.ell is not None:
        _save_ell(payload, "_hybrid.ell", h.ell[0])
        _pack(h.ell[1], payload, "_hybrid.ell_val")
    if h.ell_t is not None:
        _save_ell(payload, "_hybrid.ell_t", h.ell_t)
    if h.rest_ids is not None:
        payload["_hybrid.rest_ids"] = np.asarray(h.rest_ids)
    if h.rest_baked is not None:
        _save_baked(payload, "_hybrid.rest_baked", h.rest_baked)
    if h.rest_baked_t is not None:
        _save_baked(payload, "_hybrid.rest_baked_t", h.rest_baked_t)


def _load_hybrid(data: dict):
    from ..ops.kernels.hybrid import DenseFormat, HybridFormat

    kind = data.get("_hybrid.kind")
    if kind is None:
        return None
    if str(kind) == "dense":
        M, N = (int(x) for x in data["_hybrid.meta"])
        return DenseFormat(jnp.asarray(_unpack(data, "_hybrid.dense")),
                           M, N)
    M, N, B, dense_nnz, M_pad = (int(x) for x in data["_hybrid.meta"])
    ell = _load_ell(data, "_hybrid.ell")
    if ell is not None:
        ell = (ell, jnp.asarray(_unpack(data, "_hybrid.ell_val")))
    row_map = (jnp.asarray(data["_hybrid.row_map"])
               if "_hybrid.row_map" in data else None)
    rest_ids = (jnp.asarray(data["_hybrid.rest_ids"])
                if "_hybrid.rest_ids" in data else None)
    return HybridFormat(
        jnp.asarray(_unpack(data, "_hybrid.blocks")),
        jnp.asarray(data["_hybrid.slot_row"]),
        jnp.asarray(data["_hybrid.slot_col"]),
        jnp.asarray(data["_hybrid.order_t"]),
        ell, M, N, B, dense_nnz, row_map=row_map, M_pad=M_pad,
        ell_t=_load_ell(data, "_hybrid.ell_t"), rest_ids=rest_ids,
        rest_baked=_load_baked(data, "_hybrid.rest_baked"),
        rest_baked_t=_load_baked(data, "_hybrid.rest_baked_t"),
    )


def save_npz(path: str, src) -> None:
    """Save ``src`` (arrays + filled caches, including ELL and
    hybrid/dense block views)."""
    st = src.storage
    payload = {"sparse_sizes": np.asarray(st.sparse_sizes(), np.int64)}
    for f in _FIELDS:
        v = getattr(st, f)
        if v is not None:
            _pack(v, payload, f)
    for name in ("_ell", "_ell_t"):
        ell = getattr(st, name)
        if ell is not None:
            _save_ell(payload, name, ell)
    if st._hybrid is not None:
        _save_hybrid(payload, st._hybrid)
    np.savez(path, **payload)


def load_npz(path: str):
    from ..storage import SparseStorage
    from ..tensor import SparseTensor

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}

    def get(f) -> Optional[jnp.ndarray]:
        return jnp.asarray(_unpack(data, f)) if f in data else None

    M, N = (int(x) for x in data["sparse_sizes"])
    storage = SparseStorage(
        row=get("_row"), rowptr=get("_rowptr"), col=get("_col"),
        value=get("_value"), sparse_sizes=(M, N),
        rowcount=get("_rowcount"), colptr=get("_colptr"),
        colcount=get("_colcount"), csr2csc=get("_csr2csc"),
        csc2csr=get("_csc2csr"), is_sorted=True, trust_data=True,
    )
    for name in ("_ell", "_ell_t"):
        ell = _load_ell(data, name)
        if ell is not None:
            setattr(storage, name, ell)
    h = _load_hybrid(data)
    if h is not None:
        storage.set_hybrid_(h)
    return SparseTensor.from_storage(storage)
