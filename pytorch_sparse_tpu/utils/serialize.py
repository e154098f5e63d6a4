"""Checkpoint/resume for sparse tensors.

The reference has no serialization of its own — persistence is delegated
to torch pickling of the component tensors (SURVEY.md §5).  The TPU
equivalent: save/load the storage arrays (including any filled format
caches) as an ``.npz`` archive, so a graph's expensive preprocessing
(sort, csr2csc, ELL tables) is paid once and restored byte-identical.
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


def save_npz(path: str, src) -> None:
    """Save ``src`` (arrays + filled caches, including ELL views)."""
    st = src.storage
    payload = {"sparse_sizes": np.asarray(st.sparse_sizes(), np.int64)}
    for f in _FIELDS:
        v = getattr(st, f)
        if v is not None:
            _pack(v, payload, f)
    for name in ("_ell", "_ell_t"):
        ell = getattr(st, name)
        if ell is None:
            continue
        payload[f"{name}.meta"] = np.asarray(
            [len(ell.caps), ell.E, ell.M, ell.n_zero] + list(ell.caps),
            np.int64,
        )
        payload[f"{name}.inv_perm"] = np.asarray(ell.inv_perm)
        payload[f"{name}.edge_slot"] = np.asarray(ell.edge_slot)
        for b in range(len(ell.caps)):
            payload[f"{name}.eids{b}"] = np.asarray(ell.eids[b])
            payload[f"{name}.idxs{b}"] = np.asarray(ell.idxs[b])
            payload[f"{name}.rows{b}"] = np.asarray(ell.rows[b])
    np.savez(path, **payload)


def load_npz(path: str):
    from ..ops.kernels.ell import EllFormat
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
        key = f"{name}.meta"
        if key not in data:
            continue
        meta = data[key]
        n_caps, E, M_ell, n_zero = (int(x) for x in meta[:4])
        caps = tuple(int(x) for x in meta[4:4 + n_caps])
        ell = EllFormat(
            [jnp.asarray(data[f"{name}.eids{b}"]) for b in range(n_caps)],
            [jnp.asarray(data[f"{name}.idxs{b}"]) for b in range(n_caps)],
            [jnp.asarray(data[f"{name}.rows{b}"]) for b in range(n_caps)],
            jnp.asarray(data[f"{name}.inv_perm"]),
            jnp.asarray(data[f"{name}.edge_slot"]),
            caps, E, M_ell, n_zero,
        )
        setattr(storage, name, ell)
    return SparseTensor.from_storage(storage)
