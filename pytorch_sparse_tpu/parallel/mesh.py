"""Mesh construction helpers.

One logical axis (``"x"``) row-partitions the graph; on real hardware lay it
out so neighboring row blocks sit on ICI neighbors (METIS emits contiguous
clusters, so ring ppermute steps ride ICI links, not DCN).

A second optional axis (``"f"``, :func:`make_mesh2d`) shards the dense
operand's feature dimension: a ``(P_data, P_feat)`` mesh keeps the sparse
tables replicated across ``"f"`` while each feature group runs the row
schedule on its own K-slice.  Every collective (halo all_to_all, ring
ppermute, all_gather) then moves ``1/P_feat`` of the bytes per chip — the
lever for large-K workloads and papers100M-scale halos where a 1-D row
mesh is wire-bound (BASELINE.md weak-scaling table).  Lay ``"f"`` along
the mesh dimension with the fastest links when the halo traffic is the
bottleneck, since the row-axis collectives are the only traffic.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

data_axis = "x"
feat_axis = "f"


def _take_devices(n: int):
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"Requested {n} devices but only {len(devices)} "
            f"available (set --xla_force_host_platform_device_count)."
        )
    return devices[:n]


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = data_axis
) -> Mesh:
    devices = (
        _take_devices(n_devices) if n_devices is not None else jax.devices()
    )
    return Mesh(np.array(devices), (axis_name,))


def make_mesh2d(
    n_data: int,
    n_feat: int,
    data_name: str = data_axis,
    feat_name: str = feat_axis,
) -> Mesh:
    """2-D mesh: ``n_data`` row shards x ``n_feat`` feature shards."""
    devices = _take_devices(n_data * n_feat)
    return Mesh(
        np.array(devices).reshape(n_data, n_feat), (data_name, feat_name)
    )
