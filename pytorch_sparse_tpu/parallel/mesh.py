"""Mesh construction helpers.

One logical axis (``"x"``) row-partitions the graph; on real hardware lay it
out so neighboring row blocks sit on ICI neighbors (METIS emits contiguous
clusters, so ring ppermute steps ride ICI links, not DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

data_axis = "x"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = data_axis
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} "
                f"available (set --xla_force_host_platform_device_count)."
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
