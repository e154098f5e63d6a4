"""Native (C++) acceleration library loader.

The reference implements its samplers, partitioner and conversion kernels in
C++ (``csrc/``); here the hot device math is Pallas/XLA, and the host-side
irregular algorithms (graph sampling, partitioning) have a C++ implementation
(``libsparse_tpu_native.so``, built from ``native.cpp`` by ``build.sh`` /
``setup.py``) loaded via ctypes, with pure-numpy fallbacks when the shared
object has not been built.
"""

from __future__ import annotations

import ctypes
import os

lib = None

_so_path = os.path.join(os.path.dirname(__file__), "libsparse_tpu_native.so")
if os.path.exists(_so_path):
    try:
        lib = ctypes.CDLL(_so_path)
    except OSError:  # pragma: no cover
        lib = None
