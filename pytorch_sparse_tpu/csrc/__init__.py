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

# Bump together with native.cpp's sparse_tpu_native_abi_version when the
# C ABI changes (the analogue of the reference's CUDA-version handshake,
# torch_sparse/__init__.py:23-37 + csrc/version.cpp).
ABI_VERSION = 6

_so_path = os.path.join(os.path.dirname(__file__), "libsparse_tpu_native.so")
if os.path.exists(_so_path):
    try:
        lib = ctypes.CDLL(_so_path)
        lib.sparse_tpu_native_abi_version.restype = ctypes.c_int64
        if lib.sparse_tpu_native_abi_version() != ABI_VERSION:
            import warnings

            warnings.warn(
                "libsparse_tpu_native.so was built for a different ABI "
                f"version (have {lib.sparse_tpu_native_abi_version()}, "
                f"need {ABI_VERSION}); falling back to numpy samplers. "
                "Rebuild with pytorch_sparse_tpu/csrc/build.sh."
            )
            lib = None
    except (OSError, AttributeError):  # pragma: no cover
        lib = None
