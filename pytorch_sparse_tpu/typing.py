"""Optional-dependency feature flags (reference ``torch_sparse/typing.py``).

The reference gates on ``pyg_lib`` availability; our analogous optional
accelerators are the compiled C++ sampling/partition library and Pallas
(TPU-only) kernels.
"""

from __future__ import annotations

import jax

try:
    from .csrc import lib as _native_lib  # noqa

    WITH_NATIVE_LIB = _native_lib is not None
except Exception:  # pragma: no cover
    WITH_NATIVE_LIB = False


def tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


WITH_PALLAS = True  # Pallas kernels run in interpret mode on CPU for tests.
