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


# Pallas SpMM kernels were measured and removed in round 3 (BASELINE.md:
# the one-hot MXU sorted-segment reduce alone costs as much as the whole
# scatter-free ELL SpMM, and Pallas cannot gather from HBM on this
# toolchain) — the compute path is pure XLA + MXU block matmuls.
WITH_PALLAS = False
