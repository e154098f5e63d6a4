"""Tracing/profiling hooks (SURVEY.md §5: the reference has only
wall-clock benchmark scripts; the TPU equivalent is ``jax.profiler``
traces plus synchronized timing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in XProf/TensorBoard.

    Degrades to a no-op (with a note) when the backend cannot profile
    (e.g. a tunneled remote device).
    """
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception as e:  # pragma: no cover - backend dependent
        import warnings

        warnings.warn(f"jax.profiler unavailable on this backend: {e}")
        yield


def annotate(name: str):
    """Named region for profiler timelines: ``with annotate("spmm"): ...``"""
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Synchronized wall-clock timing: returns (seconds_per_call, result).

    Blocks on the result pytree each call.  On tunneled remote devices
    prefer the slope method in ``benchmarks/timing.py`` (its README
    explains why ``block_until_ready`` can lie there).
    """
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result
