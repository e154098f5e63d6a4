"""Device timing that survives the axon tunnel.

``block_until_ready`` does not actually block through the remote-TPU tunnel
(measured: a "0.76 ms" 8k bf16 matmul => 1450 TFLOP/s on a 197-TFLOP/s
chip), and a host roundtrip costs ~26 ms.  So: run the op ``n`` times inside
a single jitted ``lax.fori_loop``, force one scalar fetch, and take the
slope between two values of ``n`` — latency and constant overheads cancel.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def enable_compile_cache() -> None:
    """Persistent XLA compile cache: first compiles through the remote
    tunnel take minutes at large graph sizes; repeats become instant."""
    jax.config.update(
        "jax_compilation_cache_dir",
        "/root/.cache/jax_cache_" + os.environ.get("JAX_PLATFORMS", "axon"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


enable_compile_cache()


def device_time(
    step: Callable,
    init_carry,
    *args,
    n_lo: int = 4,
    n_hi: int = 24,
    repeats: int = 3,
) -> float:
    """Seconds per invocation of ``step(carry, *args) -> carry``.

    ``step`` must be shape-preserving in its carry so it can be chained.
    Pass large operands (sparse tensors, tables) via ``*args`` rather
    than closing over them: closure arrays are embedded as HLO
    constants, which bloats the compile payload (the remote-compile
    tunnel rejects >~100 MB bodies with HTTP 413) and degrades compile
    quality.
    """

    @partial(jax.jit, static_argnames=("n",))
    def chained(carry, n, *args):
        carry = jax.lax.fori_loop(
            0, n, lambda i, c: step(c, *args), carry
        )
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32), carry, 0.0
        )

    def run(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(init_carry, n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    # warm up compiles for both sizes
    float(chained(init_carry, n_lo, *args))
    float(chained(init_carry, n_hi, *args))
    t_lo, t_hi = run(n_lo), run(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
