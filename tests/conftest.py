"""Test environment: force CPU with a virtual 8-device mesh so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4:
the "fake backend" the reference never needed).

The container's sitecustomize registers the remote-TPU ("axon") PJRT
plugin at interpreter startup and pins ``JAX_PLATFORMS=axon``, which a
conftest cannot undo after the fact — so if we detect it, we re-exec the
test process with a cleaned environment (the sitecustomize skips
registration when ``PALLAS_AXON_POOL_IPS`` is empty).
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Re-run through `-m pytest` so CWD stays importable (running
    # pytest/__main__.py as a script would drop it from sys.path).
    os.execv(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:]
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import warnings  # noqa: E402

warnings.filterwarnings(
    "ignore", message=".*layout.*argument unset.*"
)

import jax  # noqa: E402

# This XLA build runs f32 dots at bf16 precision by DEFAULT (measured
# ~1e-2 abs error on a 10x8 matmul); pin full precision so dense oracles
# are trustworthy.
jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles are slow on this host; a persistent compile cache makes
# repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache_" + os.environ.get("JAX_PLATFORMS", "axon"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# Note: leave jax_persistent_cache_enable_xla_caches at its default — the
# "all" setting stores XLA:CPU AOT kernels whose machine-feature stamps can
# mismatch across the heterogeneous compile hosts here (SIGILL risk).
