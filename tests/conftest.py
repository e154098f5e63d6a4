"""Test environment: force CPU with a virtual 8-device mesh so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4:
the "fake backend" the reference never needed).

The container's sitecustomize registers the remote-TPU ("axon") PJRT
plugin at interpreter startup and pins ``JAX_PLATFORMS=axon`` in the env.
Plugin *registration* is harmless — backend selection is lazy — so we
override platform choice in-process with ``jax.config`` before any
backend initializes.  (Do NOT ``os.execv`` here: pytest's fd-level
capture has already redirected fd 1 to a temp file by conftest time, so
a re-exec'd process writes the whole session report into a deleted file
and the runner sees no output at all.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
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

# In-process platform override (sitecustomize may have locked the config
# default to "axon" when it imported jax; update() wins as long as no
# backend has been created yet).
jax.config.update("jax_platforms", "cpu")

# This XLA build runs f32 dots at bf16 precision by DEFAULT (measured
# ~1e-2 abs error on a 10x8 matmul); pin full precision so dense oracles
# are trustworthy.
jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles are slow on this host; a persistent compile cache makes
# repeat test runs fast.
jax.config.update(
    "jax_compilation_cache_dir",
    "/root/.cache/jax_cache_" + os.environ.get("JAX_PLATFORMS", "axon"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# Note: leave jax_persistent_cache_enable_xla_caches at its default — the
# "all" setting stores XLA:CPU AOT kernels whose machine-feature stamps can
# mismatch across the heterogeneous compile hosts here (SIGILL risk).
