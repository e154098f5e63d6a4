"""Test environment: force CPU with a virtual 8-device mesh so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4:
the "fake backend" the reference never needed)."""

import os

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

# XLA CPU compiles are ~0.5-1 s each on this host; a persistent compile
# cache makes repeat test runs fast.
import jax  # noqa: E402

# This XLA build runs f32 dots at bf16 precision by DEFAULT (measured
# ~1e-2 abs error on a 10x8 matmul); pin full precision so dense oracles
# are trustworthy.
jax.config.update("jax_default_matmul_precision", "highest")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
