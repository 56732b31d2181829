"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
compile and run without TPU hardware (SURVEY.md §2 parallelism checklist)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA executable cache: most of the suite's wall time is
# recompiling identical programs every run (VERDICT r4 weak #5 measured the
# fast profile at 24:44, nearly all of it compiles). NOTE: set via
# jax.config.update, not env vars — the JAX_COMPILATION_CACHE_DIR env var is
# not reliably picked up when a platform plugin initializes the backend
# first (measured: env-var path wrote 0 cache entries, config path works).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
