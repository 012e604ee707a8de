"""Test harness setup: force the CPU backend with 8 virtual devices so the
sharding tests exercise a real multi-device mesh without TPU hardware
(SURVEY.md §4: multi-host tests without a pod).

Note: this environment's sitecustomize programmatically pins the platform to
the TPU tunnel, so the env var alone is not enough — ``jax.config.update``
after import is required. A persistent compilation cache keeps repeat suite
runs fast (XLA:CPU compiles of the deep unrolled trace are expensive)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
