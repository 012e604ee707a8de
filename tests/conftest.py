"""Test harness setup: force the CPU backend with 8 virtual devices so the
sharding tests exercise a real multi-device mesh without TPU hardware
(SURVEY.md §4: multi-host tests without a pod)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
