"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §4).
Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
