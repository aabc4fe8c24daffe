"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all tests (incl. sharding
tests) run on 8 virtual CPU devices (SURVEY.md §4). Note: env vars are NOT
sufficient here — a sitecustomize module registers a remote TPU PJRT plugin
at interpreter startup and pins JAX_PLATFORMS, so we must override through
jax.config before the backend initializes. Running tests against the remote
chip would be ~100x slower (per-dispatch network roundtrips).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
