"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all tests (incl. sharding
tests) run on 8 virtual CPU devices (SURVEY.md §4). Note: env vars are NOT
sufficient here — a sitecustomize module registers a remote TPU PJRT plugin
at interpreter startup and pins JAX_PLATFORMS, so we must override through
jax.config before the backend initializes. Running tests against the remote
chip would be ~100x slower (per-dispatch network roundtrips).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache for the CPU test backend: the fast gate is
# dominated by jit compiles of the model-forward/train programs, which are
# identical run-to-run on this box. Keyed by HLO hash (safe across edits —
# a changed program misses). Separate directory from the TPU cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# NOTE (measured r4): expectations for this cache should be low. It only
# skips the XLA *backend* compile — Python tracing + MLIR lowering (the
# bulk of jit wall time for mid-size programs on this 1-core box) runs
# every time — and the CPU AOT entries are often rejected at load time
# with a machine-feature mismatch (XLA adds pseudo-features like
# +prefer-no-scatter at compile). Lowering the threshold to 1.0s was
# measured SLOWER (more write attempts + failed loads). Fast-gate wall
# time is trace/execute-bound: ~16-18 min warm vs ~20+ cold.
