"""Test configuration: force an 8-device virtual CPU mesh.

The reference's multi-GPU tests need real GPUs (SURVEY.md §4.3); our TPU-first
design tests all sharding logic on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` — no hardware required.

NOTE: something in this image pins ``jax_platforms`` to "axon,cpu"; we override
via jax.config (env vars alone are ignored).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU jit compiles dominate suite wall time
# (~26 min cold); warm runs reuse cached executables across processes.
_cache_dir = os.environ.get(
    "TLLM_TEST_JIT_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
