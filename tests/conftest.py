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
