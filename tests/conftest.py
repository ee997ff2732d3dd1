"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective tests then exercise real multi-device code paths without
TPU hardware (SURVEY §4 implication (c)).

Note: the session's sitecustomize imports jax (registering a TPU platform)
before pytest starts, so env-var-based platform selection is too late here —
we must go through ``jax.config.update``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
