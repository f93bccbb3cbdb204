"""Test configuration: force an 8-device virtual CPU platform so sharding /
mesh tests run without TPU hardware, and enable x64 before JAX initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin prepends itself to jax_platforms regardless of the
# JAX_PLATFORMS env var; an explicit config update is the reliable override.
jax.config.update("jax_platforms", "cpu")
