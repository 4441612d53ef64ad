"""Test config: force CPU with 8 virtual devices BEFORE jax initializes.

This is the JAX-native "fake backend" the reference lacks (SURVEY.md §4):
multi-device sharding tests run on any host via
--xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# JAX_PLATFORMS alone does not demote plugin backends (the axon TPU plugin
# registers regardless); jax_platform_name reliably makes CPU the default.
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
