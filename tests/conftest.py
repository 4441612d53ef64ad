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

# The env var alone is not enough when a TPU plugin's sitecustomize has
# already imported jax at interpreter start: the jax_platforms config is
# then frozen from the ORIGINAL environment (e.g. "tpu,cpu"), and
# jax_platform_name only changes the default, so backends() still
# INITIALIZES the TPU client — grabbing a single-client device and
# failing the whole session if another process holds it. Updating the
# jax_platforms config value is the authoritative override: backends()
# then registers cpu only.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

# Guard against regressions: cpu must be the ONLY initialized backend —
# if a TPU plugin client ever appears here, the suite is again holding
# the single-client device for its whole run.
from jax._src import xla_bridge as _xb  # noqa: E402

assert list(_xb.backends().keys()) == ["cpu"], list(_xb.backends())
