"""Test environment: force the virtual 8-device CPU platform.

Gotcha: this machine's sitecustomize imports jax at interpreter startup (the
axon TPU plugin), so setting JAX_PLATFORMS via os.environ here is too late —
jax.config already read the env. Use jax.config.update instead (valid until
the first backend is initialized). XLA_FLAGS is still read at backend
creation, so the host-device-count flag can be appended here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
