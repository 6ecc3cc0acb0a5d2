"""Test environment: force an 8-device virtual CPU platform so sharding tests
run without TPU hardware, per the driver contract."""

import os

# Force-override: the session env pins JAX_PLATFORMS=axon (the TPU tunnel);
# tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
