"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip sharding
paths (shard_map/pjit over a Mesh) are exercised without TPU hardware."""

import os

# Force CPU even if the host env pins JAX_PLATFORMS to a TPU platform: tests
# need deterministic f32 numerics and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
