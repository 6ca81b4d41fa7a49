"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip sharding
paths (shard_map/pjit over a Mesh) are exercised without TPU hardware.

NB: in this image the TPU PJRT plugin overrides the JAX_PLATFORMS env var, so
the env var alone does NOT select CPU — ``jax.config.update`` does.
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
