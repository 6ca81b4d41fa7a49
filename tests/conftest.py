"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip sharding
paths (shard_map/pjit over a Mesh) are exercised without TPU hardware.

``DELIVR_TEST_PLATFORM=tpu`` keeps the real backend instead, so the
TPU-gated acceptance tests (test_pallas_kernels compiled-kernel cases,
test_mosaic_phantom) can be driven on the chip:
    DELIVR_TEST_PLATFORM=tpu python -m pytest tests/test_mosaic_phantom.py

NB: in this image the TPU PJRT plugin overrides the JAX_PLATFORMS env var, so
the env var alone does NOT select CPU — ``jax.config.update`` does.
"""

import os

if os.environ.get("DELIVR_TEST_PLATFORM") != "tpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
