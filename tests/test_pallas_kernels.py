import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.models.basic_unet import _instance_norm, _mish
from delivr_cfos_tpu.ops.pallas.fused_norm_mish import instance_norm_mish_pallas


@pytest.mark.parametrize("shape", [(1, 8, 8, 8, 16), (2, 4, 8, 16, 32)])
def test_fused_norm_mish_matches_reference(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, shape), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, shape[-1]), jnp.float32)
    ref = _mish(_instance_norm(x, scale, bias))
    out = instance_norm_mish_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_norm_mish_odd_spatial():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 5, 7, 8)), jnp.float32)
    scale = jnp.ones(8, jnp.float32)
    bias = jnp.zeros(8, jnp.float32)
    ref = _mish(_instance_norm(x, scale, bias))
    out = instance_norm_mish_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
