"""Multi-chip sharded inference on the 8-device virtual CPU mesh: must equal
the single-device engine exactly (same grid, same skip semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.models import BasicUNetConfig, init_params
from delivr_cfos_tpu.parallel import make_mesh, sharded_infer_volume

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(3), MODEL_CFG)


def _volume(shape=(64, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.uint16)
    vol[:, : shape[1] // 2] = (rng.random((shape[0], shape[1] // 2, shape[2])) * 900).astype(
        np.uint16
    )
    return vol


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_sharded_matches_single_device(params, n_sp):
    if len(jax.devices()) < n_sp:
        pytest.skip("not enough devices")
    vol = _volume()
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    mesh = make_mesh({"sp": n_sp})
    sharded = np.asarray(
        sharded_infer_volume(mesh, params, vol, cfg, MODEL_CFG)
    )
    single, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-4, atol=1e-4)


def test_sharded_tta_flips(params):
    vol = _volume(seed=1)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=True, tta_noise_std=0.0
    )
    mesh = make_mesh({"sp": 4})
    sharded = np.asarray(sharded_infer_volume(mesh, params, vol, cfg, MODEL_CFG))
    single, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-4, atol=1e-4)
