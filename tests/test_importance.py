"""Gaussian importance-map blending (VERDICT r3 item 7 / BASELINE config 2).

The reference's fork hardcodes a uniform map (sliding_window_inferer.py:148)
although its call site requests gaussian (inference.py:212); the engine's
default reproduces that quirk, and ``SlidingWindowConfig.importance =
"gaussian"`` provides the requested blending with MONAI's
``compute_importance_map`` formula.
"""

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.engine.sliding_window import (
    SlidingWindowConfig,
    gaussian_importance_map,
    infer_volume,
)
from delivr_cfos_tpu.models import BasicUNetConfig, init_params

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(11), MODEL_CFG)


def test_gaussian_map_matches_scipy_golden():
    """MONAI computes the map by blurring a center impulse with a truncated
    Gaussian (sigma = 0.125·roi, truncate radius int(4σ+0.5)), normalizing
    to peak 1, and clamping the floor to the smallest positive value.
    scipy.ndimage.gaussian_filter with truncate=4.0 implements the identical
    truncated sampled-Gaussian convolution — use it as the independent
    oracle. The floor is MONAI's max(min positive, 1e-3) clamp."""
    from scipy.ndimage import gaussian_filter

    for roi in [(16, 16, 16), (96, 96, 64), (12, 20, 8)]:
        sigma = [0.125 * n for n in roi]
        delta = np.zeros(roi)
        delta[roi[0] // 2, roi[1] // 2, roi[2] // 2] = 1.0
        ref = gaussian_filter(delta, sigma=sigma, truncate=4.0, mode="constant")
        ref = ref / ref.max()
        ref = np.clip(ref, max(float(ref[ref > 0].min()), 1e-3), None)
        got = gaussian_importance_map(roi)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_gaussian_map_properties():
    m = gaussian_importance_map((96, 96, 64))
    assert m.shape == (96, 96, 64)
    assert m.max() == 1.0
    assert m[48, 48, 32] == 1.0  # peak at roi//2
    assert (m > 0).all()  # floor-clamped: count map can never be zero
    # symmetric around the center for even dims up to the off-by-one of //2
    assert np.allclose(m[1:, 1:, 1:], m[1:, 1:, 1:][::-1, ::-1, ::-1])


def test_single_window_gaussian_equals_constant(params):
    """A volume of exactly one window: the weight cancels in acc/cnt, so
    gaussian blending must reproduce the constant-mode logits."""
    rng = np.random.default_rng(0)
    vol = (rng.random(ROI) * 900).astype(np.uint16)
    base = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=2, tta=False)
    import dataclasses

    mean_c, _ = infer_volume(params, vol, base, MODEL_CFG, return_binary=False)
    mean_g, _ = infer_volume(
        params,
        vol,
        dataclasses.replace(base, importance="gaussian"),
        MODEL_CFG,
        return_binary=False,
    )
    np.testing.assert_allclose(
        np.asarray(mean_g), np.asarray(mean_c), rtol=1e-5, atol=1e-5
    )


def test_gaussian_blending_single_coverage_voxels_unchanged(params):
    """Voxels covered by exactly one window (the grid corners at 0.5
    overlap) have weight-independent means; overlap regions must differ
    between the modes (that's the blending). Background-skip windows are in
    the mix (the zero octant) to cover the weighted skip accumulate."""
    rng = np.random.default_rng(1)
    vol = np.zeros((24, 24, 24), np.uint16)
    vol[:16, :, :] = (rng.random((16, 24, 24)) * 900).astype(np.uint16)
    base = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=2, tta=False)
    import dataclasses

    mean_c, bin_c = infer_volume(params, vol, base, MODEL_CFG)
    mean_g, bin_g = infer_volume(
        params, vol, dataclasses.replace(base, importance="gaussian"), MODEL_CFG
    )
    mean_c, mean_g = np.asarray(mean_c), np.asarray(mean_g)
    # single-coverage corner: starts {0, 8} per dim, so [0:8)³ sees only
    # window (0,0,0)
    np.testing.assert_allclose(
        mean_g[:8, :8, :8], mean_c[:8, :8, :8], rtol=1e-5, atol=1e-5
    )
    # overlap strip: weighted vs uniform averaging must differ somewhere
    assert np.abs(mean_g[8:16] - mean_c[8:16]).max() > 0
    assert bin_g.shape == bin_c.shape


def test_gaussian_streaming_matches_whole_volume(params):
    from delivr_cfos_tpu.engine.streaming import infer_volume_streaming

    rng = np.random.default_rng(2)
    vol = np.zeros((48, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((48, 16, 32)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=False, importance="gaussian"
    )
    mean_w, bin_w = infer_volume(params, vol, cfg, MODEL_CFG)
    log_s = np.empty(vol.shape, np.float32)
    bin_s = np.empty(vol.shape, np.uint8)
    infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2,
        binary_out=bin_s, logits_out=log_s,
    )
    np.testing.assert_allclose(log_s, np.asarray(mean_w), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(bin_s, np.asarray(bin_w))


def test_gaussian_sharded_matches_single_device(params):
    from delivr_cfos_tpu.parallel import make_mesh, sharded_infer_volume

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(3)
    vol = np.zeros((64, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((64, 16, 32)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=False, importance="gaussian"
    )
    mesh = make_mesh({"sp": 4})
    sharded = np.asarray(sharded_infer_volume(mesh, params, vol, cfg, MODEL_CFG))
    single, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-4, atol=1e-4)
