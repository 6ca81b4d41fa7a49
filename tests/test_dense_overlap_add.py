"""Dense phase-sum overlap-add (VERDICT r3 item 3) must equal the
per-window loop path: same grid, same background semantics, same count map
— only the f32 addend order differs."""

import dataclasses

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.engine.sliding_window import (
    SlidingWindowConfig,
    _dense_plan_for,
    _dim_starts,
    infer_volume,
    scan_interval,
)
from delivr_cfos_tpu.models import BasicUNetConfig, init_params

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(2), MODEL_CFG)


def _volume(shape, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.uint16)
    vol[:, : shape[1] // 2] = (
        rng.random((shape[0], shape[1] // 2, shape[2])) * 900
    ).astype(np.uint16)
    return vol


def test_dense_plan_structure():
    # z=70, roi=16, stride=8: starts 0..48 step 8 plus clamp 54 (irregular)
    plan = _dense_plan_for((70, 32, 32), (16, 16, 16), (8, 8, 8))
    assert plan is not None and plan.p == (2, 2, 2)
    zs = _dim_starts(70, 16, 8)
    assert zs[-1] == 54  # clamped
    n_all = (len(zs), 3, 3)
    # regular windows = 7 z-starts × full y × x grids
    assert plan.regular_mask.reshape(n_all)[:7].all()
    assert not plan.regular_mask.reshape(n_all)[7].any()
    n_regular = int(plan.regular_mask.sum())
    assert n_regular == 7 * 3 * 3
    # phases partition the regular set exactly
    slots = np.concatenate([ph[2] for ph in plan.phases])
    assert len(slots) == n_regular
    assert len(np.unique(slots)) == n_regular
    assert plan.regular_mask[slots].all()
    # each phase's tiling fits inside the volume
    for origin, M, _ in plan.phases:
        for d, img in enumerate((70, 32, 32)):
            assert origin[d] + M[d] * 16 <= img


def test_dense_plan_inapplicable_stride():
    # overlap 0.4 → stride 9; 16 % 9 != 0 → decomposition does not apply
    interval = scan_interval((64, 32, 32), ROI, 0.4)
    assert _dense_plan_for((64, 32, 32), ROI, interval) is None


@pytest.mark.parametrize(
    "shape", [(64, 32, 32), (70, 32, 32), (16, 16, 16), (61, 37, 29)]
)
def test_dense_matches_loop(params, shape):
    vol = _volume(shape, seed=shape[0])
    base = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    dense, bin_d = infer_volume(params, vol, base, MODEL_CFG)
    loop, bin_l = infer_volume(
        params,
        vol,
        dataclasses.replace(base, dense_overlap_add=False),
        MODEL_CFG,
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(loop), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(bin_d), np.asarray(bin_l))


@pytest.mark.slow  # 13-pass TTA, dense + loop accumulate (~60 s)
def test_dense_matches_loop_tta_flips(params):
    vol = _volume((48, 32, 32), seed=3)
    base = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=True, tta_noise_std=0.0
    )
    dense, _ = infer_volume(params, vol, base, MODEL_CFG, return_binary=False)
    loop, _ = infer_volume(
        params,
        vol,
        dataclasses.replace(base, dense_overlap_add=False),
        MODEL_CFG,
        return_binary=False,
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(loop), rtol=1e-4, atol=1e-5
    )


def test_dense_matches_loop_gaussian(params):
    """Gaussian blending through the dense path: the importance-weighted
    accumulate AND the closed-form weighted count map must agree with the
    loop path (a count-map mismatch cannot hide here — the weights do not
    cancel in acc/cnt)."""
    vol = _volume((70, 32, 32), seed=5)
    base = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=False, importance="gaussian"
    )
    dense, _ = infer_volume(params, vol, base, MODEL_CFG, return_binary=False)
    loop, _ = infer_volume(
        params,
        vol,
        dataclasses.replace(base, dense_overlap_add=False),
        MODEL_CFG,
        return_binary=False,
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(loop), rtol=1e-4, atol=1e-5
    )


def test_dense_all_background(params):
    """background_threshold above every voxel: the bg dense add + closed
    count map must reproduce the reference's constant −1000 field."""
    vol = _volume((48, 32, 32), seed=7)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=False,
        background_threshold=70000,
    )
    mean, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    np.testing.assert_allclose(np.asarray(mean), -1000.0, rtol=1e-6)
