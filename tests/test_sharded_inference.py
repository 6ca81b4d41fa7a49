"""Multi-chip sharded inference on the 8-device virtual CPU mesh: must equal
the single-device engine exactly (same grid, same skip semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.models import BasicUNetConfig, init_params
from delivr_cfos_tpu.parallel import make_mesh, sharded_infer_volume

pytestmark = pytest.mark.slow  # 8-device shard_map compiles dominate (>570 s on one core)

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


@pytest.mark.parametrize(
    "z,n_sp",
    [
        (70, 4),  # clamped final z start, padded slabs
        (61, 4),  # awkward odd extent
        (50, 8),  # shallow volume on a wide mesh
        (70, 2),
    ],
)
def test_sharded_matches_single_device_arbitrary_z(params, z, n_sp):
    """VERDICT r1 item 6: no Z divisibility requirements — the sharded
    result must match the single-device engine on the reference's exact
    (clamped) window grid for any Z."""
    if len(jax.devices()) < n_sp:
        pytest.skip("not enough devices")
    vol = _volume(shape=(z, 32, 32), seed=z)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    mesh = make_mesh({"sp": n_sp})
    sharded = np.asarray(sharded_infer_volume(mesh, params, vol, cfg, MODEL_CFG))
    single, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    assert sharded.shape == vol.shape
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-4, atol=1e-4)


def test_plan_sharding_halo_and_assignment():
    from delivr_cfos_tpu.parallel import plan_sharding

    # z=70, roi=16, stride=8, 4 shards → pad to 96, zloc=24
    z_pad, zloc, halo, shard_starts = plan_sharding(70, 16, 8, 4)
    assert z_pad == 96 and zloc == 24
    # global starts: 0..48 step 8 + clamp 54; shard of 54 = 2 (54//24)
    flat = [k * zloc + s for k, ss in enumerate(shard_starts) for s in ss]
    assert sorted(flat) == [0, 8, 16, 24, 32, 40, 48, 54]
    # clamp 54 lands in shard 2 with local 6: overhang 6+16-24 = -2 ≤ halo
    assert halo >= 16 - 8


def test_sharded_streaming_matches_single_device_streaming(params):
    """Mesh-sharded slab pipeline (engine/streaming.py mesh=) must equal the
    single-device streaming engine — the >HBM multi-chip path."""
    from delivr_cfos_tpu.engine.streaming import infer_volume_streaming

    vol = _volume(shape=(70, 32, 32), seed=9)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    mesh = make_mesh({"sp": 4})

    log_single = np.empty(vol.shape, np.float32)
    bin_single = np.empty(vol.shape, np.uint8)
    infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2,
        binary_out=bin_single, logits_out=log_single,
    )
    log_mesh = np.empty(vol.shape, np.float32)
    bin_mesh = np.empty(vol.shape, np.uint8)
    infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2,
        binary_out=bin_mesh, logits_out=log_mesh, mesh=mesh,
    )
    np.testing.assert_allclose(log_mesh, log_single, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(bin_mesh, bin_single)


@pytest.mark.parametrize("shard_axis", [1, 2])
def test_sharded_along_y_and_x(params, shard_axis):
    """shard_axis rotates the partition onto y or x (for volumes thin in z)
    while windows are un-rotated around the UNet — must equal the
    single-device engine exactly."""
    from delivr_cfos_tpu.parallel.sharded_inference import sharded_infer_volume

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(21)
    vol = np.zeros((24, 70, 40), np.uint16)
    vol[:, :40, :20] = (rng.random((24, 40, 20)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    mesh = make_mesh({"sp": 4})
    sharded = np.asarray(
        sharded_infer_volume(
            mesh, params, vol, cfg, MODEL_CFG, shard_axis=shard_axis
        )
    )
    single, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    assert sharded.shape == vol.shape
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-4, atol=1e-4)


def test_sharded_tta_noise_shards_draw_independent_streams(params):
    """The replicated TTA key is folded with ``axis_index`` per shard, so
    shards draw INDEPENDENT noise. Probe: a z-periodic volume where each of
    two shards owns one identical window (overlap 0 → no halos, no spill);
    with a replicated stream both halves would come out bit-identical, with
    per-shard fold_in they must differ — while the noise-free run stays
    exactly symmetric."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(7)
    half = (rng.random((16, 16, 16)) * 900).astype(np.uint16)
    vol = np.concatenate([half, half], axis=0)  # (32, 16, 16), periodic in z
    mesh = make_mesh({"sp": 2})

    cfg0 = SlidingWindowConfig(
        roi=ROI, overlap=0.0, batch_size=2, tta=True, tta_noise_std=0.0
    )
    clean = np.asarray(sharded_infer_volume(mesh, params, vol, cfg0, MODEL_CFG))
    np.testing.assert_array_equal(clean[:16], clean[16:])

    cfg1 = SlidingWindowConfig(
        roi=ROI, overlap=0.0, batch_size=2, tta=True, tta_noise_std=0.5
    )
    noisy = np.asarray(sharded_infer_volume(mesh, params, vol, cfg1, MODEL_CFG))
    assert np.abs(noisy[:16] - noisy[16:]).max() > 0


def test_sharded_tta_noise_statistical_bound(params):
    """With noise on, the sharded engine draws a DIFFERENT stream than the
    single-chip engine (documented: per-shard fold_in). The results must
    still agree to a noise-scale statistical bound, and the sharded run must
    be deterministic for a fixed seed."""
    vol = _volume(shape=(32, 32, 32), seed=4)
    mesh = make_mesh({"sp": 4})
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=True, tta_noise_std=1e-3
    )
    noisy = np.asarray(sharded_infer_volume(mesh, params, vol, cfg, MODEL_CFG))
    noisy2 = np.asarray(sharded_infer_volume(mesh, params, vol, cfg, MODEL_CFG))
    np.testing.assert_array_equal(noisy, noisy2)  # fixed seed → reproducible
    import dataclasses

    clean = np.asarray(
        sharded_infer_volume(
            mesh, params, vol, dataclasses.replace(cfg, tta_noise_std=0.0),
            MODEL_CFG,
        )
    )
    # 1e-3 input noise through the (Lipschitz-bounded) tiny UNet: allow a
    # generous 50× amplification on mean logits
    assert np.abs(noisy - clean).max() < 0.05
