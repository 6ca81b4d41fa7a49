import numpy as np
import pytest

import jax

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.engine.streaming import infer_volume_streaming
from delivr_cfos_tpu.models import BasicUNetConfig, init_params

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(5), MODEL_CFG)


@pytest.mark.parametrize("slab_z_starts", [1, 2, 3])
def test_streaming_logits_match_whole_volume(params, slab_z_starts):
    rng = np.random.default_rng(0)
    vol = np.zeros((72, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((72, 16, 32)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    mean_whole, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    _, logits_stream = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=slab_z_starts,
        logits_out=np.empty(vol.shape, np.float32),
    )
    np.testing.assert_allclose(
        logits_stream, np.asarray(mean_whole), rtol=1e-4, atol=1e-4
    )


def test_streaming_binaries_match_on_fully_foreground_volume(params):
    """All-positive input → mask is all ones → erosion-block semantics can't
    differ → binaries must match the whole-volume engine exactly."""
    rng = np.random.default_rng(1)
    vol = (rng.random((48, 32, 32)) * 800 + 1).astype(np.uint16)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    mean_whole, bin_whole = infer_volume(params, vol, cfg, MODEL_CFG)
    bin_stream, _ = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2
    )
    np.testing.assert_array_equal(bin_stream, np.asarray(bin_whole))


def test_streaming_from_memmap(params, tmp_path):
    """Volume as a disk memmap: the streaming engine must never require the
    array in RAM."""
    rng = np.random.default_rng(2)
    p = str(tmp_path / "vol.npy")
    vol = np.lib.format.open_memmap(p, mode="w+", dtype=np.uint16, shape=(48, 32, 32))
    vol[:, :16] = (rng.random((48, 16, 32)) * 700).astype(np.uint16)
    vol.flush()
    ro = np.load(p, mmap_mode="r")
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    out_bin = np.lib.format.open_memmap(
        str(tmp_path / "bin.npy"), mode="w+", dtype=np.uint8, shape=ro.shape
    )
    out_log = np.lib.format.open_memmap(
        str(tmp_path / "log.npy"), mode="w+", dtype=np.float32, shape=ro.shape
    )
    infer_volume_streaming(
        params, ro, cfg, MODEL_CFG, slab_z_starts=2, binary_out=out_bin, logits_out=out_log
    )
    mean_whole, _ = infer_volume(
        params, np.asarray(ro), cfg, MODEL_CFG, return_binary=False
    )
    np.testing.assert_allclose(
        np.asarray(out_log), np.asarray(mean_whole), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow  # 13-pass TTA through the streaming engine (~40 s)
def test_streaming_tta(params):
    rng = np.random.default_rng(3)
    vol = np.zeros((48, 32, 32), np.uint16)
    vol[:, 16:] = (rng.random((48, 16, 32)) * 600).astype(np.uint16)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=True, tta_noise_std=0.0
    )
    mean_whole, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    _, logits_stream = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2,
        logits_out=np.empty(vol.shape, np.float32),
    )
    np.testing.assert_allclose(
        logits_stream, np.asarray(mean_whole), rtol=1e-4, atol=1e-4
    )
