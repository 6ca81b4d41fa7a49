"""Stage-2 with blob_detection.spatial_shards: the full pipeline stage
running z-sharded across the (virtual) mesh must produce binaries
bit-identical to the single-chip stage (BASELINE config 5)."""

import os

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.models import BasicUNetConfig, init_params

pytestmark = pytest.mark.slow  # mesh-sharded stage-2 compile

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(5), MODEL_CFG)


def _write_brain(root, vol):
    mask_root = str(root / "mask")
    os.makedirs(os.path.join(mask_root, "mouse", "masked_niftis"), exist_ok=True)
    mm = np.lib.format.open_memmap(
        os.path.join(mask_root, "mouse", "masked_niftis", "masked_nifti.npy"),
        mode="w+",
        dtype=np.uint16,
        shape=(1, 1, *vol.shape),
    )
    mm[0, 0] = vol
    mm.flush()
    del mm
    return mask_root


def _cfg(mask_root, blob_root, shards, load_all_ram):
    return PipelineConfig.from_dict(
        {
            "blob_detection": {
                "input_location": mask_root,
                "output_location": blob_root,
                "spatial_shards": shards,
                "window_dimensions": {
                    "window_dim_0": ROI[0],
                    "window_dim_1": ROI[1],
                    "window_dim_2": ROI[2],
                },
            },
            "FLAGS": {
                "ABSPATHS": True,
                "LOAD_ALL_RAM": load_all_ram,
                "SAVE_ACTIVATED_OUTPUT": False,
                "TEST_TIME_AUGMENTATION": False,
            },
        }
    )


@pytest.mark.parametrize("load_all_ram", [True, False])
def test_stage02_sharded_matches_single_chip(params, tmp_path, load_all_ram):
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from delivr_cfos_tpu.pipeline.stage02_inference import run_inference

    rng = np.random.default_rng(4)
    Z, Y, X = 70, 32, 32  # awkward z on purpose
    vol = np.zeros((Z, Y, X), np.uint16)
    vol[:66, :28, :30] = (rng.random((66, 28, 30)) * 700 + 5).astype(np.uint16)
    stack_shape = (1, 1, 66, 28, 30)

    results = {}
    for shards in (1, 4):
        root = tmp_path / f"s{shards}_{load_all_ram}"
        root.mkdir()
        mask_root = _write_brain(root, vol)
        cfg = _cfg(mask_root, str(root / "blob"), shards, load_all_ram)
        run_inference(cfg, "mouse", stack_shape, params=params, model_cfg=MODEL_CFG)
        results[shards] = np.load(
            os.path.join(
                str(root / "blob"), "mouse", "binary_segmentations", "binaries.npy"
            )
        )
    np.testing.assert_array_equal(results[4], results[1])
