"""End-to-end pipeline test on a synthetic brain (stages 1-3)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import jax

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.models import init_params
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig
from delivr_cfos_tpu.models.convert import save_params_npz
from delivr_cfos_tpu.pipeline.runner import run_pipeline
from delivr_cfos_tpu.utils.io.tiff import read_tiff, write_tiff

TINY = (4, 4, 8, 16, 32, 4)
RAW_SHAPE = (8, 64, 48)  # (z, y, x)


def _make_raw_brain(raw_dir, seed=0):
    """Bright blobs on dark background, 16-bit z-plane TIFFs."""
    rng = np.random.default_rng(seed)
    vol = (rng.random(RAW_SHAPE) * 120).astype(np.uint16)  # dim background
    for _ in range(6):
        c = rng.integers((1, 4, 4), np.array(RAW_SHAPE) - (1, 4, 4))
        vol[
            c[0] - 1 : c[0] + 1, c[1] - 3 : c[1] + 3, c[2] - 3 : c[2] + 3
        ] = 60000
    os.makedirs(raw_dir, exist_ok=True)
    for z in range(RAW_SHAPE[0]):
        write_tiff(os.path.join(raw_dir, f"Z{z:04d}.tif"), vol[z])
    return vol


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    raw = tmp / "raw"
    out = tmp / "out"
    _make_raw_brain(str(raw / "brainA"))

    weights = tmp / "weights.npz"
    params = init_params(jax.random.PRNGKey(0), BasicUNetConfig(features=TINY))
    save_params_npz(str(weights), params)

    raw_cfg = {
        "raw_location": str(raw),
        "output_location": str(out),
        "mask_detection": {
            "output_location": "01_mask_detection/output/",
            "downsample_steps": {
                "original_um_x": 6.25,
                "original_um_y": 6.25,
                "original_um_z": 12.5,
                "downsample_um_x": 25.0,
                "downsample_um_y": 25.0,
                "downsample_um_z": 25.0,
            },
            "mask_with_Ilastik": False,
            "simple_threshold_value": 250,
        },
        "blob_detection": {
            "input_location": "01_mask_detection/output/",
            "model_location": str(weights),
            "output_location": "02_blob_detection/output/",
            "window_dimensions": {
                "window_dim_0": 16,
                "window_dim_1": 16,
                "window_dim_2": 16,
            },
        },
        "postprocessing": {
            "input_location": "02_blob_detection/output/",
            "output_location": "03_postprocessing/output/",
        },
        "atlas_alignment": {
            "input_location": "03_postprocessing/output/",
            "output_location": "04_atlas_alignment/output/",
            "collection_folder": "04_atlas_alignment/collection/",
        },
        "region_assignment": {
            "input_location": "04_atlas_alignment/collection/",
            "output_location": "05_region_assignment/",
        },
        "visualization": {
            "input_csv_location": "05_region_assignment/",
            "input_size_location": "03_postprocessing/output/",
            "input_prediction_location": "02_blob_detection/output/",
            "cache_location": str(out / "06_visualization/cache"),
            "output_location": "06_visualization/output/",
        },
        "FLAGS": {
            "TEST_TIME_AUGMENTATION": False,
            "ATLAS_ALIGNMENT": False,
            "REGION_ASSIGNMENT": False,
            "VISUALIZATION": False,
            "SAVE_ACTIVATED_OUTPUT": True,
        },
    }
    cfg = PipelineConfig.from_dict(raw_cfg)
    run_pipeline(cfg)
    return cfg, tmp


def test_stage1_outputs(pipeline_run):
    cfg, _ = pipeline_run
    base = os.path.join(cfg.mask_detection.output_location, "brainA")
    ds = read_tiff(os.path.join(base, "stack_resampled.tif"))
    # reference depth quirk: ceil(8/2) − 1 = 3 planes; y 64/4=16; x 48/4=12
    assert ds.shape == (3, 16, 12)
    assert ds.dtype == np.uint16
    ds8 = read_tiff(os.path.join(base, "stack_resampled_8bit.tif"))
    assert ds8.dtype == np.uint8
    masked = np.load(os.path.join(base, "masked_niftis", "masked_nifti.npy"))
    assert masked.shape == (1, 1, 16, 64, 48)  # padded to window multiples
    assert masked.dtype == np.uint16
    # thresholding zeroed the dim background in the real extent
    assert masked[0, 0, :8][masked[0, 0, :8] < 250].max(initial=0) == 0
    assert (masked[0, 0, 8:] == 0).all()  # padding stays zero
    assert os.path.exists(os.path.join(base, "stack_masked_downsampled.v3draw"))
    assert len(os.listdir(os.path.join(base, "masked_tiffs"))) == 8


def test_stage2_outputs(pipeline_run):
    cfg, _ = pipeline_run
    bdir = os.path.join(
        cfg.blob_detection.output_location, "brainA", "binary_segmentations"
    )
    binaries = np.load(os.path.join(bdir, "binaries.npy"))
    assert binaries.shape == RAW_SHAPE  # real, unpadded shape
    assert binaries.dtype == np.uint8
    assert set(np.unique(binaries)) <= {0, 1}
    activated = np.load(os.path.join(bdir, "network_output.npy"))
    assert activated.shape == RAW_SHAPE
    assert ((activated >= 0) & (activated <= 1)).all()


def test_stage3_outputs(pipeline_run):
    cfg, _ = pipeline_run
    out = cfg.postprocessing.output_location
    files = os.listdir(out)
    csvs = [f for f in files if f.endswith(".csv")]
    assert csvs == [f"{RAW_SHAPE}_brainA.csv"]
    df = pd.read_csv(os.path.join(out, csvs[0]))
    assert list(df.columns) == ["Unnamed: 0", "Blob", "Coords", "Size"]
    if len(df):
        coords = df["Coords"].iloc[0]
        parsed = json.loads(coords)
        assert len(parsed) == 3
    assert any("-cc3d.npy" in f for f in files)
    assert any("-stats.pickle" in f for f in files)


def test_rerun_skips_and_is_idempotent(pipeline_run, capsys):
    cfg, _ = pipeline_run
    run_pipeline(cfg)
    out = capsys.readouterr().out
    assert "exists, skipping..." in out
    assert "already processed, skipping..." in out
    assert "HOOK:OVERALL:3" in out
    assert "HOOK:1:3:0:1" in out
