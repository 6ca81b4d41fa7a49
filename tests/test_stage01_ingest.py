"""Stage-1 ingest threading (mask_detection.ingest_threads).

On a single-core CI host the auto setting resolves to one worker, so the
threaded decode-ahead / masking-write paths would never execute; these
tests pin ingest_threads > 1 and require every stage-1 output file to be
byte-identical to the serial run (reference semantics:
downsample_and_mask.py:184-192 downsample, :384-417 masking loop).
"""

import os

import numpy as np
import pytest

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.pipeline.stage01_downsample_mask import downsample_mask
from delivr_cfos_tpu.utils.io.tiff import write_tiff

RAW_SHAPE = (10, 64, 48)


def _make_raw_brain(raw_dir, seed=2):
    rng = np.random.default_rng(seed)
    vol = (rng.random(RAW_SHAPE) * 400).astype(np.uint16)
    vol[3:5, 10:20, 10:20] = 60000
    os.makedirs(raw_dir, exist_ok=True)
    for z in range(RAW_SHAPE[0]):
        write_tiff(os.path.join(raw_dir, f"Z{z:04d}.tif"), vol[z])


def _cfg(root, threads):
    return PipelineConfig.from_dict(
        {
            "raw_location": os.path.join(root, "raw"),
            "output_location": os.path.join(root, "out"),
            "mask_detection": {
                "output_location": os.path.join(root, "out", "01") + os.sep,
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
                "ingest_threads": threads,
            },
            "blob_detection": {
                "window_dimensions": {
                    "window_dim_0": 16,
                    "window_dim_1": 16,
                    "window_dim_2": 16,
                },
            },
            "FLAGS": {"ABSPATHS": True},
        }
    )


def _all_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


@pytest.mark.parametrize("threads", [4])
def test_ingest_threads_bit_identical(tmp_path, threads):
    """Threaded stage-1 ingest only moves WHERE decodes/writes happen; every
    output byte must match the serial run."""
    ser_root = str(tmp_path / "ser")
    par_root = str(tmp_path / "par")
    for root in (ser_root, par_root):
        _make_raw_brain(os.path.join(root, "raw", "brainA"))

    downsample_mask(_cfg(ser_root, 1), "brainA")
    downsample_mask(_cfg(par_root, threads), "brainA")

    ser = _all_files(os.path.join(ser_root, "out"))
    par = _all_files(os.path.join(par_root, "out"))
    assert sorted(ser) == sorted(par)
    for name in ser:
        assert par[name] == ser[name], f"{name} differs under threading"
    # sanity: the masked full-res volume and the downsampled stack exist
    assert any("masked_nifti.npy" in n for n in ser)
    assert any("stack_resampled.tif" in n for n in ser)


def test_stage6_plane_writer_threads_bit_identical(tmp_path):
    """Stage-6 per-plane LUT writer: threaded fan-out must write the same
    bytes as the serial loop (distinct files per plane/channel)."""
    from delivr_cfos_tpu.pipeline.stage06_visualization import (
        _apply_lut_per_plane,
    )

    rng = np.random.default_rng(5)
    labels = rng.integers(0, 9, (12, 20, 24)).astype(np.int32)
    lut_rgb = rng.integers(0, 255, (9, 3)).astype(np.uint8)
    lut_gray = rng.integers(0, 65535, (9,)).astype(np.uint16)

    outs = {}
    for tag, threads in (("ser", 1), ("par", 4)):
        root = str(tmp_path / tag)
        os.makedirs(root, exist_ok=True)
        _apply_lut_per_plane(
            labels, lut_rgb, root,
            lambda z, c, root=root: os.path.join(root, f"rgb_C{c:02d}_z{z:04d}.tif"),
            threads=threads,
        )
        _apply_lut_per_plane(
            labels, lut_gray, root,
            lambda z, _c, root=root: os.path.join(root, f"gray_z{z:04d}.tif"),
            threads=threads,
        )
        outs[tag] = _all_files(root)
    assert sorted(outs["ser"]) == sorted(outs["par"])
    assert len(outs["ser"]) == 12 * 3 + 12
    for name in outs["ser"]:
        assert outs["par"][name] == outs["ser"][name]
