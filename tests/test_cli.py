"""CLI entry contract: ``python -m delivr_cfos_tpu <config>`` (main()).

The e2e tests drive run_pipeline directly; this covers the argv surface
itself — argument parsing, config load, and the HOOK protocol emission the
Fiji plugin scrapes from stdout (reference __main__.py:48-96).
"""

import json
import os

from delivr_cfos_tpu.__main__ import main


def _write_config(tmp_path, flags):
    raw = tmp_path / "raw"
    raw.mkdir()
    cfg = {
        "raw_location": str(raw) + "/",
        "output_location": str(tmp_path / "out") + "/",
        "mask_detection": {
            "output_location": "01_mask_detection/output/",
            "downsample_steps": {
                "original_um_x": 1.62,
                "original_um_y": 1.62,
                "original_um_z": 6.0,
                "downsample_um_x": 25.0,
                "downsample_um_y": 25.0,
                "downsample_um_z": 25.0,
            },
            "mask_with_Ilastik": False,
        },
        "blob_detection": {
            "input_location": "01_mask_detection/output/",
            "model_location": "unused.npz",
            "output_location": "02_blob_detection/output/",
            "window_dimensions": {
                "window_dim_0": 96,
                "window_dim_1": 96,
                "window_dim_2": 64,
            },
        },
        "postprocessing": {
            "input_location": "02_blob_detection/output/",
            "output_location": "03_postprocessing/output/",
        },
        "FLAGS": flags,
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(cfg))
    return path


def test_cli_main_runs_stages_and_emits_hooks(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path,
        {
            "BLOB_DETECTION": False,
            "POSTPROCESSING": False,
            "ATLAS_ALIGNMENT": False,
            "REGION_ASSIGNMENT": False,
            "VISUALIZATION": False,
        },
    )
    # one micro brain so the stage loop emits per-item HOOK lines
    import numpy as np

    from delivr_cfos_tpu.utils.io.tiff import write_tiff

    brain = tmp_path / "raw" / "brainA"
    brain.mkdir()
    for z in range(12):
        write_tiff(
            str(brain / f"Z{z:04d}.tif"),
            np.full((32, 32), 300, np.uint16),
        )

    main([str(cfg_path)])
    out = capsys.readouterr().out
    assert f"Loading {cfg_path}" in out
    # one enabled stage (mask_downsample) over one brain
    assert "HOOK:OVERALL:1" in out
    assert "HOOK:1:1:0:1" in out
    # folder tree was created by setup_folders
    assert os.path.isdir(tmp_path / "out" / "01_mask_detection" / "output")


def test_cli_default_config_warning(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg_path = _write_config(
        tmp_path,
        {
            "MASK_DOWNSAMPLE": False,
            "BLOB_DETECTION": False,
            "POSTPROCESSING": False,
            "ATLAS_ALIGNMENT": False,
            "REGION_ASSIGNMENT": False,
            "VISUALIZATION": False,
        },
    )
    os.replace(cfg_path, tmp_path / "config.json")
    main([])  # no argv → the reference's default-path warning
    out = capsys.readouterr().out
    assert "internal default config" in out
