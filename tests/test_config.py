import json

from delivr_cfos_tpu.config import PipelineConfig


REF_STYLE_CONFIG = {
    "raw_location": "/data/raw/",
    "output_location": "/data/output/",
    "mask_detection": {
        "ilastik_location": "/delivr/ilastik/",
        "ilastik_model": "./models/random_forest_weights.ilp",
        "teraconverter_location": "/delivr/teraconverter/",
        "output_location": "01_mask_detection/output/",
        "downsample_steps": {
            "original_um_x": 1.62,
            "original_um_y": 1.62,
            "original_um_z": 6.0,
            "downsample_um_x": 25.0,
            "downsample_um_y": 25.0,
            "downsample_um_z": 25.0,
        },
        "mask_with_Ilastik": True,
        "simple_threshold_value": 250,
    },
    "blob_detection": {
        "input_location": "01_mask_detection/output/",
        "model_location": "./models/inference_weights.tar",
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
        "min_size": -1,
        "max_size": -1,
    },
    "atlas_alignment": {
        "input_location": "03_postprocessing/output/",
        "output_location": "04_atlas_alignment/output/",
        "mBrainAligner_location": "/delivr/mbrainaligner/",
        "collection_folder": "04_atlas_alignment/collection/",
        "parallel_processing": True,
        "landmarks_hemisphere": False,
    },
    "region_assignment": {
        "input_location": "04_atlas_alignment/collection/",
        "CCF3_atlasfile": "./models/CCF3_P56_annotation.tif",
        "CCF3_ontology": "./models/ontology.xml",
        "output_location": "05_region_assignment/",
    },
    "visualization": {
        "input_csv_location": "05_region_assignment/",
        "input_size_location": "03_postprocessing/output/",
        "input_prediction_location": "02_blob_detection/output/",
        "cache_location": "06_visualization/cache/",
        "output_location": "06_visualization/output/",
        "region_id_rgb": True,
        "region_id_grayvalues": False,
        "no_atlas_depthmap": False,
    },
    "FLAGS": {
        "ABSPATHS": False,
        "LOAD_ALL_RAM": True,
        "TEST_TIME_AUGMENTATION": True,
        "MASK_DOWNSAMPLE": True,
        "BLOB_DETECTION": True,
        "POSTPROCESSING": True,
        "ATLAS_ALIGNMENT": True,
        "REGION_ASSIGNMENT": True,
        "VISUALIZATION": True,
        "SAVE_MASK_OUTPUT": True,
        "SAVE_NETWORK_OUTPUT": True,
        "SAVE_ACTIVATED_OUTPUT": False,
        "SAVE_POSTPROCESSING_OUTPUT": True,
        "SAVE_ATLAS_OUTPUT": True,
    },
}


def test_relative_paths_resolved_against_output_location():
    cfg = PipelineConfig.from_dict(json.loads(json.dumps(REF_STYLE_CONFIG)))
    assert cfg.mask_detection.output_location == "/data/output/01_mask_detection/output/"
    assert cfg.blob_detection.input_location == "/data/output/01_mask_detection/output/"
    assert cfg.atlas_alignment.collection_folder == "/data/output/04_atlas_alignment/collection/"
    # non-path keys untouched
    assert cfg.mask_detection.ilastik_model == "./models/random_forest_weights.ilp"
    assert cfg.region_assignment.CCF3_atlasfile == "./models/CCF3_P56_annotation.tif"


def test_absolute_paths_survive_join():
    raw = json.loads(json.dumps(REF_STYLE_CONFIG))
    raw["blob_detection"]["output_location"] = "/abs/already/"
    cfg = PipelineConfig.from_dict(raw)
    # os.path.join(out, absolute) == absolute — reference semantics
    assert cfg.blob_detection.output_location == "/abs/already/"


def test_abspaths_flag_disables_rewriting():
    raw = json.loads(json.dumps(REF_STYLE_CONFIG))
    raw["FLAGS"]["ABSPATHS"] = True
    cfg = PipelineConfig.from_dict(raw)
    assert cfg.blob_detection.output_location == "02_blob_detection/output/"


def test_downsample_ratios_match_reference():
    cfg = PipelineConfig.from_dict(REF_STYLE_CONFIG)
    # reference: round(25/6)=4 (z), round(25/1.62)=15 (y, x)
    assert cfg.mask_detection.downsample_steps.ratios_zyx == (4, 15, 15)


def test_window_dims():
    cfg = PipelineConfig.from_dict(REF_STYLE_CONFIG)
    assert cfg.blob_detection.window_dimensions.zyx == (96, 96, 64)


def test_setup_folders(tmp_path):
    raw = json.loads(json.dumps(REF_STYLE_CONFIG))
    raw["output_location"] = str(tmp_path / "out")
    cfg = PipelineConfig.from_dict(raw)
    cfg.setup_folders()
    assert (tmp_path / "out" / "01_mask_detection" / "output").is_dir()
    assert (tmp_path / "out" / "04_atlas_alignment" / "collection").is_dir()
    assert (tmp_path / "out" / "06_visualization" / "output").is_dir()


def test_unknown_keys_ignored():
    raw = json.loads(json.dumps(REF_STYLE_CONFIG))
    raw["mask_detection"]["future_knob"] = 42
    cfg = PipelineConfig.from_dict(raw)
    assert cfg.mask_detection.simple_threshold_value == 250


def test_round4_extension_keys_parse():
    """blob_detection.importance / erosion_iters (r4 framework extensions)
    parse from config dicts and default to the reference semantics."""
    import json

    raw = json.loads(json.dumps(REF_STYLE_CONFIG))
    cfg = PipelineConfig.from_dict(raw)
    assert cfg.blob_detection.importance == "constant"
    assert cfg.blob_detection.erosion_iters == 30

    raw["blob_detection"]["importance"] = "gaussian"
    raw["blob_detection"]["erosion_iters"] = 5
    cfg = PipelineConfig.from_dict(raw)
    assert cfg.blob_detection.importance == "gaussian"
    assert cfg.blob_detection.erosion_iters == 5


def test_real_reference_config_parses():
    """The reference repo's shipped config.json loads verbatim — the exact
    artifact a migrating user hands to this CLI (reference: config.json)."""
    import os

    path = "/root/reference/config.json"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference asset absent")
    cfg = PipelineConfig.from_json(path)
    wd = cfg.blob_detection.window_dimensions
    assert (wd.window_dim_0, wd.window_dim_1, wd.window_dim_2) == (96, 96, 64)
    ds = cfg.mask_detection.downsample_steps
    assert ds.original_um_x == 1.62 and ds.downsample_um_z == 25.0
    assert cfg.mask_detection.mask_with_Ilastik is True
    assert cfg.postprocessing.min_size == -1 and cfg.postprocessing.max_size == -1
    assert cfg.FLAGS.TEST_TIME_AUGMENTATION is True
    assert cfg.atlas_alignment.landmarks_hemisphere is False
    # ./models/... paths survive as given (resolved at point of use)
    assert cfg.region_assignment.CCF3_ontology.endswith(
        "AllenMouseCCFv3_ontology_22Feb2021.xml"
    )
    # framework extension keys default sanely on an untouched reference config
    assert cfg.blob_detection.precision == "auto"
    assert cfg.blob_detection.spatial_shards in (0, 1, None) or isinstance(
        cfg.blob_detection.spatial_shards, int
    )
