"""End-to-end test of stages 4-6 (atlas alignment, region assignment,
visualization) on a synthetic brain with a synthetic ontology + annotation
volume. Stage 2 is bypassed: a synthetic binary segmentation is pre-seeded so
blob content is deterministic."""

import os
import pickle
import zipfile

import numpy as np
import pandas as pd
import pytest

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.pipeline.runner import run_pipeline
from delivr_cfos_tpu.utils.io.npy import open_memmap
from delivr_cfos_tpu.utils.io.tiff import read_tiff, write_tiff, write_tiff_stack

RAW_SHAPE = (8, 64, 48)

ONTOLOGY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<response>
<structure>
  <id>997</id>
  <name>root</name>
  <acronym>root</acronym>
  <color-hex-triplet>FFFFFF</color-hex-triplet>
  <graph-order>0</graph-order>
  <parent-structure-id>-1</parent-structure-id>
  <st-level>0</st-level>
</structure>
<structure>
  <id>315</id>
  <name>Isocortex</name>
  <acronym>Isocortex</acronym>
  <color-hex-triplet>70FF71</color-hex-triplet>
  <graph-order>1</graph-order>
  <parent-structure-id>997</parent-structure-id>
  <st-level>1</st-level>
</structure>
<structure>
  <id>382</id>
  <name>Field CA1</name>
  <acronym>CA1</acronym>
  <color-hex-triplet>7ED04B</color-hex-triplet>
  <graph-order>2</graph-order>
  <parent-structure-id>997</parent-structure-id>
  <st-level>2</st-level>
</structure>
</response>
"""


def _make_raw_brain(raw_dir, seed=0):
    rng = np.random.default_rng(seed)
    vol = (rng.random(RAW_SHAPE) * 100).astype(np.uint16)
    vol[:, 8:56, 8:40] += 500  # bright "brain" region (above threshold 250)
    os.makedirs(raw_dir, exist_ok=True)
    for z in range(RAW_SHAPE[0]):
        write_tiff(os.path.join(raw_dir, f"Z{z:04d}.tif"), vol[z])


def _make_binaries(path, blobs):
    seg = np.zeros(RAW_SHAPE, np.uint8)
    for (z, y, x) in blobs:
        seg[z - 1 : z + 1, y - 2 : y + 2, x - 2 : x + 2] = 1
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mm = open_memmap(path, shape=RAW_SHAPE, dtype=np.uint8)
    mm[:] = seg
    mm.flush()
    del mm


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e456")
    raw = tmp / "raw"
    out = tmp / "out"
    _make_raw_brain(str(raw / "mouseQ"))

    # synthetic CCF3 annotation volume: graph_order values
    atlas = np.ones((456, 528, 320), np.uint16)  # everything = Isocortex
    atlas[:200, :, :] = 2  # front = CA1
    atlas_path = tmp / "CCF3_annotation.tif"
    write_tiff_stack(str(atlas_path), atlas, compress=True)
    ontology_path = tmp / "ontology.xml"
    ontology_path.write_text(ONTOLOGY_XML)

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
            "model_location": "unused",
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
            "CCF3_atlasfile": str(atlas_path),
            "CCF3_ontology": str(ontology_path),
            "output_location": "05_region_assignment/",
        },
        "visualization": {
            "input_csv_location": "05_region_assignment/",
            "input_size_location": "03_postprocessing/output/",
            "input_prediction_location": "02_blob_detection/output/",
            "cache_location": str(out / "06_visualization/cache"),
            "output_location": "06_visualization/output/",
            "region_id_rgb": True,
            "region_id_grayvalues": True,
        },
        "FLAGS": {
            "BLOB_DETECTION": False,  # binaries pre-seeded below
            "TEST_TIME_AUGMENTATION": False,
        },
    }
    cfg = PipelineConfig.from_dict(raw_cfg)
    # pre-seed synthetic binaries (4 blobs incl. one that will be dropped by
    # the reference's range(1, N) quirk)
    _make_binaries(
        os.path.join(
            cfg.blob_detection.output_location,
            "mouseQ",
            "binary_segmentations",
            "binaries.npy",
        ),
        blobs=[(2, 20, 20), (4, 30, 25), (5, 40, 30), (6, 50, 35)],
    )
    run_pipeline(cfg)
    return cfg, tmp


def test_stage3_csv_has_expected_blobs(full_run):
    cfg, _ = full_run
    out = cfg.postprocessing.output_location
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    df = pd.read_csv(os.path.join(out, csvs[0]))
    # 4 blobs found; range(1, N) quirk drops the last → 3 rows
    assert len(df) == 3
    assert list(df["Blob"]) == [1, 2, 3]


def test_stage4_outputs(full_run):
    cfg, _ = full_run
    outdir = os.path.join(cfg.atlas_alignment.output_location, "mouseQ")
    assert os.path.exists(os.path.join(outdir, "transform.npz"))
    assert os.path.exists(os.path.join(outdir, "mouseQ_resampled.swc"))
    assert os.path.exists(os.path.join(outdir, "mouseQ_local_registered_data.swc"))
    coll = os.path.join(
        cfg.atlas_alignment.collection_folder,
        "mouseQ_local_registered_with_original_size.csv",
    )
    assert os.path.exists(coll)
    # stage 4 stamps the registration mode into both the collection CSV
    # (leading comment) and transform.npz so fallback runs self-identify
    with open(coll) as f:
        first = f.readline()
    assert first.startswith("# registration_mode: ")
    tr = np.load(os.path.join(outdir, "transform.npz"))
    assert bytes(tr["mode"]).decode() == first.split(": ", 1)[1].strip()
    cells = pd.read_csv(coll, sep=" ", comment="#")
    assert list(cells.columns) == ["n", "type", "x", "y", "z", "Size"]
    assert len(cells) == 3
    # fallback affine scales into the 50 µm atlas box
    assert (cells["x"] >= 0).all() and (cells["x"] < 264).all()
    assert (cells["y"] >= 0).all() and (cells["y"] < 160).all()
    assert (cells["z"] >= 0).all() and (cells["z"] < 228).all()


def test_stage5_outputs(full_run):
    cfg, _ = full_run
    out = cfg.region_assignment.output_location
    cells = pd.read_csv(os.path.join(out, "cells_mouseQ.csv"), index_col=0)
    assert len(cells) == 3
    assert set(cells["acronym"]) <= {"Isocortex", "CA1", "bgr", "root"}
    overview = pd.read_csv(os.path.join(out, "cells_overview_mouseQ.csv"), index_col=0)
    assert overview["number"].sum() >= 3  # cell counts present
    collapsed = pd.read_csv(os.path.join(out, "region_collapsed_mouseQ.csv"), index_col=0)
    assert "BlobCount" in collapsed.columns
    # heatmap: total mass ≈ number of in-bounds cells (gaussian preserves sum)
    heatmap = read_tiff(os.path.join(out, "heatmap_mouseQ.tif"))
    assert heatmap.shape == (456, 528, 320)
    np.testing.assert_allclose(heatmap.sum(), len(cells), rtol=1e-3)
    # xlsx artifacts exist and are valid zips
    for name in ("region_overview.xlsx", "region_collapsed_overview.xlsx"):
        with zipfile.ZipFile(os.path.join(out, name)) as z:
            assert "xl/workbook.xml" in z.namelist()
    with open(os.path.join(out, "heatmap_collection.pickledump"), "rb") as f:
        coll = pickle.load(f)
    assert "mouseQ" in coll


def test_stage6_outputs(full_run):
    cfg, _ = full_run
    rgb_dir = os.path.join(cfg.visualization.output_location, "mouseQ_rgb_tiffs")
    files = sorted(os.listdir(rgb_dir))
    assert len(files) == RAW_SHAPE[0] * 3  # 3 channels per z-plane
    assert f"mouseQrgb_C00_z0000.tif" in files
    # colored voxels exist and match region colors (Isocortex 70FF71 etc.)
    any_colored = False
    for z in range(RAW_SHAPE[0]):
        r = read_tiff(os.path.join(rgb_dir, f"mouseQrgb_C00_z{z:04d}.tif"))
        g = read_tiff(os.path.join(rgb_dir, f"mouseQrgb_C01_z{z:04d}.tif"))
        if r.max() > 0 or g.max() > 0:
            any_colored = True
    assert any_colored
    rid_dir = os.path.join(
        cfg.visualization.output_location, "mouseQ", "mouseQ_region_id_tiffs"
    )
    rid_files = sorted(os.listdir(rid_dir))
    assert len(rid_files) == RAW_SHAPE[0]
    vals = set()
    for f in rid_files:
        vals |= set(np.unique(read_tiff(os.path.join(rid_dir, f))))
    assert vals <= {0, 1, 2}  # graph_order grayvalues
    assert len(vals) > 1


def test_create_heatmap_inplace_filter_bit_exact():
    """The in-place gaussian_filter(output=input) in create_heatmap must be
    bit-identical to the out-of-place filter (stage05_region_assignment.py:140
    trades a fresh 308 MB buffer for in-place filtering on the CCF grid)."""
    from scipy.ndimage import gaussian_filter

    from delivr_cfos_tpu.pipeline.stage05_region_assignment import create_heatmap

    rng = np.random.default_rng(7)
    shape = (23, 31, 17)
    n = 40
    cells = pd.DataFrame(
        {
            "z": rng.integers(0, shape[0], n),
            "y": rng.integers(0, shape[1], n),
            "x": rng.integers(0, shape[2], n),
        }
    )
    expected = np.zeros(shape, np.float32)
    np.add.at(
        expected,
        (cells["z"].to_numpy(int), cells["y"].to_numpy(int), cells["x"].to_numpy(int)),
        1.0,
    )
    expected = gaussian_filter(expected, sigma=2.25)  # out-of-place reference
    got = create_heatmap(cells, shape)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, expected)


def test_collapse_to_color_group_matches_rowwise_reference():
    """The vectorized groupby collapse must reproduce the reference's
    row-wise scan (cells_to_atlas.py:92-112) column for column — including
    the acronym→name ``to_string`` quirk when an acronym recurs."""
    from delivr_cfos_tpu.pipeline.stage05_region_assignment import (
        collapse_to_color_group,
    )

    ontology = pd.DataFrame(
        {
            "acronym": ["root", "ISO", "CA1", "CA2", "DUP", "DUP"],
            "name": ["root", "Isocortex", "Field CA1", "Field CA2",
                     "dup one", "dup two"],
            "color-hex-triplet": ["FFFFFF", "70FF71", "7ED04B", "7ED04B",
                                  "AA0000", "AA0000"],
        }
    )
    elements = pd.DataFrame(
        {
            "color-hex-triplet": ["70FF71", "7ED04B", "7ED04B", "AA0000"],
            "number": [3, 5, 2, 7],
        }
    )

    def rowwise(elements, ontology_df):
        tmp = pd.DataFrame(elements)
        groups = pd.DataFrame(
            columns=["ColorGroup", "GroupName", "GroupAcronym",
                     "GroupedAcronyms", "BlobCount"]
        )
        groups["ColorGroup"] = ontology_df["color-hex-triplet"].unique().tolist()
        for i in range(len(groups)):
            color = groups.at[i, "ColorGroup"]
            acronyms = ontology_df[
                ontology_df["color-hex-triplet"] == color
            ]["acronym"].tolist()
            groups.at[i, "GroupedAcronyms"] = ", ".join(acronyms)
            groups.at[i, "GroupName"] = (
                ontology_df[ontology_df["acronym"] == acronyms[0]]["name"]
                .to_string(index=False)
                .strip()
            )
            groups.at[i, "GroupAcronym"] = acronyms[0]
            if len(tmp):
                groups.at[i, "BlobCount"] = tmp[
                    tmp["color-hex-triplet"] == color
                ]["number"].sum()
            else:
                groups.at[i, "BlobCount"] = 0
        return groups

    for elems in (elements, elements.iloc[:0]):
        got = collapse_to_color_group(elems, ontology)
        want = rowwise(elems, ontology)
        assert list(got.columns) == list(want.columns)
        for col in want.columns:
            assert got[col].astype(str).tolist() == want[col].astype(str).tolist(), col
