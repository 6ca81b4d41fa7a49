"""Warm host-side wall-clock for stages 4-6 at the bench-brain scale.

Completes the per-stage decomposition PERF.md carries for stages 1-3:
stage 4 in geometric-fallback mode (the intensity path is measured
separately at Allen scale — PERF.md "stage-4 registration at production
scale"), stage 5 (ontology parse, per-cell atlas lookup, region tables,
sigma=2.25 heatmap over the full 25 um CCF3 grid, xlsx collection), and
stage 6 (label/stat cache, per-blob RGB paint, per-plane TIFF triplets).

Volume (64, 768, 768) with ~12k blobs, real CCF3 annotation dims
(456, 528, 320). min-of-N because this host serves first-touch pages with
time-varying latency (see PERF.md). Runs stages 4-6 repeatedly with
stages 1-3 cached, by deleting the 04/05/06 outputs between reps.

Usage: python scripts/bench_stages456.py [reps]
Prints one JSON line with per-stage min seconds.
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ONTOLOGY_XML_HEAD = """<?xml version="1.0" encoding="UTF-8"?>\n<response>\n"""
STRUCT = """<structure>
  <id>{sid}</id>
  <name>region {sid}</name>
  <acronym>r{sid}</acronym>
  <color-hex-triplet>{rgb}</color-hex-triplet>
  <graph-order>{go}</graph-order>
  <parent-structure-id>{parent}</parent-structure-id>
  <st-level>{lvl}</st-level>
</structure>
"""


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    Z, Y, X = 64, 768, 768

    from delivr_cfos_tpu.config import PipelineConfig
    from delivr_cfos_tpu.pipeline.runner import run_pipeline
    from delivr_cfos_tpu.utils.io.npy import open_memmap
    from delivr_cfos_tpu.utils.io.tiff import write_tiff, write_tiff_stack

    tmp = tempfile.mkdtemp(prefix="delivr_bench_456_")

    # stage-1 input: a bright-half brain (only consumed once, cached after)
    raw = os.path.join(tmp, "raw", "brainA")
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    for z in range(Z):
        plane = np.zeros((Y, X), np.uint16)
        plane[: Y // 2] = (rng.random((Y // 2, X)) * 900 + 400).astype(
            np.uint16
        )
        write_tiff(os.path.join(raw, f"Z{z:04d}.tif"), plane)

    # 40-region ontology + annotation volume at the real CCF3 dims
    parts = [ONTOLOGY_XML_HEAD]
    parts.append(
        STRUCT.format(sid=997, rgb="FFFFFF", go=0, parent=-1, lvl=0)
    )
    for i in range(1, 40):
        parts.append(
            STRUCT.format(
                sid=1000 + i,
                rgb=f"{(i * 97) % 256:02X}{(i * 57) % 256:02X}{(i * 17) % 256:02X}",
                go=i,
                parent=997,
                lvl=1 + (i % 3),
            )
        )
    parts.append("</response>\n")
    ontology_path = os.path.join(tmp, "ontology.xml")
    with open(ontology_path, "w") as f:
        f.write("".join(parts))

    atlas = (
        rng.integers(0, 40, (456, 528, 320)).astype(np.uint16)
    )  # graph_order values
    atlas_path = os.path.join(tmp, "CCF3_annotation.tif")
    write_tiff_stack(atlas_path, atlas, compress=True)

    cfg = PipelineConfig.from_dict(
        {
            "raw_location": os.path.join(tmp, "raw"),
            "output_location": os.path.join(tmp, "out"),
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
                "simple_threshold_value": 250,
            },
            "blob_detection": {
                "input_location": "01_mask_detection/output/",
                "model_location": "unused",
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
            "atlas_alignment": {
                "input_location": "03_postprocessing/output/",
                "output_location": "04_atlas_alignment/output/",
                "collection_folder": "04_atlas_alignment/collection/",
            },
            "region_assignment": {
                "input_location": "04_atlas_alignment/collection/",
                "CCF3_atlasfile": atlas_path,
                "CCF3_ontology": ontology_path,
                "output_location": "05_region_assignment/",
            },
            "visualization": {
                "input_csv_location": "05_region_assignment/",
                "input_size_location": "03_postprocessing/output/",
                "input_prediction_location": "02_blob_detection/output/",
                "cache_location": os.path.join(tmp, "out", "06_cache"),
                "output_location": "06_visualization/output/",
            },
            "FLAGS": {"BLOB_DETECTION": False},
        }
    )

    # pre-seed ~12k-blob binaries (stage 2 bypassed)
    seg = np.zeros((Z, Y, X), np.uint8)
    n_blobs = 12000
    czs = rng.integers(1, Z - 3, n_blobs)
    cys = rng.integers(1, Y - 3, n_blobs)
    cxs = rng.integers(1, X - 3, n_blobs)
    for cz, cy, cx in zip(czs, cys, cxs):
        seg[cz : cz + 2, cy : cy + 2, cx : cx + 2] = 1
    bpath = os.path.join(
        cfg.blob_detection.output_location,
        "brainA",
        "binary_segmentations",
        "binaries.npy",
    )
    os.makedirs(os.path.dirname(bpath))
    mm = open_memmap(bpath, shape=(Z, Y, X), dtype=np.uint8)
    mm[:] = seg
    mm.flush()
    del mm

    best = {}
    for rep in range(reps):
        # stages 1-3 are cached after rep 0; 4-6 rerun each rep
        for sub in (
            "out/04_atlas_alignment",
            "out/05_region_assignment",
            "out/06_visualization",
            "out/06_cache",
        ):
            shutil.rmtree(os.path.join(tmp, sub), ignore_errors=True)
        timer = run_pipeline(cfg)
        for k in ("atlas_alignment", "region_assignment", "visualization"):
            t = timer.spans.get(k, 0.0)
            best[k] = min(best.get(k, 1e9), t)
        print(
            f"rep{rep}: "
            + " ".join(
                f"{k}={timer.spans.get(k, 0.0):.2f}s"
                for k in (
                    "atlas_alignment",
                    "region_assignment",
                    "visualization",
                )
            ),
            flush=True,
        )

    print(
        json.dumps(
            {
                "shape": [Z, Y, X],
                "n_blobs": n_blobs,
                "stage4_fallback_s": round(best["atlas_alignment"], 2),
                "stage5_s": round(best["region_assignment"], 2),
                "stage6_s": round(best["visualization"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
