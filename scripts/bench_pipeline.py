"""Per-stage pipeline wall-clock on TPU (VERDICT r3 item 6): time stages
1→3 over a mid-size synthetic brain so the whole-hemisphere projection in
PERF.md decomposes into measured per-stage shares instead of a UNet-only
extrapolation.

Reference hot spots being measured against: stage-1 mask upsample+masking
("will take days" for >50 GB, downsample_and_mask.py:298-315) and stage-3
connected components (count_blobs.py:59-64).

The synthetic brain is generated on the LOCAL disk (stage 1's input is
host-side TIFF I/O by contract); device uploads inside the stages go
through this rig's ~30 MB/s tunnel, so the stage-2 number here is
tunnel-inclusive — bench.py measures the pure per-chip engine rate.

Usage:  python scripts/bench_pipeline.py [Z Y X]   (default 64 768 768)
Prints one JSON line: {"stage1_s": ..., "stage2_s": ..., "stage3_s": ...,
"voxels": ..., "pipeline_gvox_s": ...}
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    shape = (
        tuple(int(v) for v in sys.argv[1:4]) if len(sys.argv) > 3 else (64, 768, 768)
    )
    Z, Y, X = shape

    from delivr_cfos_tpu.config import PipelineConfig
    from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, init_params
    from delivr_cfos_tpu.models.convert import save_params_npz
    from delivr_cfos_tpu.pipeline.runner import run_pipeline
    from delivr_cfos_tpu.utils.io.tiff import write_tiff

    import jax

    tmp = tempfile.mkdtemp(prefix="delivr_bench_pipeline_")

    def make_brain(name, seed):
        raw_dir = os.path.join(tmp, "raw", name)
        os.makedirs(raw_dir)
        rng = np.random.default_rng(seed)
        # brain-like: bright foreground half (positive background), empty half
        for z in range(Z):
            plane = np.zeros((Y, X), np.uint16)
            plane[: Y // 2] = (rng.random((Y // 2, X)) * 900 + 400).astype(
                np.uint16
            )
            write_tiff(os.path.join(raw_dir, f"Z{z:04d}.tif"), plane)

    make_brain("brainA", 0)

    weights = os.path.join(tmp, "weights.npz")
    save_params_npz(
        weights, init_params(jax.random.PRNGKey(0), BasicUNetConfig())
    )

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
                "model_location": weights,
                "output_location": "02_blob_detection/output/",
                "window_dimensions": {
                    "window_dim_0": 96,
                    "window_dim_1": 96,
                    "window_dim_2": 64,
                },
                "precision": "auto",  # fast on TPU
            },
            "postprocessing": {
                "input_location": "02_blob_detection/output/",
                "output_location": "03_postprocessing/output/",
            },
            "FLAGS": {
                "TEST_TIME_AUGMENTATION": False,
                "ATLAS_ALIGNMENT": False,
                "REGION_ASSIGNMENT": False,
                "VISUALIZATION": False,
            },
        }
    )
    # cold run (brainA): includes stage-2 compile (~20-40 s, amortized away
    # on terabyte production brains)
    timer_cold = run_pipeline(cfg)

    def spans(t):
        return (
            t.spans.get("mask_downsample", 0.0),
            t.spans.get("blob_detection", 0.0),
            t.spans.get("postprocessing", 0.0),
        )

    # warm runs: one fresh brain per run (stages skip finished brains), so
    # each span is one brain at steady state. Min-of-3 because this host
    # serves first-touch pages with time-varying latency (5-130 ms/MB
    # observed; snapshot-restore page backing) — a single warm run can be
    # dominated by page-fault stalls that say nothing about the code.
    warm = []
    for i, name in enumerate(("brainB", "brainC", "brainD")):
        make_brain(name, i + 1)
        warm.append(spans(run_pipeline(cfg)))

    c1, c2, c3 = spans(timer_cold)
    s1, s2, s3 = (min(w[k] for w in warm) for k in range(3))
    total = s1 + s2 + s3
    print(
        json.dumps(
            {
                "shape": list(shape),
                "voxels": Z * Y * X,
                "stage1_s": round(s1, 2),
                "stage2_s": round(s2, 2),
                "stage3_s": round(s3, 2),
                "stage2_cold_s": round(c2, 2),
                "pipeline_gvox_s": round(Z * Y * X / total / 1e9, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
