"""Stage-2 out-of-core contract (VERDICT r1 item 3):

- streaming mode writes finalized chunks straight into the disk memmaps and
  produces binaries bit-identical to the in-HBM path (including mask-erosion
  behavior at slab cuts, exercised by a mask hole near a chunk boundary);
- no full-volume host float32 buffer is ever allocated: peak traced host
  allocations stay far below the full-volume float32 footprint.
"""

import json
import os
import tracemalloc

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.engine.streaming import infer_volume_streaming
from delivr_cfos_tpu.models import BasicUNetConfig, init_params
from delivr_cfos_tpu.ops.morphology import binarize_logits

pytestmark = pytest.mark.slow  # out-of-core slab inference

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(5), MODEL_CFG)


def _volume_with_mask_hole(z=80, y=32, x=32, real=(70, 28, 30)):
    """Padded volume whose real extent is smaller, with a zero (masked-out)
    band straddling a slab-finalization boundary so slab-local erosion
    without z-context would differ from whole-volume erosion."""
    rng = np.random.default_rng(7)
    vol = np.zeros((z, y, x), np.uint16)
    rz, ry, rx = real
    vol[:rz, :ry, :rx] = (rng.random((rz, ry, rx)) * 700 + 10).astype(np.uint16)
    # zero band near z=32 (a chunk boundary for slab_z_starts=2, stride 8)
    vol[30:34, 5:20, 5:20] = 0
    return vol, real


def test_streaming_binaries_bit_identical_to_hbm_with_crop(params):
    vol, (rz, ry, rx) = _volume_with_mask_hole()
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=False, erosion_iters=3
    )

    # in-HBM reference: crop-then-binarize (stage02 semantics)
    mean_whole, _ = infer_volume(params, vol, cfg, MODEL_CFG, return_binary=False)
    logits_real = mean_whole[:rz, :ry, :rx]
    bin_hbm = np.asarray(
        binarize_logits(
            logits_real,
            np.asarray(vol[:rz, :ry, :rx]),
            threshold=cfg.threshold,
            erosion_iters=cfg.erosion_iters,
        )
    )

    bin_stream = np.zeros((rz, ry, rx), np.uint8)
    sig_stream = np.zeros((rz, ry, rx), np.float32)
    infer_volume_streaming(
        params,
        vol,
        cfg,
        MODEL_CFG,
        slab_z_starts=2,
        binary_out=bin_stream,
        sigmoid_out=sig_stream,
        out_shape=(rz, ry, rx),
    )
    np.testing.assert_array_equal(bin_stream, bin_hbm)
    np.testing.assert_allclose(
        sig_stream, np.asarray(jax.nn.sigmoid(logits_real)), rtol=1e-5, atol=1e-6
    )


def test_stage02_streaming_mode_matches_hbm_and_bounds_host_memory(
    params, tmp_path
):
    """Drive stage-2 run_inference twice over the same brain: LOAD_ALL_RAM
    on (in-HBM) vs off (streaming). Outputs must be bit-identical and the
    streaming run's peak traced host allocation must stay well under the
    full-volume float32 footprint (the round-1 implementation allocated
    2 full volumes of f32, ~4× the input bytes)."""
    from delivr_cfos_tpu.pipeline.stage02_inference import run_inference

    ROI = (32, 32, 32)  # coarser grid keeps the CPU runtime sane
    # large enough that the full-volume f32 footprint (~8 MB) clearly
    # dominates fixed host-side overhead (~4 MB)
    Z, Y, X = 320, 80, 80  # padded extent
    rz, ry, rx = 314, 74, 78
    rng = np.random.default_rng(3)
    vol = np.zeros((Z, Y, X), np.uint16)
    vol[:rz, :ry, :rx] = (rng.random((rz, ry, rx)) * 600 + 5).astype(np.uint16)

    def make_cfg(load_all_ram, root):
        blob_root = str(root / "blob")
        mask_root = str(root / "mask")
        os.makedirs(os.path.join(mask_root, "mouse", "masked_niftis"), exist_ok=True)
        mm = np.lib.format.open_memmap(
            os.path.join(mask_root, "mouse", "masked_niftis", "masked_nifti.npy"),
            mode="w+",
            dtype=np.uint16,
            shape=(1, 1, Z, Y, X),
        )
        mm[0, 0] = vol
        mm.flush()
        del mm
        return PipelineConfig.from_dict(
            {
                "blob_detection": {
                    "input_location": mask_root,
                    "output_location": blob_root,
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

    stack_shape = (1, 1, rz, ry, rx)

    cfg_hbm = make_cfg(True, tmp_path / "hbm")
    run_inference(cfg_hbm, "mouse", stack_shape, params=params, model_cfg=MODEL_CFG)
    bin_hbm = np.load(
        os.path.join(
            cfg_hbm.blob_detection.output_location,
            "mouse",
            "binary_segmentations",
            "binaries.npy",
        )
    )

    cfg_st = make_cfg(False, tmp_path / "stream")
    tracemalloc.start()
    tracemalloc.reset_peak()
    run_inference(cfg_st, "mouse", stack_shape, params=params, model_cfg=MODEL_CFG)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    bin_st = np.load(
        os.path.join(
            cfg_st.blob_detection.output_location,
            "mouse",
            "binary_segmentations",
            "binaries.npy",
        )
    )
    np.testing.assert_array_equal(bin_st, bin_hbm)

    full_f32 = Z * Y * X * 4
    # round 1 allocated ≥2 full-volume f32 buffers; the rework must stay
    # below even one (slab-bounded host staging only)
    assert peak < full_f32, f"peak host alloc {peak} ≥ full-volume f32 {full_f32}"

    # sidecar removed on completion
    assert not os.path.exists(
        os.path.join(
            cfg_st.blob_detection.output_location,
            "mouse",
            "binary_segmentations",
            "streaming_resume.json",
        )
    )
