"""The production pipeline's fast mode must produce the same cells as parity.

VERDICT r2 item 1: the headline bench number must be reachable from
config.json — ``blob_detection.precision`` now selects the model's numerical
mode in ``run_inference`` (pipeline/stage02_inference.py:resolve_model_config)
— and fast-mode cell counts (post stage-3 semantics: connected components +
statistics) must agree with parity-mode on a synthetic brain.

Fast mode is bf16 activations with f32 conv accumulation and f32
instance-norm statistics; the only voxels that can flip in the binaries are
those whose mean logit sits within bf16 rounding of the sigmoid-0.5 cut
(reference binarization: inference/inference.py:120, create_nifti_seg :60-95).
"""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains a model in the fixture (~70 s); the bench 'cells' child covers fast-vs-parity on-chip

import jax

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.models import init_params
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig
from delivr_cfos_tpu.models.convert import save_params_npz
from delivr_cfos_tpu.pipeline.stage02_inference import (
    resolve_model_config,
    run_inference,
)

TINY = (4, 4, 8, 16, 32, 4)
REAL_SHAPE = (12, 64, 48)  # (z, y, x)
PAD_SHAPE = (16, 64, 48)  # padded to window multiples (stage-1 contract)


def _blob_stats(binaries: np.ndarray):
    """Stage-3 semantics: 26-connected components + per-blob size/centroid
    (reference: count_blobs.py:61-85)."""
    from delivr_cfos_tpu.ops.connected_components import (
        component_statistics,
        label_volume_host,
    )

    labels, n = label_volume_host(binaries)
    return n, component_statistics(labels, n)


@pytest.fixture(scope="module")
def stage2_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fastparity")
    rng = np.random.default_rng(7)
    vol = np.zeros(PAD_SHAPE, np.uint16)
    # background strictly positive: the reference's binarization re-mask is
    # binary_erosion(input > 0, 30 iters), so scattered zeros would erode
    # the whole tiny volume away (inference.py:75-84)
    real = (rng.random(REAL_SHAPE) * 300 + 10).astype(np.uint16)
    centers = []
    for _ in range(10):
        c = rng.integers((2, 5, 5), np.array(REAL_SHAPE) - (2, 5, 5))
        centers.append(c)
        real[
            c[0] - 1 : c[0] + 1, c[1] - 3 : c[1] + 3, c[2] - 3 : c[2] + 3
        ] = 50000
    vol[: REAL_SHAPE[0]] = real

    in_dir = tmp / "in" / "brainA" / "masked_niftis"
    os.makedirs(in_dir)
    np.save(in_dir / "masked_nifti.npy", vol[None, None])

    # train the tiny model to segment the bright blobs so logits are
    # decisive (saturated), as a production checkpoint's are — random-init
    # logits all hover at the sigmoid cut and the comparison is meaningless
    from delivr_cfos_tpu.training import TrainConfig, make_train_step

    tc = TrainConfig(model=BasicUNetConfig(features=TINY), learning_rate=1e-2)
    init_state, step = make_train_step(tc)
    params, opt_state = init_state()
    win_rng = np.random.default_rng(11)
    for _ in range(150):
        xs, ys = [], []
        for k in range(4):
            if k % 2 == 0:
                # half the patches centered on a blob (class balance)
                c = centers[win_rng.integers(len(centers))]
                z0 = 0
                y0 = int(np.clip(c[1] - 8, 0, PAD_SHAPE[1] - 16))
                x0 = int(np.clip(c[2] - 8, 0, PAD_SHAPE[2] - 16))
            else:
                hi = np.array(PAD_SHAPE) - 16  # may be 0 (then start is 0)
                z0, y0, x0 = win_rng.integers((0, 0, 0), hi, endpoint=True)
            patch = vol[z0 : z0 + 16, y0 : y0 + 16, x0 : x0 + 16]
            xs.append(patch.astype(np.float32))
            ys.append((patch > 10000).astype(np.float32))
        x = np.stack(xs)[..., None]
        y = np.stack(ys)[..., None]
        params, opt_state, _ = step(
            params, opt_state, jax.numpy.asarray(x), jax.numpy.asarray(y)
        )
    weights = tmp / "w.npz"
    save_params_npz(str(weights), params)

    def make_cfg(precision: str, out_name: str) -> PipelineConfig:
        return PipelineConfig.from_dict(
            {
                "raw_location": str(tmp / "raw"),
                "output_location": str(tmp),
                "blob_detection": {
                    "input_location": "in/",
                    "model_location": str(weights),
                    "output_location": out_name,
                    "window_dimensions": {
                        "window_dim_0": 16,
                        "window_dim_1": 16,
                        "window_dim_2": 16,
                    },
                    "precision": precision,
                },
                "FLAGS": {
                    "TEST_TIME_AUGMENTATION": False,
                    "SAVE_ACTIVATED_OUTPUT": True,
                },
            }
        )

    return make_cfg


def _run(make_cfg, precision: str, out_name: str):
    cfg = make_cfg(precision, out_name)
    session = run_inference(cfg, "brainA", (1, 1, *REAL_SHAPE))
    bdir = os.path.join(session, "binary_segmentations")
    return (
        np.load(os.path.join(bdir, "binaries.npy")),
        np.load(os.path.join(bdir, "network_output.npy")),
    )


def test_fast_and_parity_cell_counts_agree(stage2_setup):
    parity, sig_p = _run(stage2_setup, "parity", "out_parity/")
    fast, sig_f = _run(stage2_setup, "fast", "out_fast/")

    n_p, stats_p = _blob_stats(parity)
    n_f, stats_f = _blob_stats(fast)
    assert n_p > 0, "test setup must detect blobs in parity mode"

    # voxel-level: only logit values at the sigmoid cut may flip
    flipped_mask = parity != fast
    flipped = int(flipped_mask.sum())
    assert flipped <= max(8, int(0.001 * parity.size)), (
        f"{flipped} voxels differ between fast and parity binaries"
    )
    # PRINCIPLED flip bound (VERDICT r3 item 10, also asserted at
    # (96, 256, 256) on the chip by bench.py's "cells" child): a voxel may
    # flip only if its parity sigmoid sits within the measured
    # fast-vs-parity deviation of the 0.5 cut — bf16 rounding can only
    # reorder voxels inside its own perturbation radius
    max_dev = float(np.abs(sig_f - sig_p).max())
    if flipped:
        assert (
            np.abs(sig_p[flipped_mask] - 0.5) <= max_dev + 1e-6
        ).all(), (flipped, max_dev)
    # cell-count acceptance metric (the science-level contract)
    assert n_f == n_p, f"blob counts differ: parity={n_p} fast={n_f}"
    # centroid / size agreement (sorted by centroid for stable pairing)
    cp = np.asarray(stats_p["centroids"])
    cf = np.asarray(stats_f["centroids"])
    order_p = np.lexsort(cp.T)
    order_f = np.lexsort(cf.T)
    assert np.allclose(cp[order_p], cf[order_f], atol=1.0)
    sz_p = np.asarray(stats_p["voxel_counts"], np.int64)[order_p]
    sz_f = np.asarray(stats_f["voxel_counts"], np.int64)[order_f]
    assert abs(int(sz_p.sum()) - int(sz_f.sum())) <= max(8, int(0.02 * sz_p.sum()))


def test_resolve_model_config_modes(stage2_setup):
    params = init_params(jax.random.PRNGKey(0), BasicUNetConfig(features=TINY))

    bd = dataclasses.replace(
        PipelineConfig().blob_detection, precision="parity"
    )
    cfg, mode = resolve_model_config(bd, params)
    assert mode == "parity"
    assert cfg.precision == "highest" and cfg.conv_impl == "xla3d"

    bd = dataclasses.replace(bd, precision="fast")
    cfg, mode = resolve_model_config(bd, params)
    assert mode == "fast"
    assert cfg.compute_dtype == jax.numpy.bfloat16
    assert cfg.precision == "default"
    expected_impl = "pallas_cs" if jax.default_backend() == "tpu" else "xla3d"
    assert cfg.conv_impl == expected_impl

    bd = dataclasses.replace(bd, precision="auto")
    cfg, mode = resolve_model_config(bd, params)
    assert mode == ("fast" if jax.default_backend() == "tpu" else "parity")

    bd = dataclasses.replace(bd, precision="bogus")
    with pytest.raises(ValueError):
        resolve_model_config(bd, params)
