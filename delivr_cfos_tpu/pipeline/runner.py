"""Pipeline orchestrator — the stage loop behind ``python -m delivr_cfos_tpu``.

Rebuild of the reference CLI (reference: __main__.py:47-240): loads the
config, creates the folder tree, runs the enabled stages in order over every
brain, emits HOOK progress lines, and applies the SAVE_* retention cleanup.
Stage-skip semantics (existence checks) match the reference, with one fix:
the reference checks for ``masked_nifti.npy`` in the blob-detection output
(never written there, so inference always re-runs, __main__.py:124); we check
``binaries.npy`` so resume actually works.
"""

from __future__ import annotations

import os
from shutil import rmtree

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.pipeline.common import get_real_size
from delivr_cfos_tpu.pipeline.stage01_downsample_mask import downsample_mask
from delivr_cfos_tpu.pipeline.stage02_inference import run_inference
from delivr_cfos_tpu.pipeline.stage03_count_blobs import count_blobs
from delivr_cfos_tpu.utils.hooks import HookEmitter
from delivr_cfos_tpu.utils.logging import StageTimer, log


def run_pipeline(cfg: PipelineConfig) -> StageTimer:
    """Run all enabled stages. Set $DELIVR_TRACE_DIR to capture a
    jax.profiler trace of the whole run (SURVEY.md §5.1 — the reference
    only has wall-clock prints; utils/profiling.py makes traces a
    first-class switch)."""
    from delivr_cfos_tpu.utils.profiling import trace

    with trace():
        return _run_pipeline(cfg)


def _run_pipeline(cfg: PipelineConfig) -> StageTimer:
    # multi-host pod launch (deploy/launch_pod.sh): join the JAX
    # distributed runtime before any device query so jax.devices() spans
    # the pod and jax.process_index() drives the per-slice brain filter
    from delivr_cfos_tpu.parallel.mesh import maybe_initialize_distributed

    if maybe_initialize_distributed():
        import jax

        log(
            f"jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.devices())} global devices"
        )
    cfg.setup_folders()
    flags = cfg.FLAGS
    n_stages = sum(
        [
            flags.MASK_DOWNSAMPLE,
            flags.BLOB_DETECTION,
            flags.POSTPROCESSING,
            flags.ATLAS_ALIGNMENT,
            flags.REGION_ASSIGNMENT,
            flags.VISUALIZATION,
        ]
    )
    hooks = HookEmitter(n_stages)
    hooks.overall()
    timer = StageTimer()

    if flags.MASK_DOWNSAMPLE:
        log("Masking")
        hooks.begin_stage()
        brain_list = sorted(os.listdir(cfg.raw_location))
        with timer.span("mask_downsample"):
            for brain_i, brain in enumerate(brain_list):
                hooks.item(brain_i, len(brain_list))
                done = os.path.join(
                    cfg.mask_detection.output_location, brain, "masked_niftis"
                )
                if os.path.exists(done):
                    log(brain, "exists, skipping...")
                    continue
                downsample_mask(cfg, brain)

    if flags.BLOB_DETECTION:
        log("Blob detection")
        hooks.begin_stage()
        batch = cfg.blob_detection.input_location or cfg.mask_detection.output_location
        mice = sorted(
            d for d in os.listdir(batch) if os.path.isdir(os.path.join(batch, d))
        )
        # per-brain DCN distribution (SURVEY.md §5.8): brains are
        # independent, so the brain loop maps across the hybrid mesh's
        # 'dp' slices — each brain's spatial sharding stays on one slice's
        # ICI. Multi-host: each host process serves its own slice
        # (jax.process_index); single-process virtual meshes serve all.
        brain_mesh = {}
        if cfg.blob_detection.dcn_slices > 1:
            import jax

            from delivr_cfos_tpu.parallel.mesh import (
                assign_brains_to_slices,
                make_hybrid_mesh,
                slice_submeshes,
            )

            n_slices = cfg.blob_detection.dcn_slices
            if len(jax.devices()) >= n_slices:
                hybrid = make_hybrid_mesh(n_slices=n_slices)
                subs = slice_submeshes(hybrid)
                per_slice = assign_brains_to_slices(len(mice), len(subs))
                my_slices = (
                    [jax.process_index() % len(subs)]
                    if jax.process_count() > 1
                    else range(len(subs))
                )
                for s in my_slices:
                    for bi in per_slice[s]:
                        brain_mesh[bi] = (s, subs[s])
                log(
                    f"Distributing {len(mice)} brains over {len(subs)} "
                    f"DCN slices ({subs[0].devices.size} chips each)"
                )
            else:
                log(
                    f"WARNING: dcn_slices={n_slices} but only "
                    f"{len(jax.devices())} devices — running undistributed"
                )
        with timer.span("blob_detection"):
            for mouse_i, mouse in enumerate(mice):
                hooks.item(mouse_i, len(mice))
                if brain_mesh and mouse_i not in brain_mesh:
                    log(mouse, "assigned to another slice/host, skipping...")
                    continue
                binaries = os.path.join(
                    cfg.blob_detection.output_location,
                    mouse,
                    "binary_segmentations",
                    "binaries.npy",
                )
                resume_sidecar = os.path.join(
                    os.path.dirname(binaries), "streaming_resume.json"
                )
                # a binaries.npy with a live resume sidecar is a partially
                # written streaming run, not a finished brain — re-enter
                # run_inference, which resumes at the recorded slab
                if os.path.exists(binaries) and not os.path.exists(resume_sidecar):
                    log(mouse, "already processed, skipping...")
                    continue
                stack_shape = (1, 1, *get_real_size(os.path.join(cfg.raw_location, mouse)))
                if brain_mesh:
                    s, sub = brain_mesh[mouse_i]
                    log(f"{mouse} → DCN slice {s}")
                    run_inference(cfg, mouse, stack_shape, mesh=sub)
                else:
                    run_inference(cfg, mouse, stack_shape)

    if flags.POSTPROCESSING:
        log("Postprocessing")
        hooks.begin_stage()
        path_in = cfg.postprocessing.input_location
        brains = sorted(os.listdir(path_in))
        with timer.span("postprocessing"):
            for brain_i, brain in enumerate(brains):
                hooks.item(brain_i, len(brains))
                stack_shape = (1, 1, *get_real_size(os.path.join(cfg.raw_location, brain)))
                count_blobs(
                    cfg,
                    path_in,
                    brain_i,
                    brain,
                    stack_shape,
                    cfg.postprocessing.min_size,
                    cfg.postprocessing.max_size,
                )

    if flags.ATLAS_ALIGNMENT:
        log("Atlas alignment")
        hooks.begin_stage()
        from delivr_cfos_tpu.pipeline.stage04_atlas_align import (
            run_registration_and_point_warp,
        )

        csvs = sorted(
            os.path.join(cfg.postprocessing.output_location, f)
            for f in os.listdir(cfg.postprocessing.output_location)
            if f.endswith(".csv")
        )
        with timer.span("atlas_alignment"):
            for brain_i, blob_csv in enumerate(csvs):
                hooks.item(brain_i, len(csvs))
                try:
                    run_registration_and_point_warp(cfg, blob_csv)
                except Exception as e:  # per-brain resilience (__main__.py:177-188)
                    log(f"Error encountered, skipping {blob_csv}: {e}")

    if flags.REGION_ASSIGNMENT:
        log("Region assignment")
        hooks.begin_stage()
        from delivr_cfos_tpu.pipeline.stage05_region_assignment import (
            map_cells_to_atlas,
        )

        with timer.span("region_assignment"):
            map_cells_to_atlas(cfg, hooks)

    if flags.VISUALIZATION:
        log("Visualization")
        hooks.begin_stage()
        from delivr_cfos_tpu.pipeline.stage06_visualization import blob_highlighter

        mice = sorted(os.listdir(cfg.visualization.input_prediction_location))
        with timer.span("visualization"):
            for brain_i, mouse in enumerate(mice):
                hooks.item(brain_i, len(mice))
                stack_shape = (1, 1, *get_real_size(os.path.join(cfg.raw_location, mouse)))
                blob_highlighter(cfg, mouse, stack_shape)

    # cleanup (reference: __main__.py:224-239)
    if flags.MASK_DOWNSAMPLE and not flags.SAVE_MASK_OUTPUT:
        log("Removing masking output...")
        rmtree(cfg.mask_detection.output_location)
    if flags.BLOB_DETECTION and not flags.SAVE_NETWORK_OUTPUT:
        log("Removing network output...")
        rmtree(cfg.blob_detection.output_location)
    if flags.POSTPROCESSING and not flags.SAVE_POSTPROCESSING_OUTPUT:
        log("Removing postprocessing output...")
        rmtree(cfg.postprocessing.output_location)
    if flags.ATLAS_ALIGNMENT and not flags.SAVE_ATLAS_OUTPUT:
        log("Removing atlas alignment output...")
        rmtree(cfg.atlas_alignment.output_location)
    log("DELIVR Done.")
    return timer
