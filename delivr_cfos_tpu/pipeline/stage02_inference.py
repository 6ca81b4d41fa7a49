"""Stage 2 — UNet blob detection over the masked volume.

TPU-native rebuild of ``run_inference`` (reference: inference/inference.py:113-332):
the VRAM-sized torch DataParallel sliding window becomes the HBM-resident
engine in engine/sliding_window.py. Output contract matches the reference:

    {blob_output}/{mouse}/binary_segmentations/binaries.npy   uint8 (Z, Y, X)
    {blob_output}/{mouse}/binary_segmentations/network_output.npy
        float32 sigmoid outputs, only when FLAGS.SAVE_ACTIVATED_OUTPUT
        (reference: inference.py:315-319, create_nifti_seg :41-44)

Weights may be the reference torch .tar checkpoint or framework .npz.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig
from delivr_cfos_tpu.models.convert import load_weights
from delivr_cfos_tpu.ops.morphology import binarize_logits
from delivr_cfos_tpu.utils.io.npy import open_memmap
from delivr_cfos_tpu.utils.logging import log


def resolve_model_config(bd, params) -> tuple[BasicUNetConfig, str]:
    """Build the model config the production pipeline runs with, honoring
    ``blob_detection.precision`` ('fast' | 'parity' | 'auto'). This is the
    config analog of the reference's in-config perf controls
    (reference: config.json:24-28, inference.py:171-187).

    Returns (model_cfg, resolved_mode). 'auto' resolves to 'fast' on TPU
    and 'parity' elsewhere. Fast mode selects the channels-sublane Pallas
    conv path on TPU; off-TPU it keeps the XLA lowering (the Pallas
    interpreter is a correctness tool, not a fast path)."""
    import dataclasses

    import jax

    from delivr_cfos_tpu.models.basic_unet import infer_model_config

    base = infer_model_config(params)
    mode = (getattr(bd, "precision", "auto") or "auto").lower()
    backend = jax.default_backend()
    if mode == "auto":
        mode = "fast" if backend == "tpu" else "parity"
    if mode not in ("fast", "parity"):
        raise ValueError(
            f"blob_detection.precision must be 'fast', 'parity' or 'auto', "
            f"got {mode!r}"
        )
    if mode == "parity":
        return base, mode
    return (
        dataclasses.replace(
            base,
            compute_dtype=jnp.bfloat16,
            precision="default",
            conv_impl="pallas_cs" if backend == "tpu" else "xla3d",
        ),
        mode,
    )


def run_inference(
    cfg: PipelineConfig,
    mouse_name: str,
    stack_shape: tuple,
    params=None,
    model_cfg: BasicUNetConfig | None = None,
    mesh=None,
) -> str:
    """Returns the session path ({blob_output}/{mouse})."""
    bd = cfg.blob_detection
    input_path = os.path.join(
        bd.input_location, mouse_name, "masked_niftis", "masked_nifti.npy"
    )
    session_path = os.path.join(bd.output_location, mouse_name)
    binaries_path = os.path.join(session_path, "binary_segmentations")
    os.makedirs(binaries_path, exist_ok=True)

    if params is None:
        log("Loading weights", bd.model_location)
        params = load_weights(bd.model_location)
    if model_cfg is None:
        model_cfg, precision_mode = resolve_model_config(bd, params)
        log(f"Model precision mode: {precision_mode} ({model_cfg.conv_impl})")

    volume = np.load(input_path, mmap_mode="r")[0, 0]
    real_z, real_y, real_x = stack_shape[2:]

    sw_cfg = SlidingWindowConfig(
        roi=bd.window_dimensions.zyx,
        overlap=0.5,  # reference: inference.py:125
        tta=cfg.FLAGS.TEST_TIME_AUGMENTATION,
        importance=getattr(bd, "importance", "constant") or "constant",
        erosion_iters=getattr(bd, "erosion_iters", 30),
    )
    # whole-volume-in-HBM vs z-slab streaming, following the reference's
    # LOAD_ALL_RAM semantics (inference.py:240-247) plus a hard size guard:
    # input + f32 accumulator + i32 count ≈ 10 bytes/voxel must fit on device
    # alongside the window batch (HBM limit from the device, like the
    # reference's free-VRAM query, inference.py:171-176)
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        device_bytes = int(stats.get("bytes_limit", 0)) or 16 * 2**30
    except Exception:
        device_bytes = 16 * 2**30
    device_bytes = int(device_bytes * 0.75)
    whole_volume_ok = cfg.FLAGS.LOAD_ALL_RAM and volume.size * 10 < device_bytes

    # optional multi-chip spatial sharding (BASELINE config 5: the full
    # pipeline sharded across chips; replaces the reference's DataParallel
    # window scatter, inference.py:217-219). A caller-provided ``mesh``
    # (the runner's per-slice submesh when dcn_slices > 1) takes priority;
    # single-device submeshes mean "this slice, no spatial sharding".
    if mesh is not None:
        if mesh.devices.size > 1:
            log(f"Spatial sharding over caller mesh ({mesh.devices.size} chips)")
        else:
            mesh = None
    elif bd.spatial_shards > 1:
        import jax

        n_dev = len(jax.devices())
        if n_dev >= bd.spatial_shards:
            from delivr_cfos_tpu.parallel.mesh import make_mesh

            mesh = make_mesh({"sp": bd.spatial_shards})
            log(f"Spatial sharding over {bd.spatial_shards} chips")
        else:
            log(
                f"WARNING: spatial_shards={bd.spatial_shards} but only "
                f"{n_dev} devices — running single-chip"
            )
    log(
        f"Inference for {mouse_name}: padded {volume.shape}, "
        f"real ({real_z}, {real_y}, {real_x}), tta={sw_cfg.tta}, "
        f"mode={'hbm' if whole_volume_ok else 'streaming'}"
    )
    resume_path = os.path.join(binaries_path, "streaming_resume.json")
    binaries_file = os.path.join(binaries_path, "binaries.npy")
    activated_file = os.path.join(binaries_path, "network_output.npy")
    # a live resume sidecar means a partially streamed binaries.npy is on
    # disk — reopen it in place so the finished chunks survive the resume
    resuming = os.path.exists(resume_path) and os.path.exists(binaries_file)
    out = open_memmap(
        binaries_file,
        shape=(real_z, real_y, real_x),
        dtype=np.uint8,
        mode="r+" if resuming else "w+",
    )
    activated = None
    if cfg.FLAGS.SAVE_ACTIVATED_OUTPUT:
        os.makedirs(os.path.join(session_path, "network_outputs"), exist_ok=True)
        activated = open_memmap(
            activated_file,
            shape=(real_z, real_y, real_x),
            dtype=np.float32,
            mode="r+" if resuming and os.path.exists(activated_file) else "w+",
        )

    if whole_volume_ok:
        if mesh is not None:
            from delivr_cfos_tpu.parallel.sharded_inference import (
                sharded_infer_volume,
            )

            mean_logits = sharded_infer_volume(
                mesh, params, np.asarray(volume), sw_cfg, model_cfg
            )
        else:
            mean_logits, _ = infer_volume(
                params, np.asarray(volume), sw_cfg, model_cfg, return_binary=False
            )
        logits_real = mean_logits[:real_z, :real_y, :real_x]
        # binarization over the REAL (unpadded) extent, reference create_nifti_seg
        input_real = jnp.asarray(volume[:real_z, :real_y, :real_x])
        if activated is not None:
            import jax.nn

            activated[:] = np.asarray(jax.nn.sigmoid(logits_real), np.float32)
        out[:] = np.asarray(
            binarize_logits(
                logits_real,
                input_real,
                threshold=sw_cfg.threshold,
                erosion_iters=sw_cfg.erosion_iters,
            )
        )
        # a brain interrupted mid-stream and later completed in-HBM would
        # otherwise leave the streaming sidecar behind, making the runner's
        # skip check (binaries exist AND no sidecar) re-run it every launch
        if os.path.exists(resume_path):
            os.remove(resume_path)
    else:
        # out-of-core: finalized chunks stream straight into the disk
        # memmaps; no full-volume host float32 buffer is ever allocated
        # (reference discipline: memmap accumulators, inference.py:240-247)
        from delivr_cfos_tpu.engine.streaming import infer_volume_streaming

        infer_volume_streaming(
            params,
            volume,
            sw_cfg,
            model_cfg,
            binary_out=out,
            sigmoid_out=activated,
            out_shape=(real_z, real_y, real_x),
            resume_state_path=resume_path,
            mesh=mesh,
        )

    if activated is not None:
        activated.flush()
        del activated
    out.flush()
    del out
    log("Blob detection finished", mouse_name)
    return session_path


def run_inference_from_nifti(
    nifti_path: str,
    weights_path: str,
    output_binaries_path: str,
    tta: bool = False,
    window: tuple = (96, 96, 64),
    threshold: float = 0.5,
) -> np.ndarray:
    """Convenience variant of the reference's legacy NIfTI loader
    (reference: inference/inference_nifti_load.py — loads a whole .nii into
    RAM instead of the memmapped npy): read a NIfTI volume (reference axis
    convention, filehandling.py:24-35), run sliding-window inference, write
    binaries as .npy. Returns the binary volume."""
    from delivr_cfos_tpu.models.basic_unet import infer_model_config
    from delivr_cfos_tpu.utils.io.nifti import read_nifti

    params = load_weights(weights_path)
    model_cfg = infer_model_config(params)
    vol = np.ascontiguousarray(
        np.transpose(np.asarray(read_nifti(nifti_path)), (2, 0, 1))
    ).astype(np.uint16)  # (y, x, z) → (z, y, x)
    sw_cfg = SlidingWindowConfig(roi=window, tta=tta, threshold=threshold)
    _, binaries = infer_volume(params, vol, sw_cfg, model_cfg)
    binaries = np.asarray(binaries)
    if output_binaries_path:
        mm = open_memmap(output_binaries_path, shape=binaries.shape, dtype=np.uint8)
        mm[:] = binaries
        mm.flush()
    return binaries
