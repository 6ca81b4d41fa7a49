"""Out-of-core streaming inference: host→HBM z-slab pipeline.

The reference keeps terabyte volumes on disk and accumulates into memmapped
float16 buffers with per-batch host↔device round trips
(reference: inference/inference.py:229-265, SURVEY.md §5.7). This engine
replaces that with slab streaming: a contiguous run of window-grid z-rows is
uploaded to HBM, all (TTA) passes accumulate on device, the overlap tail
that the next slab will also touch is carried forward **on device**, and
only finalized mean-logit/binary chunks return to the host. Peak device
memory is one slab (input + f32 accumulator + count), independent of volume
size.

Binarization erodes per finalized chunk with ``border_value=1`` — the same
block-local semantics as the reference's per-Arrayterator-block erosion
(inference/inference.py:53,75-84), where block cuts never erode inward.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import (
    SlidingWindowConfig,
    _DensePlan,
    _dense_applicable,
    _divide,
    _importance_for,
    _infer_accumulate_pass,
    _infer_dense,
    _pad_to_batches,
    _skip_accumulate_pass,
    _to_batched,
    _tta_passes,
    _window_maxes,
    scan_interval,
    _dim_starts,
)
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig
from delivr_cfos_tpu.ops.morphology import binary_erosion_cross


def resume_signature(
    cfg, volume_shape, out_shape, slab_z_starts: int, batch: int
) -> dict:
    """The resume sidecar's config signature. Every config field that
    changes finalized output bytes must be here, or a resume after a config
    edit silently mixes semantics across z (e.g. gaussian-blended slabs
    followed by uniform-averaged ones).

    ``batch`` is the RESOLVED window batch (``cfg.batch_size`` or the
    auto_batch_size result), not the config field: with TTA noise on, the
    dense path derives noise keys per forward chunk, and the chunk partition
    depends on the batch — so two hosts whose auto-sizing differs draw
    different noise and must not share a resume seam. ``dense_overlap_add``
    is included because the dense and loop paths sum the same f32 addends in
    different orders (last-ulp logit differences can flip threshold-straddling
    voxels across the seam)."""
    return {
        "dense_overlap_add": cfg.dense_overlap_add,
        "batch": batch,
        "roi": list(cfg.roi),
        "overlap": cfg.overlap,
        "tta": cfg.tta,
        "slab_z_starts": slab_z_starts,
        "shape": list(volume_shape),
        "out_shape": list(out_shape),
        "importance": cfg.importance,
        "importance_sigma_scale": cfg.importance_sigma_scale,
        "threshold": cfg.threshold,
        "erosion_iters": cfg.erosion_iters,
        "background_threshold": cfg.background_threshold,
        "tta_noise_std": cfg.tta_noise_std,
        "seed": cfg.seed,
    }


class _SlabLoader:
    """One-slab-ahead loader: the host slice copy (memmap/disk read) and,
    when ``to_device``, the host→device upload run on a worker thread so
    they overlap the previous slab's compute. One thread per slab (slabs
    are seconds of work; thread startup is microseconds), daemonized so an
    exception escaping the compute loop never blocks interpreter exit on a
    half-finished upload."""

    def __init__(self, volume, to_device: bool):
        self._volume = volume
        self._to_device = to_device
        self._thread = None
        self._out = None
        self._err = None

    def _load(self, z0: int, z1: int):
        try:
            slab = np.ascontiguousarray(self._volume[z0:z1])
            dev = jax.device_put(slab) if self._to_device else None
            self._out = (slab, dev)
        except BaseException as e:  # re-raised on the caller's thread
            self._err = e

    def start(self, z0: int, z1: int):
        import threading

        assert self._thread is None, "previous slab not taken"
        self._thread = threading.Thread(
            target=self._load, args=(z0, z1), daemon=True
        )
        self._thread.start()

    def take(self):
        self._thread.join()
        self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        out, self._out = self._out, None
        return out


class _OrderedWorker:
    """Runs submitted thunks one at a time, in order, on daemon threads.
    ``submit`` first joins the previous thunk (≤1 outstanding — natural
    backpressure) and re-raises its error on the caller's thread."""

    def __init__(self):
        self._thread = None
        self._err = None

    def submit(self, fn):
        import threading

        self.join_current()

        def run():
            try:
                fn()
            except BaseException as e:
                self._err = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def join_current(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def infer_volume_streaming(
    params,
    volume,
    cfg: SlidingWindowConfig = SlidingWindowConfig(),
    model_cfg: BasicUNetConfig = BasicUNetConfig(),
    slab_z_starts: int = 4,
    binary_out: np.ndarray | None = None,
    logits_out: np.ndarray | None = None,
    sigmoid_out: np.ndarray | None = None,
    out_shape: tuple | None = None,
    resume_state_path: str | None = None,
    mesh=None,
    mesh_axis: str = "sp",
    prefetch: bool = True,
):
    """Stream a (Z, Y, X) array-like (typically an np.memmap) through the
    sliding-window engine in z-slabs of ``slab_z_starts`` window rows.

    Writes finalized chunks into ``binary_out``/``logits_out``/``sigmoid_out``
    (each shaped ``out_shape``; typically disk memmaps — this is the
    out-of-core contract: no full-volume host float32 buffer ever exists,
    matching the discipline of the reference's memmap accumulators,
    inference/inference.py:240-247, without its per-batch host round trips).
    ``logits_out``/``sigmoid_out`` may be None to skip that output.
    Returns (binary_out, logits_out).

    ``out_shape`` crops the outputs to the real (unpadded) stack extent
    (stage-1 pads Y/X up to the crop size and the contract is that outputs
    cover only the real voxels). Binarization then matches the in-HBM path's
    crop-then-binarize semantics bit-for-bit: the mask erosion for a
    finalized chunk is computed with ``erosion_iters`` planes of z-context
    read from ``volume`` on either side, so chunk cuts erode exactly like the
    whole-volume erosion does.

    Volume must be at least roi-sized (the pipeline's stage-1 padding
    guarantees this, downsample_and_mask.py:392-397).

    ``mesh``: optional ``jax.sharding.Mesh`` — each slab's window passes
    then run z-sharded across the mesh (parallel/sharded_inference.py), so
    volumes larger than one chip's HBM use every chip: the slab pipeline
    streams host→mesh, halo exchange rides ICI inside each slab, and only
    finalized chunks return to the host.

    ``prefetch``: double-buffered IO pipeline, both directions. The next
    slab's host slice (a memmap/disk read for out-of-core volumes) and its
    host→device upload run on a loader thread, and each finalized chunk's
    D2H readback + erosion-context upload + memmap writes run on an ordered
    writer thread — IO rides behind compute instead of serializing with it
    (the reference's per-batch host round trips serialize everything,
    inference/inference.py:229-265). Identical output by construction: the
    threads only move WHERE the same transfers happen; the resume sidecar
    still advances only after its chunk's bytes are written. Costs one
    extra input slab of device memory (uint16 input, ~12% on top of the
    two f32 accumulators) plus one finalized chunk held one slab longer.

    ``resume_state_path``: shard-level resume (SURVEY.md §5.4 — the reference
    only resumes at brain granularity, __main__.py:124-142). A sidecar JSON
    records the next slab after every finalized chunk; on restart the engine
    recomputes only the trailing slabs whose windows still reach the
    finalized frontier (usually one — more only near a clamped tail start)
    to regenerate the on-device overlap carry — their outputs are already on
    disk — and continues. A config mismatch in the sidecar restarts from
    scratch.
    """
    roi = tuple(cfg.roi)
    z_img, y_img, x_img = volume.shape
    assert all(volume.shape[i] >= roi[i] for i in range(3)), "volume < roi"
    if out_shape is None:
        out_shape = volume.shape
    real_z, real_y, real_x = out_shape
    interval = scan_interval(volume.shape, roi, cfg.overlap)
    z_starts = _dim_starts(z_img, roi[0], interval[0])
    if binary_out is None:
        binary_out = np.empty(out_shape, np.uint8)

    passes = _tta_passes(cfg)
    # TTA noise keys are derived per (slab, pass) by fold_in — NOT by
    # sequential splitting — so a resumed run draws exactly the noise an
    # uninterrupted run would have drawn for the remaining slabs (the resume
    # bit-identity test covers tta=True because of this)
    base_key = jax.random.PRNGKey(cfg.seed)
    noise_std = jnp.asarray(cfg.tta_noise_std, jnp.float32)
    imp = _importance_for(cfg)
    cnt_dtype = jnp.float32 if imp is not None else jnp.int32
    from delivr_cfos_tpu.engine.sliding_window import auto_batch_size

    batch = cfg.batch_size or auto_batch_size(roi, model_cfg)

    carry_acc = None  # device arrays carrying the overlap tail
    carry_cnt = None
    carry_z0 = 0  # global z of the carry's first plane
    finalized = 0  # global z up to which output is written

    n_slabs = -(-len(z_starts) // slab_z_starts)

    # ---- shard-level resume ------------------------------------------------
    import json
    import os

    state_sig = resume_signature(
        cfg, volume.shape, out_shape, slab_z_starts, batch
    )
    start_slab = 0
    regen_before_slab = 0  # slabs < this recompute only to rebuild the carry
    if resume_state_path and os.path.exists(resume_state_path):
        try:
            with open(resume_state_path) as f:
                state = json.load(f)
            if state.get("sig") == state_sig and 0 < state.get("next_slab", 0) < n_slabs:
                next_slab = state["next_slab"]
                finalized = int(state["finalized"])
                # regenerate every slab containing a window that still
                # contributes at or above `finalized` (start + roi_z >
                # finalized). For stride-regular grids that is exactly one
                # slab back when (roi_z − stride) ≤ slab_z_starts·stride, but
                # the clamped final start can pull slab boundaries arbitrarily
                # close together, letting a window reach past TWO boundaries
                # — so derive the regen depth from the actual grid.
                k = int(
                    np.searchsorted(z_starts, finalized - roi[0], side="right")
                )
                start_slab = min(k // slab_z_starts, next_slab - 1)
                regen_before_slab = next_slab
        except (json.JSONDecodeError, KeyError):
            pass

    def _slab_bounds(i):
        sz = z_starts[i * slab_z_starts : (i + 1) * slab_z_starts]
        return sz[0], sz[-1] + roi[0]  # exclusive

    # the mesh path hands the HOST slab to sharded_accumulate (which shards
    # it across the mesh itself) — a single-device upload would be dead work
    to_device = mesh is None
    loader = _SlabLoader(volume, to_device) if prefetch else None
    writer = _OrderedWorker() if prefetch else None
    if loader is not None and start_slab < n_slabs:
        loader.start(*_slab_bounds(start_slab))

    # erosion context from DEVICE-resident planes: each finalize needs
    # input>0 over [write_lo−E, write_hi+E) — the slab already holds all of
    # it except the E planes below slab_z0, which the previous slab carries
    # forward (like acc/cnt). Re-slicing the context from the host volume
    # instead would re-upload ~the whole input a second time (measured ~39%
    # of streaming wall on the 30 MB/s rig; on PCIe hosts it halves the
    # stage-2 input traffic). Bit-identical: the device slices hold exactly
    # the bytes the host slices would.
    E = cfg.erosion_iters
    # device planes [max(slab_z0−E, 0), slab_z0), y/x-cropped; chained
    # slab-to-slab so any E is covered
    ero_carry = None
    # top context: ctx_hi ≤ next_z0+E must stay inside the slab, whose
    # margin above next_z0 is ≥ roi_z − stride_z for every slab shape
    ero_on_device = to_device and E <= roi[0] - interval[0]

    for slab_i in range(start_slab, n_slabs):
        starts_z = z_starts[slab_i * slab_z_starts : (slab_i + 1) * slab_z_starts]
        slab_z0 = starts_z[0]
        slab_z1 = starts_z[-1] + roi[0]  # exclusive
        if loader is not None:
            slab, slab_dev = loader.take()
            if slab_i + 1 < n_slabs:
                loader.start(*_slab_bounds(slab_i + 1))
        else:
            slab = np.ascontiguousarray(volume[slab_z0:slab_z1])
            slab_dev = jnp.asarray(slab) if to_device else None

        # local window grid for this slab
        ys = _dim_starts(y_img, roi[1], interval[1])
        xs = _dim_starts(x_img, roi[2], interval[2])
        starts = np.array(
            [(z - slab_z0, yy, xx) for z in starts_z for yy in ys for xx in xs],
            dtype=np.int32,
        )

        acc = jnp.zeros(slab.shape, jnp.float32)
        cnt = jnp.zeros(slab.shape, cnt_dtype)
        if carry_acc is not None:
            # carry covers [carry_z0, slab_z1_prev); add into this slab's head
            off = carry_z0 - slab_z0
            assert off >= 0
            acc = acc.at[off : off + carry_acc.shape[0]].add(carry_acc)
            cnt = cnt.at[off : off + carry_cnt.shape[0]].add(carry_cnt)

        if mesh is not None:
            # mesh-sharded slab passes: the slab's own window grid equals
            # its rows of the global grid (stride-aligned starts; the final
            # slab reproduces the clamped start), so sharded_accumulate on
            # the slab is exactly the single-device slab computation
            from delivr_cfos_tpu.parallel.sharded_inference import (
                sharded_accumulate,
            )

            acc_s, cnt_s = sharded_accumulate(
                mesh,
                params,
                slab,
                cfg,
                model_cfg,
                mesh_axis,
                key=jax.random.fold_in(base_key, slab_i),
            )
            acc = acc + acc_s
            cnt = cnt + cnt_s
        else:
            # host-side background scheduling for this slab
            starts_padded, _ = _pad_to_batches(starts, batch)
            maxes = np.asarray(
                _window_maxes(
                    slab_dev, jnp.asarray(starts_padded), roi=roi, batch=batch
                )
            )[: starts.shape[0]]
            active_mask = maxes > cfg.background_threshold
            slab_key = jax.random.fold_in(base_key, slab_i)

            # dense phase-sum accumulate for the slab's grid when the
            # stride decomposition applies (the slab's local z starts are
            # stride-regular rows of the global grid, so _DensePlan applies
            # per slab exactly as it does per volume)
            plan = None
            if cfg.dense_overlap_add and _dense_applicable(roi, interval):
                plan = _DensePlan(
                    [[z - slab_z0 for z in starts_z], list(ys), list(xs)],
                    roi,
                    interval,
                )
            if plan is not None:
                acc, cnt = _infer_dense(
                    params,
                    slab_dev,
                    acc,
                    cnt,
                    starts,
                    active_mask,
                    plan,
                    slab_key,
                    cfg,
                    passes,
                    batch,
                    roi,
                    model_cfg,
                    imp,
                )
            else:
                active = starts[active_mask]
                skipped = starts[~active_mask]
                if skipped.shape[0]:
                    sk_nb, sk_valid_nb = _to_batched(
                        skipped,
                        batch,
                        len(passes),
                        bucket=cfg.bucket_scan_lengths,
                    )
                    acc, cnt = _skip_accumulate_pass(
                        acc, cnt, sk_nb, sk_valid_nb, roi=roi, imp=imp
                    )
                if active.shape[0]:
                    act_nb, valid_nb = _to_batched(
                        active, batch, bucket=cfg.bucket_scan_lengths
                    )
                    for pass_i, (use_noise, flip_axis) in enumerate(passes):
                        sub = jax.random.fold_in(slab_key, pass_i)
                        acc, cnt = _infer_accumulate_pass(
                            params,
                            slab_dev,
                            acc,
                            cnt,
                            act_nb,
                            valid_nb,
                            sub,
                            noise_std,
                            roi=roi,
                            flip_axis=flip_axis,
                            use_noise=use_noise,
                            model_cfg=model_cfg,
                            imp=imp,
                        )

        # finalized region: [finalized, next_slab_first_start) — voxels below
        # the next slab's first window start receive no further contributions
        if slab_i + 1 < n_slabs:
            next_z0 = z_starts[(slab_i + 1) * slab_z_starts]
        else:
            next_z0 = z_img
        fin_hi = next_z0 - slab_z0
        if slab_i < regen_before_slab:
            # resume: this slab's outputs are already on disk; it ran only to
            # regenerate the overlap carry for the slabs past the frontier
            finalized = next_z0
        else:
            fin_lo = finalized - slab_z0
            mean = _divide(acc[fin_lo:fin_hi], cnt[fin_lo:fin_hi])
            # crop the write to the real (unpadded) extent
            write_lo, write_hi = finalized, min(next_z0, real_z)

            def _finalize_job(
                mean=mean,
                write_lo=write_lo,
                write_hi=write_hi,
                next_slab=slab_i + 1,
                fin_z=next_z0,
                slab_dev=slab_dev,
                slab_z0=slab_z0,
                ero_carry=ero_carry,
            ):
                if write_hi > write_lo:
                    mean_c = mean[: write_hi - write_lo, :real_y, :real_x]
                    if logits_out is not None:
                        logits_out[write_lo:write_hi] = np.asarray(mean_c)
                    seg = (
                        jax.nn.sigmoid(mean_c) >= cfg.threshold
                    ).astype(jnp.uint8)
                    if sigmoid_out is not None:
                        sigmoid_out[write_lo:write_hi] = np.asarray(
                            jax.nn.sigmoid(mean_c), np.float32
                        )
                    # mask erosion with erosion_iters planes of z-context on
                    # each side: bit-identical to eroding the whole real
                    # volume at once (cross erosion after E iterations only
                    # sees the L1-ball of radius E; context borders ≥E planes
                    # away cannot influence the written chunk, and
                    # border_value=1 at real borders matches the whole-volume
                    # computation)
                    ctx_lo = max(write_lo - E, 0)
                    ctx_hi = min(write_hi + E, real_z)
                    if ero_on_device:
                        lo_off = ctx_lo - slab_z0
                        body = slab_dev[
                            max(lo_off, 0) : ctx_hi - slab_z0,
                            :real_y,
                            :real_x,
                        ]
                        if lo_off < 0:
                            # planes below this slab come from the carry
                            input_ctx = jnp.concatenate(
                                [ero_carry[lo_off:], body], axis=0
                            )
                        else:
                            input_ctx = body
                    else:
                        input_ctx = jnp.asarray(
                            np.ascontiguousarray(
                                volume[ctx_lo:ctx_hi, :real_y, :real_x]
                            )
                        )
                    mask = binary_erosion_cross(input_ctx > 0, E)[
                        write_lo
                        - ctx_lo : write_lo
                        - ctx_lo
                        + (write_hi - write_lo)
                    ]
                    binary_out[write_lo:write_hi] = np.asarray(seg * mask)
                # the sidecar advances only AFTER this chunk's bytes are
                # written (job ordering preserves the resume invariant)
                if resume_state_path:
                    with open(resume_state_path, "w") as f:
                        json.dump(
                            {
                                "sig": state_sig,
                                "next_slab": next_slab,
                                "finalized": fin_z,
                            },
                            f,
                        )

            if writer is not None:
                # D2H readback + erosion context + memmap writes overlap the
                # next slab's upload and compute (ordered, ≤1 outstanding —
                # natural backpressure)
                writer.submit(_finalize_job)
            else:
                _finalize_job()
            finalized = next_z0

        # carry the tail [next_z0, slab_z1) forward on device
        if slab_i + 1 < n_slabs:
            carry_acc = acc[fin_hi:]
            carry_cnt = cnt[fin_hi:]
            carry_z0 = next_z0
            if ero_on_device:
                # erosion context below the next slab: planes
                # [max(next_z0−E, 0), next_z0) from this slab (+ the current
                # carry for any depth below slab_z0)
                lo = max(next_z0 - E, 0)
                body = slab_dev[
                    max(lo, slab_z0) - slab_z0 : next_z0 - slab_z0,
                    :real_y,
                    :real_x,
                ]
                if lo < slab_z0:
                    if ero_carry is None:
                        # resume: the regenerated slab has no carry chain —
                        # fetch the missing planes below it from the host
                        # volume (the same bytes the chain would hold)
                        ero_carry = jnp.asarray(
                            np.ascontiguousarray(
                                volume[lo:slab_z0, :real_y, :real_x]
                            )
                        )
                    ero_carry = jnp.concatenate(
                        [ero_carry[lo - slab_z0 :], body], axis=0
                    )
                else:
                    ero_carry = body
        else:
            carry_acc = carry_cnt = None

    if writer is not None:
        writer.join_current()

    # completed: drop the resume sidecar so a later forced re-run starts clean
    if resume_state_path and os.path.exists(resume_state_path):
        os.remove(resume_state_path)

    return binary_out, logits_out
