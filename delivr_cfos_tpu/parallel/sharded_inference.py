"""Multi-chip sliding-window inference: spatial sharding + halo exchange.

The TPU-native replacement for the reference's ``torch.nn.DataParallel``
window scatter (reference: inference/inference.py:217-219) and the direct
realization of SURVEY.md §2.3/§5.7: the volume is sharded along z across a
1-D ``'sp'`` mesh axis; each chip owns a contiguous z-slab in HBM, receives a
``roi_z − stride_z`` input halo from its right neighbor over ICI
(``ppermute``), computes every window whose start lies in its slab, and
returns its slab's accumulated logits after pushing the boundary strip that
spills into the neighbor's slab back over ICI. No host round-trips.

Sharding-validity requirements (asserted): ``Z % (n_sp · stride_z) == 0`` and
``(Z − roi_z) % stride_z == 0`` so the global window grid has no clamped
z-starts and every device computes an identical static window count (windows
past the last valid global start are masked, keeping the program SPMD).

Background windows follow the reference semantics (constant −1000 logits,
sliding_window_inferer.py:197-202) via a per-window select on the window max.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from delivr_cfos_tpu.engine.sliding_window import (
    SKIP_LOGIT,
    SlidingWindowConfig,
    _dim_starts,
    _tta_passes,
    scan_interval,
)
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, basic_unet_apply


def _local_starts(zloc, y, x, roi, interval):
    """Static per-shard window grid: local z starts × global y/x starts."""
    zs = list(range(0, zloc, interval[0]))
    ys = _dim_starts(y, roi[1], interval[1])
    xs = _dim_starts(x, roi[2], interval[2])
    return np.array(
        [(z, yy, xx) for z in zs for yy in ys for xx in xs], dtype=np.int32
    )


def _pass_body(
    params,
    vol_local,
    key,
    *,
    mesh_axis,
    n_sp,
    z_total,
    roi,
    stride_z,
    starts,
    batch,
    flip_axis,
    use_noise,
    noise_std,
    background_threshold,
    model_cfg,
):
    """Per-device body (runs under shard_map): one full sliding-window pass
    over the local slab. Returns local (acc, cnt) of slab extent."""
    rank = jax.lax.axis_index(mesh_axis)
    zloc = vol_local.shape[0]
    # input halo: first (roi_z − stride_z) z-planes of the right neighbor
    halo_in = roi[0] - stride_z

    if halo_in > 0:
        head = vol_local[:halo_in]
        perm = [(r, r - 1) for r in range(1, n_sp)]
        halo_recv = jax.lax.ppermute(head, mesh_axis, perm)
        vol_ext = jnp.concatenate([vol_local, halo_recv], axis=0)
    else:
        vol_ext = vol_local

    ext_z = vol_ext.shape[0]
    # mark the carries as device-varying for shard_map's vma type system
    acc = jax.lax.pvary(jnp.zeros(vol_ext.shape, jnp.float32), mesh_axis)
    cnt = jax.lax.pvary(jnp.zeros(vol_ext.shape, jnp.int32), mesh_axis)

    starts_dev = jnp.asarray(starts)
    n_windows = starts.shape[0]
    n_batches = -(-n_windows // batch)
    pad = n_batches * batch - n_windows
    if pad:
        starts_dev = jnp.concatenate(
            [starts_dev, jnp.repeat(starts_dev[-1:], pad, axis=0)], axis=0
        )
    lane_valid = jnp.arange(n_batches * batch) < n_windows

    def gather(s):
        return jax.lax.dynamic_slice(vol_ext, (s[0], s[1], s[2]), roi)

    def batch_step(b, carry):
        acc, cnt, key = carry
        s = jax.lax.dynamic_slice(starts_dev, (b * batch, 0), (batch, 3))
        lv = jax.lax.dynamic_slice(lane_valid, (b * batch,), (batch,))
        # global validity: window start within the global grid
        gv = (rank * zloc + s[:, 0]) <= (z_total - roi[0])
        valid = lv & gv
        wins = jax.vmap(gather)(s).astype(jnp.float32)
        maxes = jnp.max(wins.reshape(batch, -1), axis=1)
        active = maxes > background_threshold
        x = wins
        if use_noise:
            key, sub = jax.random.split(key)
            x = x + jax.random.normal(sub, x.shape, jnp.float32) * noise_std
        x = x[..., None]
        if flip_axis is not None:
            x = jnp.flip(x, axis=flip_axis + 1)
        logits = basic_unet_apply(params, x, model_cfg)
        if flip_axis is not None:
            logits = jnp.flip(logits, axis=flip_axis + 1)
        contrib = jnp.where(
            active[:, None, None, None],
            logits[..., 0].astype(jnp.float32),
            SKIP_LOGIT,
        )
        w = valid.astype(jnp.float32)

        def acc_one(i, ac):
            a, c = ac
            si = s[i]
            pa = jax.lax.dynamic_slice(a, (si[0], si[1], si[2]), roi)
            pc = jax.lax.dynamic_slice(c, (si[0], si[1], si[2]), roi)
            a = jax.lax.dynamic_update_slice(
                a, pa + contrib[i] * w[i], (si[0], si[1], si[2])
            )
            c = jax.lax.dynamic_update_slice(
                c, pc + valid[i].astype(jnp.int32), (si[0], si[1], si[2])
            )
            return a, c

        acc, cnt = jax.lax.fori_loop(0, batch, acc_one, (acc, cnt))
        return acc, cnt, key

    acc, cnt, _ = jax.lax.fori_loop(0, n_batches, batch_step, (acc, cnt, key))

    # boundary exchange: the tail [zloc, ext_z) spills into the right
    # neighbor's slab head — send right and add
    if ext_z > zloc:
        tail_a = acc[zloc:]
        tail_c = cnt[zloc:]
        perm = [(r, r + 1) for r in range(n_sp - 1)]
        recv_a = jax.lax.ppermute(tail_a, mesh_axis, perm)
        recv_c = jax.lax.ppermute(tail_c, mesh_axis, perm)
        acc = acc[:zloc].at[: ext_z - zloc].add(recv_a)
        cnt = cnt[:zloc].at[: ext_z - zloc].add(recv_c)
    return acc, cnt


def sharded_window_pass(
    mesh: Mesh,
    params,
    volume,
    key,
    cfg: SlidingWindowConfig,
    model_cfg: BasicUNetConfig,
    flip_axis=None,
    use_noise=False,
    mesh_axis: str = "sp",
):
    """One sliding-window pass of the whole (Z, Y, X) volume sharded along z.
    Returns (acc, cnt) with the same sharding as the input volume."""
    n_sp = mesh.shape[mesh_axis]
    roi = tuple(cfg.roi)
    interval = scan_interval(volume.shape, roi, cfg.overlap)
    z, y, x = volume.shape
    assert z % (n_sp * interval[0]) == 0, (
        f"Z={z} must be divisible by n_sp*stride_z={n_sp * interval[0]}"
    )
    assert (z - roi[0]) % interval[0] == 0, "global z grid must be unclamped"
    zloc = z // n_sp
    starts = _local_starts(zloc, y, x, roi, interval)

    body = partial(
        _pass_body,
        mesh_axis=mesh_axis,
        n_sp=n_sp,
        z_total=z,
        roi=roi,
        stride_z=interval[0],
        starts=starts,
        batch=cfg.batch_size or 8,
        flip_axis=flip_axis,
        use_noise=use_noise,
        noise_std=cfg.tta_noise_std,
        background_threshold=cfg.background_threshold,
        model_cfg=model_cfg,
    )
    spec_v = P(mesh_axis, None, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), spec_v, P()),
        out_specs=(spec_v, spec_v),
    )
    return fn(params, volume, key)


def sharded_infer_volume(
    mesh: Mesh,
    params,
    volume: np.ndarray,
    cfg: SlidingWindowConfig = SlidingWindowConfig(),
    model_cfg: BasicUNetConfig = BasicUNetConfig(),
    mesh_axis: str = "sp",
):
    """Full multi-pass (TTA) sharded inference; returns mean logits as a
    device array sharded along z."""
    sharding = NamedSharding(mesh, P(mesh_axis, None, None))
    vol_dev = jax.device_put(jnp.asarray(volume), sharding)
    key = jax.random.PRNGKey(cfg.seed)

    acc_total = None
    cnt_total = None
    for use_noise, flip_axis in _tta_passes(cfg):
        key, sub = jax.random.split(key)
        acc, cnt = sharded_window_pass(
            mesh,
            params,
            vol_dev,
            sub,
            cfg,
            model_cfg,
            flip_axis=flip_axis,
            use_noise=use_noise,
            mesh_axis=mesh_axis,
        )
        acc_total = acc if acc_total is None else acc_total + acc
        cnt_total = cnt if cnt_total is None else cnt_total + cnt
    return acc_total / jnp.maximum(cnt_total, 1).astype(jnp.float32)
