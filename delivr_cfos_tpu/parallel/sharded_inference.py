"""Multi-chip sliding-window inference: spatial sharding + halo exchange.

The TPU-native replacement for the reference's ``torch.nn.DataParallel``
window scatter (reference: inference/inference.py:217-219) and the direct
realization of SURVEY.md §2.3/§5.7: the volume is sharded along z across a
1-D ``'sp'`` mesh axis; each chip owns a contiguous z-slab in HBM, receives
an input halo from its right neighbor over ICI (``ppermute``), computes
every window whose start lies in its slab, and returns its slab's
accumulated logits after pushing the boundary strip that spills into the
neighbor's slab back over ICI. No host round-trips.

Arbitrary volume shapes (VERDICT r1 item 6): the volume is zero-padded in z
to ``n_sp·k·stride_z`` equal slabs, but the window grid is computed on the
ORIGINAL z extent with the reference's exact semantics — stride
``int(roi·(1−overlap))`` plus one clamped final start (MONAI
dense_patch_slices; sliding_window_inferer.py:255-276) — and distributed to
shards as data (per-shard start/valid arrays), so the padded region gets no
windows and the result is bit-compatible with the single-device engine.
The input halo is sized to the deepest window overhang (≥ roi_z−stride_z,
up to roi_z−1 when the clamped start overhangs a slab boundary).

Background windows follow the reference semantics (constant −1000 logits,
sliding_window_inferer.py:197-202) via a per-window select on the window
max.
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
    _divide,
    _tta_passes,
    scan_interval,
)
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, basic_unet_apply


def _pvary(x, axis_name):
    """Invariant→varying cast for shard_map's vma type system (pvary is
    deprecated in favor of pcast)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)


def plan_sharding(z: int, roi_z: int, stride_z: int, n_sp: int):
    """Host-side plan: padded extent, slab size, halo, and the per-shard
    assignment of the ORIGINAL (reference-semantics) z starts.

    Returns (z_pad, zloc, halo_in, shard_z_starts) where shard_z_starts[k]
    is the list of slab-local z starts owned by shard k.
    """
    quantum = n_sp * stride_z
    z_pad = -(-z // quantum) * quantum
    zloc = z_pad // n_sp
    zs_global = _dim_starts(z, roi_z, stride_z)
    shard_z_starts = [[] for _ in range(n_sp)]
    halo_in = max(roi_z - stride_z, 0)
    for zg in zs_global:
        k = min(zg // zloc, n_sp - 1)
        local = zg - k * zloc
        assert local >= 0
        overhang = local + roi_z - zloc
        halo_in = max(halo_in, min(overhang, roi_z - 1) if overhang > 0 else 0)
        shard_z_starts[k].append(local)
    # halos wider than a slab are fetched with multiple ppermute hops
    assert -(-halo_in // zloc) < n_sp or n_sp == 1, (
        f"halo {halo_in} needs ≥{-(-halo_in // zloc)} hops on a {n_sp}-way mesh"
    )
    return z_pad, zloc, halo_in, shard_z_starts


def _per_shard_starts(shard_z_starts, ys, xs, n_sp):
    """(n_sp, n_win_max, 3) int32 starts + (n_sp, n_win_max) bool valid."""
    n_z_max = max(len(s) for s in shard_z_starts)
    n_win = n_z_max * len(ys) * len(xs)
    starts = np.zeros((n_sp, max(n_win, 1), 3), np.int32)
    valid = np.zeros((n_sp, max(n_win, 1)), bool)
    for k in range(n_sp):
        rows = [
            (z, yy, xx) for z in shard_z_starts[k] for yy in ys for xx in xs
        ]
        if rows:
            starts[k, : len(rows)] = np.asarray(rows, np.int32)
            valid[k, : len(rows)] = True
    return starts, valid


def _pass_body(
    params,
    vol_local,
    starts_local,
    valid_local,
    key,
    *,
    mesh_axis,
    n_sp,
    roi,
    halo_in,
    batch,
    flip_axis,
    use_noise,
    noise_std,
    background_threshold,
    model_cfg,
    win_perm=None,
    imp=None,
):
    """Per-device body (runs under shard_map): one full sliding-window pass
    over the local slab. Returns local (acc, cnt) of slab extent.

    ``win_perm``: when the volume was rotated so a non-z axis could be
    sharded, gathered windows are rotated back to (z, y, x) around the UNet
    (the model is not transposition-symmetric) and the logits rotated
    forward again before accumulation. The perms used are self-inverse."""
    zloc = vol_local.shape[0]
    starts_dev = starts_local[0]  # (n_win, 3)
    valid_dev = valid_local[0]  # (n_win,)

    # the key arrives replicated (in_specs P()); fold the shard index in so
    # every shard draws an independent TTA noise stream — without this all
    # shards would apply the identical noise sequence to their local batches
    key = jax.random.fold_in(key, jax.lax.axis_index(mesh_axis))

    # input halo: the first halo_in z-planes to the right of this slab.
    # When the halo is wider than one slab (shallow volume on a wide mesh),
    # pull whole slabs over multiple ppermute hops and crop.
    if halo_in > 0:
        perm_pull = [(r, r - 1) for r in range(1, n_sp)]
        hops = -(-halo_in // zloc)
        pieces = [vol_local]
        buf = vol_local
        for _ in range(hops):
            buf = jax.lax.ppermute(buf, mesh_axis, perm_pull)
            pieces.append(buf)
        vol_ext = jnp.concatenate(pieces, axis=0)[: zloc + halo_in]
    else:
        vol_ext = vol_local

    ext_z = vol_ext.shape[0]
    # mark the carries as device-varying for shard_map's vma type system
    acc = _pvary(jnp.zeros(vol_ext.shape, jnp.float32), mesh_axis)
    cnt = _pvary(
        jnp.zeros(
            vol_ext.shape, jnp.float32 if imp is not None else jnp.int32
        ),
        mesh_axis,
    )

    n_windows = starts_dev.shape[0]
    n_batches = -(-n_windows // batch)
    pad = n_batches * batch - n_windows
    if pad:
        starts_dev = jnp.concatenate(
            [starts_dev, jnp.repeat(starts_dev[-1:], pad, axis=0)], axis=0
        )
        valid_dev = jnp.concatenate(
            [valid_dev, jnp.zeros((pad,), valid_dev.dtype)], axis=0
        )

    def gather(s):
        return jax.lax.dynamic_slice(vol_ext, (s[0], s[1], s[2]), roi)

    def batch_step(b, carry):
        acc, cnt, key = carry
        s = jax.lax.dynamic_slice(starts_dev, (b * batch, 0), (batch, 3))
        valid = jax.lax.dynamic_slice(valid_dev, (b * batch,), (batch,))
        wins = jax.vmap(gather)(s).astype(jnp.float32)
        maxes = jnp.max(wins.reshape(batch, -1), axis=1)
        active = maxes > background_threshold
        x = wins
        if use_noise:
            key, sub = jax.random.split(key)
            x = x + jax.random.normal(sub, x.shape, jnp.float32) * noise_std
        if win_perm is not None:
            x = jnp.transpose(x, (0,) + tuple(1 + a for a in win_perm))
        x = x[..., None]
        if flip_axis is not None:
            x = jnp.flip(x, axis=flip_axis + 1)
        logits = basic_unet_apply(params, x, model_cfg)
        if flip_axis is not None:
            logits = jnp.flip(logits, axis=flip_axis + 1)
        logits = logits[..., 0]
        if win_perm is not None:
            logits = jnp.transpose(logits, (0,) + tuple(1 + a for a in win_perm))
        logits = logits[..., None]
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
            add_a = contrib[i] * w[i]
            if imp is not None:
                add_a = add_a * imp
                add_c = imp * w[i]
            else:
                add_c = valid[i].astype(jnp.int32)
            a = jax.lax.dynamic_update_slice(
                a, pa + add_a, (si[0], si[1], si[2])
            )
            c = jax.lax.dynamic_update_slice(
                c, pc + add_c, (si[0], si[1], si[2])
            )
            return a, c

        acc, cnt = jax.lax.fori_loop(0, batch, acc_one, (acc, cnt))
        return acc, cnt, key

    acc, cnt, _ = jax.lax.fori_loop(0, n_batches, batch_step, (acc, cnt, key))

    # boundary exchange: the tail [zloc, ext_z) spills into slabs to the
    # right — piece j (one slab worth) travels j+1 hops and lands at the
    # head of that shard. Zero-fill keeps piece shapes static; ppermute
    # yields zeros at ranks with no sender, so stray adds are exact zeros.
    if ext_z > zloc:
        perm_push = [(r, r + 1) for r in range(n_sp - 1)]
        tail_a = acc[zloc:]
        tail_c = cnt[zloc:]
        acc = acc[:zloc]
        cnt = cnt[:zloc]
        hops = -(-halo_in // zloc)
        for j in range(hops):
            pa = tail_a[j * zloc : (j + 1) * zloc]
            pc = tail_c[j * zloc : (j + 1) * zloc]
            plen = pa.shape[0]
            if plen == 0:
                break
            for _ in range(j + 1):
                pa = jax.lax.ppermute(pa, mesh_axis, perm_push)
                pc = jax.lax.ppermute(pc, mesh_axis, perm_push)
            acc = acc.at[:plen].add(pa)
            cnt = cnt.at[:plen].add(pc)
    return acc, cnt


def _sharded_pass(
    mesh,
    params,
    vol_dev,
    starts,
    valid,
    key,
    cfg,
    model_cfg,
    n_sp,
    halo_in,
    flip_axis,
    use_noise,
    mesh_axis,
    win_perm=None,
    batch=8,
    imp=None,
):
    body = partial(
        _pass_body,
        mesh_axis=mesh_axis,
        n_sp=n_sp,
        roi=tuple(cfg.roi),
        halo_in=halo_in,
        batch=batch,
        flip_axis=flip_axis,
        use_noise=use_noise,
        noise_std=cfg.tta_noise_std,
        background_threshold=cfg.background_threshold,
        model_cfg=model_cfg,
        win_perm=win_perm,
        imp=imp,
    )
    spec_v = P(mesh_axis, None, None)
    spec_s = P(mesh_axis, None, None)
    spec_m = P(mesh_axis, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), spec_v, spec_s, spec_m, P()),
        out_specs=(spec_v, spec_v),
    )
    return fn(params, vol_dev, starts, valid, key)


def sharded_accumulate(
    mesh: Mesh,
    params,
    volume: np.ndarray,
    cfg: SlidingWindowConfig = SlidingWindowConfig(),
    model_cfg: BasicUNetConfig = BasicUNetConfig(),
    mesh_axis: str = "sp",
    key=None,
    win_perm=None,
):
    """All (TTA) passes of an arbitrary-shape (Z, Y, X) volume on the mesh;
    returns raw (acc, cnt) device arrays cropped to the original extent —
    the building block both for whole-volume inference and for the
    mesh-sharded slab pipeline in engine/streaming.py."""
    n_sp = mesh.shape[mesh_axis]
    roi = tuple(cfg.roi)
    z, y, x = volume.shape
    interval = scan_interval(volume.shape, roi, cfg.overlap)
    z_pad, zloc, halo_in, shard_z_starts = plan_sharding(
        z, roi[0], interval[0], n_sp
    )
    ys = _dim_starts(y, roi[1], interval[1])
    xs = _dim_starts(x, roi[2], interval[2])
    starts_np, valid_np = _per_shard_starts(shard_z_starts, ys, xs, n_sp)

    if z_pad > z:
        volume = np.concatenate(
            [volume, np.zeros((z_pad - z, y, x), volume.dtype)], axis=0
        )

    sharding = NamedSharding(mesh, P(mesh_axis, None, None))
    shard_rows = NamedSharding(mesh, P(mesh_axis, None, None))
    shard_mask = NamedSharding(mesh, P(mesh_axis, None))
    vol_dev = jax.device_put(jnp.asarray(volume), sharding)
    starts = jax.device_put(jnp.asarray(starts_np), shard_rows)
    valid = jax.device_put(jnp.asarray(valid_np), shard_mask)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    from delivr_cfos_tpu.engine.sliding_window import _importance_for

    imp = _importance_for(cfg)

    # per-shard HBM-aware batch sizing (one policy with the single-chip
    # engine, VERDICT r2 item 5): resident per chip = its slab + halo
    # extent (input + f32/i32 accumulators), capped at the shard's window
    # count so tiny shards don't pad whole batches away
    from delivr_cfos_tpu.engine.sliding_window import auto_batch_size

    ext_bytes = (zloc + halo_in) * y * x * 2
    batch = cfg.batch_size or min(
        auto_batch_size(roi, model_cfg, volume_bytes=ext_bytes),
        max(starts_np.shape[1], 1),
    )

    acc_total = None
    cnt_total = None
    for use_noise, flip_axis in _tta_passes(cfg):
        key, sub = jax.random.split(key)
        acc, cnt = _sharded_pass(
            mesh,
            params,
            vol_dev,
            starts,
            valid,
            sub,
            cfg,
            model_cfg,
            n_sp,
            halo_in,
            flip_axis,
            use_noise,
            mesh_axis,
            win_perm,
            batch=batch,
            imp=imp,
        )
        acc_total = acc if acc_total is None else acc_total + acc
        cnt_total = cnt if cnt_total is None else cnt_total + cnt
    return acc_total[:z], cnt_total[:z]


def sharded_infer_volume(
    mesh: Mesh,
    params,
    volume: np.ndarray,
    cfg: SlidingWindowConfig = SlidingWindowConfig(),
    model_cfg: BasicUNetConfig = BasicUNetConfig(),
    mesh_axis: str = "sp",
    shard_axis: int = 0,
):
    """Full multi-pass (TTA) sharded inference of an arbitrary-shape
    (Z, Y, X) volume; returns mean logits for the ORIGINAL extent as a
    device array (padding used internally is cropped away).

    ``shard_axis`` picks the spatial dimension to distribute (0=z default;
    1=y or 2=x for volumes thin in z): the volume and window grid are
    rotated so the shard axis leads, the z-sharding machinery runs
    unchanged (the window grid and halo exchange are axis-symmetric), and
    the result is rotated back. Window contents are untouched — only the
    partition differs — so the output stays bit-compatible with the
    single-device engine."""
    if shard_axis:
        import dataclasses

        perm = {1: (1, 0, 2), 2: (2, 1, 0)}[shard_axis]
        inv = perm  # both are self-inverse transpositions
        roi = tuple(cfg.roi)
        cfg_t = dataclasses.replace(
            cfg, roi=(roi[perm[0]], roi[perm[1]], roi[perm[2]])
        )
        vol_t = np.ascontiguousarray(np.transpose(volume, perm))
        acc, cnt = sharded_accumulate(
            mesh, params, vol_t, cfg_t, model_cfg, mesh_axis, win_perm=perm
        )
        mean_t = _divide(acc, cnt)
        return jnp.transpose(mean_t, inv)
    acc, cnt = sharded_accumulate(
        mesh, params, volume, cfg, model_cfg, mesh_axis
    )
    return _divide(acc, cnt)
