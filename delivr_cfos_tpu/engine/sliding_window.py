"""TPU sliding-window inference engine.

Rebuilds the reference's forked MONAI inferer
(reference: inference/sliding_window_inferer.py) as an HBM-resident engine:

- The dense window grid uses the exact reference semantics: per-dim stride
  ``int(roi·(1−overlap))`` (sliding_window_inferer.py:255-276) and clamped
  last-window starts (MONAI ``dense_patch_slices``).
- The **host** decides, once per volume, which windows are background
  (window max ≤ threshold → the reference skips the model and emits constant
  −1000 logits, sliding_window_inferer.py:197-202). Active windows are padded
  to fixed-size batches so every device step has a static shape; background
  windows are folded in analytically by a cheap constant-accumulate kernel.
  This keeps the reference's semantics while turning its per-batch Python
  branching into data-independent, fully compiled device work.
- Accumulation happens **on device** in float32 (the reference accumulates
  float16 on host; float32-on-HBM is strictly more accurate and removes the
  per-batch host↔device round trip that dominates the reference's runtime —
  SURVEY.md §3.3).
- TTA matches the reference: 1 base pass + 4 × (noise, noise+flip-z,
  noise+flip-y) = 13 passes; Gaussian noise std 1e-3 applied to the gathered
  window batch after float cast; flips are applied per-window and inverted
  before accumulation (reference: inference.py:269-279,
  sliding_window_inferer.py:211-226).
- The importance map defaults to uniform — the reference's fork hardcodes
  ``mode='constant'`` despite requesting gaussian at the call site
  (sliding_window_inferer.py:148) — so blending is pure count-map averaging.
  ``SlidingWindowConfig.importance = "gaussian"`` enables the Gaussian
  blending the call site *asked* for (MONAI ``compute_importance_map``
  semantics: separable Gaussian of σ = 0.125·roi per dim centered at
  roi//2, truncated at radius int(4σ+0.5), peak-normalized, floor-clamped
  to the smallest positive value): ``acc += imp·logits``, ``cnt += imp``.
  The default stays bit-compatible with the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, basic_unet_apply
from delivr_cfos_tpu.ops.morphology import binarize_logits

SKIP_LOGIT = -1000.0  # constant emitted for background windows (reference)


@dataclass(frozen=True)
class SlidingWindowConfig:
    roi: tuple = (96, 96, 64)  # (z, y, x), config.json:24-28
    overlap: float = 0.5  # inference.py:125
    # 0 = size the window batch from device memory (auto_batch_size), the
    # TPU analog of the reference's free-VRAM calibration (inference.py:171-187)
    batch_size: int = 0
    background_threshold: int = 0  # sliding_window_inferer.py:50
    tta: bool = False
    tta_noise_std: float = 1e-3  # sliding_window_inferer.py:215
    threshold: float = 0.5  # sigmoid cutoff, inference.py:120
    erosion_iters: int = 30  # inference.py:84
    seed: int = 0
    # round scan lengths up to geometric buckets (bounds compile count to
    # O(log N) at <=33% padded work). Off by default: production slabs have
    # uniform window counts, so exact lengths compile once and waste nothing
    # (bucketing measured 12.5% padded work on the bench volume).
    bucket_scan_lengths: bool = False
    # "constant" (reference quirk, sliding_window_inferer.py:148) or
    # "gaussian" (the blending BASELINE config 2 names; MONAI formula)
    importance: str = "constant"
    importance_sigma_scale: float = 0.125  # MONAI compute_importance_map
    # vectorized overlap-add: accumulate the stride-regular windows as p³
    # dense phase tilings (gather+reshape+slice-add) instead of the serial
    # per-window update chain; clamped tails stay on the loop path. Same
    # math — f32 sums differ only in addend order. Auto-falls back when the
    # stride does not divide the roi.
    dense_overlap_add: bool = True


def auto_batch_size(
    roi,
    model_cfg: BasicUNetConfig,
    volume_bytes: int = 0,
    reserve_fraction: float = 0.5,
    device=None,
) -> int:
    """Window batch from device memory, replacing the reference's empirical
    free-VRAM formula (inference.py:171-187, ~180 MB per 64×64×32 window).

    Live-activation estimate per window: the full-resolution feature maps
    dominate — about 6 live (roi·f0)-sized tensors during the decoder's
    first-level TwoConv (skip + deconv out + concat + conv outputs), plus
    the same again at half resolution ≈ 8 × roi × f0 × dtype bytes.

    Calibration status (r3, scripts/calibrate_batch.py): the axon backend
    zeroes ``memory_stats()``, so the estimate was checked by probing the
    OOM boundary instead — a batch-96 fast-mode forward runs on a 16 GB
    chip where this model predicts 27 GB, i.e. the estimate is ≥ 2×
    conservative (XLA's live set is smaller than the sum of logical
    intermediates). Kept conservative deliberately: measured per-window
    throughput is flat from batch 4 to 16 (5.17 → 5.33 ms/window), so
    under-sizing costs nothing while over-sizing risks OOM alongside
    resident volumes.
    """
    try:
        if device is None:
            device = jax.devices()[0]
        stats = device.memory_stats() or {}
        hbm = int(stats.get("bytes_limit", 0))
    except Exception:
        hbm = 0
    # two telemetry regimes (VERDICT r4 item 9):
    # - live ``memory_stats`` (real v5e/v5p hosts): trust the reported HBM
    #   and let the budget, not a hard cap, size the batch — the cap only
    #   guards against absurd shapes (tiny rois on huge chips would
    #   otherwise ask for thousand-window batches whose gather/overlap-add
    #   bookkeeping, not the conv FLOPs, dominates);
    # - dead telemetry (the axon tunnel zeroes memory_stats): assume the
    #   smallest production chip (16 GB) and keep the measured-safe cap 32.
    telemetry_live = hbm > 0
    if not telemetry_live:
        hbm = 16 * 2**30
    dtype_bytes = 2 if model_cfg.compute_dtype == jnp.bfloat16 else 4
    roi_vox = int(np.prod(roi))
    per_window = 8 * roi_vox * model_cfg.features[0] * dtype_bytes
    # resident alongside the window batch: the uint16 input (volume_bytes)
    # plus the f32 accumulator and i32 count map at 8 B per volume voxel
    # (= 4 × the 2 B/voxel input), plus the bounded staged-logits chunk
    resident = 5 * volume_bytes + min(hbm // 8, 2 * 2**30)
    budget = int(hbm * (1 - reserve_fraction)) - resident
    n = max(1, budget // per_window)
    # clamp and round down to a power of two (stable compiled shapes)
    n = min(int(n), 256 if telemetry_live else 32)
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def gaussian_importance_map(
    roi, sigma_scale: float = 0.125, dtype=np.float32
) -> np.ndarray:
    """MONAI ``compute_importance_map(mode='gaussian')`` formula (the map the
    reference's call site requested but its fork never built,
    sliding_window_inferer.py:148): a unit impulse at ``roi//2`` blurred by a
    separable Gaussian with σ = ``sigma_scale``·roi per dim truncated at
    radius int(4σ+0.5), peak-normalized to 1, then floor-clamped to
    ``max(min positive value, 1e-3)`` so the count map can never be zero.
    The 1e-3 floor is MONAI's (compute_importance_map) — and load-bearing
    here: the corner weights of the raw separable product underflow to
    float32 denormals (≈1e-42 at 8σ per axis), which XLA flushes to zero,
    so without the floor acc/cnt at single-coverage corners would be 0/0."""
    axes = []
    for n in roi:
        sigma = sigma_scale * n
        center = n // 2
        radius = int(4.0 * sigma + 0.5)
        x = np.arange(n, dtype=np.float64) - center
        g = np.exp(-0.5 * (x / sigma) ** 2)
        g[np.abs(x) > radius] = 0.0
        axes.append(g)
    m = np.einsum("i,j,k->ijk", *axes)
    m /= m.max()
    m = np.clip(m, max(float(m[m > 0].min()), 1e-3), None)
    return m.astype(dtype)


def _importance_for(cfg: "SlidingWindowConfig"):
    """Device importance map for cfg, or None in constant mode."""
    if cfg.importance == "constant":
        return None
    if cfg.importance != "gaussian":
        raise ValueError(f"unknown importance mode {cfg.importance!r}")
    return jnp.asarray(
        gaussian_importance_map(tuple(cfg.roi), cfg.importance_sigma_scale)
    )


# --------------------------------------------------------------------------
# window grid (exact reference semantics)
# --------------------------------------------------------------------------


def scan_interval(image_size, roi_size, overlap: float) -> tuple:
    """Per-dim stride: ``roi`` if roi covers the dim, else
    ``int(roi·(1−overlap))`` min 1 (reference: sliding_window_inferer.py:255-276)."""
    out = []
    for img, roi in zip(image_size, roi_size):
        if roi == img:
            out.append(int(roi))
        else:
            interval = int(roi * (1 - overlap))
            out.append(interval if interval > 0 else 1)
    return tuple(out)


def _dim_starts(img: int, roi: int, interval: int) -> list:
    """MONAI dense_patch_slices: ceil((img−roi)/interval)+1 windows, the last
    clamped to img−roi."""
    if roi >= img:
        return [0]
    scan_num = int(math.ceil((img - roi) / interval)) + 1
    return [min(i * interval, img - roi) for i in range(scan_num)]


def dense_patch_starts(image_size, roi_size, overlap: float) -> np.ndarray:
    """All window start coordinates, shape (N, 3) int32, z-major order."""
    interval = scan_interval(image_size, roi_size, overlap)
    zs = _dim_starts(image_size[0], roi_size[0], interval[0])
    ys = _dim_starts(image_size[1], roi_size[1], interval[1])
    xs = _dim_starts(image_size[2], roi_size[2], interval[2])
    grid = np.array(
        [(z, y, x) for z in zs for y in ys for x in xs], dtype=np.int32
    )
    return grid


# --------------------------------------------------------------------------
# dense phase-sum overlap-add (VERDICT r3 item 3)
#
# At overlap 0.5 every unclamped window start is i·stride with
# roi = 2·stride, so the stride-regular windows split into p³ phase groups
# (p = roi/stride per dim) where each group tiles its z-y-x range WITHOUT
# overlap. Accumulating a group is then pure vector work — gather the
# group's windows, reshape (Mz, My, Mx, rz, ry, rx) → (Mz·rz, My·ry, Mx·rx),
# one slice-add — instead of the serial per-window dynamic_update_slice
# chain (latency-bound at ~8% of engine wall; scatter measured no better,
# PERF.md). Clamped-tail windows (the irregular last starts) stay on the
# loop path; the count map for regular windows is a closed-form constant.
# --------------------------------------------------------------------------


class _DensePlan:
    """Host-side phase decomposition of the reference window grid.

    Attributes:
      phases: list of (origin_zyx, grid_dims_MzMyMx, w_ids) — w_ids are the
        global window ids (z-major raster, as dense_patch_starts orders
        them) of the phase's slots in (mz, my, mx) raster order;
      regular_mask: (N,) bool — window is stride-regular in all dims;
      static: hashable ((origin, dims), ...) for jit keys.
    """

    def __init__(self, dims, roi, interval):
        """``dims``: the per-dim start lists of the grid being accumulated
        (z-major window ordering assumed, as dense_patch_starts emits)."""
        p = [roi[d] // interval[d] for d in range(3)]
        # per-dim regular index count (the clamped last start is irregular)
        n_reg = []
        for d in range(3):
            n = len(dims[d])
            if dims[d][-1] != (n - 1) * interval[d]:
                n -= 1
            n_reg.append(n)
        self.p = tuple(p)
        n_all = tuple(len(d) for d in dims)
        N = n_all[0] * n_all[1] * n_all[2]
        reg = np.zeros(n_all, bool)
        reg[: n_reg[0], : n_reg[1], : n_reg[2]] = True
        self.regular_mask = reg.ravel()
        self.phases = []
        for gz in range(p[0]):
            for gy in range(p[1]):
                for gx in range(p[2]):
                    g = (gz, gy, gx)
                    M = tuple(
                        -(-(n_reg[d] - g[d]) // p[d]) if n_reg[d] > g[d] else 0
                        for d in range(3)
                    )
                    if 0 in M:
                        continue
                    iz = g[0] + np.arange(M[0]) * p[0]
                    iy = g[1] + np.arange(M[1]) * p[1]
                    ix = g[2] + np.arange(M[2]) * p[2]
                    w_ids = (
                        (iz[:, None, None] * n_all[1] + iy[None, :, None])
                        * n_all[2]
                        + ix[None, None, :]
                    ).ravel().astype(np.int64)
                    origin = tuple(int(g[d] * interval[d]) for d in range(3))
                    self.phases.append((origin, M, w_ids))
        self.static = tuple((ph[0], ph[1]) for ph in self.phases)
        self.n_windows = N


def _dense_applicable(roi, interval) -> bool:
    """The phase decomposition applies when the stride divides the roi in
    every dim (true for the reference's 0.5 overlap). Single source of
    truth for both the whole-volume and the streaming-slab paths."""
    return not any(interval[d] <= 0 or roi[d] % interval[d] for d in range(3))


def _dense_plan_for(image_size, roi, interval):
    """A _DensePlan when the decomposition applies, else None."""
    if not _dense_applicable(roi, interval):
        return None
    dims = [
        _dim_starts(image_size[d], roi[d], interval[d]) for d in range(3)
    ]
    return _DensePlan(dims, roi, interval)


def _gather_1based(src_flat, idx):
    """src_flat[(idx−1)] with idx==0 meaning the zero window — gathered via
    clamp+mask so no concatenated copy of the (large) staged logits is ever
    materialized."""
    g = src_flat[jnp.maximum(idx - 1, 0)]
    m = (idx > 0).astype(src_flat.dtype)
    return g * m[:, None, None, None]


@partial(
    jax.jit,
    static_argnames=("plan_static", "roi"),
    donate_argnames=("acc",),
)
def _dense_phase_add_all(acc, src_flat, idx_list, *, plan_static, roi, imp=None):
    """Add every phase's gathered windows into ``acc`` in one dispatch.
    ``src_flat``: (K, *roi) window contributions; ``idx_list[i]``: (S_i,)
    1-based indices into src_flat (0 = the implicit zero window, used for
    slots whose contribution is not in this chunk)."""
    rz, ry, rx = roi
    for (origin, (Mz, My, Mx)), idx in zip(plan_static, idx_list):
        g = _gather_1based(src_flat, idx)
        if imp is not None:
            g = g * imp
        block = (
            g.reshape(Mz, My, Mx, rz, ry, rx)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(Mz * rz, My * ry, Mx * rx)
        )
        oz, oy, ox = origin
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (oz, oy, ox), block.shape) + block,
            (oz, oy, ox),
        )
    return acc


@partial(
    jax.jit,
    static_argnames=("plan_static", "roi", "n_passes"),
    donate_argnames=("cnt",),
)
def _dense_count_add(cnt, *, plan_static, roi, n_passes, imp=None):
    """Closed-form count-map contribution of ALL regular windows (each adds
    1 — or its importance weight — per pass, over its phase's tiling)."""
    rz, ry, rx = roi
    for origin, (Mz, My, Mx) in plan_static:
        oz, oy, ox = origin
        shape = (Mz * rz, My * ry, Mx * rx)
        if imp is None:
            block = jnp.full(shape, n_passes, cnt.dtype)
        else:
            block = jnp.tile(imp * n_passes, (Mz, My, Mx)).astype(cnt.dtype)
        cnt = jax.lax.dynamic_update_slice(
            cnt,
            jax.lax.dynamic_slice(cnt, (oz, oy, ox), shape) + block,
            (oz, oy, ox),
        )
    return cnt


@partial(
    jax.jit, static_argnames=("roi",), donate_argnames=("acc", "cnt")
)
def _tail_accumulate(
    acc, cnt, src_flat, tail_idx, tail_starts, tail_valid, *, roi, imp=None
):
    """Loop-accumulate the clamped-tail windows of one chunk: gather their
    contributions from the staged logits (1-based; 0 = zero window for
    valid=0 lanes) and run the standard per-window overlap-add."""
    contrib = _gather_1based(src_flat, tail_idx)
    return _accumulate_windows(
        acc, cnt, tail_starts, contrib, tail_valid, roi, imp
    )


# --------------------------------------------------------------------------
# jitted device steps
# --------------------------------------------------------------------------


def _gather_windows(volume, starts, roi):
    """(B, 3) starts → (B, *roi) windows via vmapped dynamic_slice."""
    def one(s):
        return jax.lax.dynamic_slice(volume, (s[0], s[1], s[2]), roi)

    return jax.vmap(one)(starts)


def _accumulate_windows(acc, cnt, starts, contrib, valid, roi, imp=None):
    """Overlap-add one batch of window contributions into acc/cnt.

    ``imp``: optional (roi,) importance map — weighted blending
    ``acc += imp·contrib``, ``cnt += imp`` (cnt must then be float);
    None keeps the reference's uniform accumulate (cnt int count map)."""
    w = valid.astype(jnp.float32)

    def body(i, carry):
        a, c = carry
        s = starts[i]
        patch_a = jax.lax.dynamic_slice(a, (s[0], s[1], s[2]), roi)
        patch_c = jax.lax.dynamic_slice(c, (s[0], s[1], s[2]), roi)
        add_a = contrib[i] * w[i]
        if imp is not None:
            add_a = add_a * imp
            add_c = imp * w[i]
        else:
            add_c = valid[i].astype(c.dtype)
        a = jax.lax.dynamic_update_slice(a, patch_a + add_a, (s[0], s[1], s[2]))
        c = jax.lax.dynamic_update_slice(c, patch_c + add_c, (s[0], s[1], s[2]))
        return a, c

    return jax.lax.fori_loop(0, starts.shape[0], body, (acc, cnt))


@partial(
    jax.jit,
    static_argnames=("roi", "flip_axis", "use_noise", "model_cfg"),
)
def _forward_windows_pass(
    params,
    volume,
    starts_nb,  # (NB, B, 3)
    key,
    noise_std,
    *,
    roi,
    flip_axis,
    use_noise,
    model_cfg,
):
    """Forward-only scan over window batches: gather → (noise/flip) → UNet.
    Returns logits (NB, B, *roi) float32.

    Deliberately carries NOTHING large through the scan: a combined
    model+overlap-add scan measured ~2× slower per step on TPU than the
    plain forward (the 280 MB acc/cnt carry pins buffers and degrades the
    conv scheduling — PERF.md), while this forward-only scan runs at plain
    jit speed. Accumulation happens in `_accumulate_logits_pass`.
    """

    def scan_body(key, starts):
        key, sub = jax.random.split(key)
        windows = _gather_windows(volume, starts, roi).astype(jnp.float32)
        if use_noise:
            noise = jax.random.normal(sub, windows.shape, jnp.float32) * noise_std
            windows = windows + noise
        x = windows[..., None]  # (B, z, y, x, 1)
        if flip_axis is not None:
            x = jnp.flip(x, axis=flip_axis + 1)
        logits = basic_unet_apply(params, x, model_cfg)
        if flip_axis is not None:
            logits = jnp.flip(logits, axis=flip_axis + 1)
        return key, logits[..., 0].astype(jnp.float32)

    _, logits_nb = jax.lax.scan(scan_body, key, starts_nb)
    return logits_nb


@partial(jax.jit, static_argnames=("roi",), donate_argnames=("acc", "cnt"))
def _accumulate_logits_pass(
    acc, cnt, starts_nb, valid_nb, logits_nb, *, roi, imp=None
):
    """Overlap-add precomputed window logits into acc/cnt (one dispatch)."""

    def scan_body(carry, inp):
        acc, cnt = carry
        starts, valid, contrib = inp
        acc, cnt = _accumulate_windows(
            acc, cnt, starts, contrib, valid, roi, imp
        )
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(
        scan_body, (acc, cnt), (starts_nb, valid_nb, logits_nb)
    )
    return acc, cnt


def _forward_chunk_batches(roi, batch: int, budget_bytes: int = 0) -> int:
    """Bound on window batches whose f32 logits may be materialized at once
    by the forward/accumulate dispatch split. The split exists because a
    combined model+overlap-add scan measured ~2× slower (PERF.md), but an
    unbounded split would stage (N_windows, *roi) f32 in HBM — up to
    8·overlap·4 bytes per active voxel, far beyond the 10 B/voxel the
    whole-volume guard budgets. Default budget: 1/8 of device memory,
    capped at 2 GB."""
    if budget_bytes <= 0:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm = int(stats.get("bytes_limit", 0)) or 16 * 2**30
        except Exception:
            hbm = 16 * 2**30
        budget_bytes = min(hbm // 8, 2 * 2**30)
    per_batch = batch * int(np.prod(roi)) * 4
    return max(1, budget_bytes // per_batch)


def _infer_accumulate_pass(
    params,
    volume,
    acc,
    cnt,
    starts_nb,  # (NB, B, 3)
    valid_nb,  # (NB, B)
    key,
    noise_std,
    *,
    roi,
    flip_axis,
    use_noise,
    model_cfg,
    imp=None,
):
    """One full pass over all active windows, chunked into pairs of device
    dispatches: a forward-only scan (full conv throughput) and an
    overlap-add scan per chunk. The chunk bound keeps the staged f32 logits
    ≤ `_forward_chunk_batches` batches, so peak HBM stays within the
    whole-volume guard's budget even for mostly-active volumes.
    ``valid_nb`` masks batch-padding lanes. ``flip_axis`` is a window-space
    spatial axis (0=z, 1=y) or None. ``acc``/``cnt`` are donated: in-place
    HBM update."""
    nb = starts_nb.shape[0]
    chunk = _forward_chunk_batches(roi, starts_nb.shape[1])
    for lo in range(0, nb, chunk):
        hi = min(lo + chunk, nb)
        key, sub = jax.random.split(key)
        logits_nb = _forward_windows_pass(
            params,
            volume,
            starts_nb[lo:hi],
            sub,
            noise_std,
            roi=roi,
            flip_axis=flip_axis,
            use_noise=use_noise,
            model_cfg=model_cfg,
        )
        acc, cnt = _accumulate_logits_pass(
            acc,
            cnt,
            starts_nb[lo:hi],
            valid_nb[lo:hi],
            logits_nb,
            roi=roi,
            imp=imp,
        )
    return acc, cnt


@partial(jax.jit, static_argnames=("roi",), donate_argnames=("acc", "cnt"))
def _skip_accumulate_pass(acc, cnt, starts_nb, valid_nb, *, roi, imp=None):
    """Fold all background windows in (constant −1000 logits, count += 1,
    reference: sliding_window_inferer.py:197-202) — one device dispatch."""

    def scan_body(carry, inp):
        acc, cnt = carry
        starts, valid = inp
        contrib = jnp.full((starts.shape[0], *roi), SKIP_LOGIT, jnp.float32)
        acc, cnt = _accumulate_windows(
            acc, cnt, starts, contrib, valid, roi, imp
        )
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(scan_body, (acc, cnt), (starts_nb, valid_nb))
    return acc, cnt


@partial(jax.jit, static_argnames=("roi", "batch",))
def _window_maxes(volume, starts, *, roi, batch):
    """Max intensity per window, for host-side background scheduling."""
    n = starts.shape[0]

    def body(i, out):
        s = jax.lax.dynamic_slice(starts, (i * batch, 0), (batch, 3))
        wins = _gather_windows(volume, s, roi)
        m = jnp.max(wins.reshape(batch, -1), axis=1)
        return jax.lax.dynamic_update_slice(out, m, (i * batch,))

    n_batches = n // batch
    out = jnp.zeros((starts.shape[0],), volume.dtype)
    return jax.lax.fori_loop(0, n_batches, body, out)


@jax.jit
def _divide(acc, cnt):
    if jnp.issubdtype(cnt.dtype, jnp.floating):
        # gaussian blending: cnt holds importance-weight sums (positive by
        # the map's min-clamp wherever any window lands); do NOT clamp to 1
        # or edge voxels with small weight sums would be mis-normalized
        return acc / jnp.maximum(cnt, 1e-8)
    return acc / jnp.maximum(cnt, 1).astype(jnp.float32)


# --------------------------------------------------------------------------
# host orchestration (single device, volume resident in HBM)
# --------------------------------------------------------------------------


def _pad_to_batches(arr: np.ndarray, batch: int):
    """Pad (N, ...) to a multiple of ``batch``; returns (padded, valid mask)."""
    n = arr.shape[0]
    n_pad = (-n) % batch
    valid = np.ones((n + n_pad,), dtype=np.int32)
    if n_pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], n_pad, axis=0)], axis=0)
        valid[n:] = 0
    return arr, valid


def _bucket_nb(nb: int) -> int:
    """Round a batch count up to a geometric bucket (1, 2, 3, 4, 6, 8, 12,
    16, 24, 32, ...) so scan lengths — and therefore compilations — are
    bounded to O(log N) distinct values across slabs/volumes, at ≤ 33%
    padded-work overhead."""
    if nb <= 4:
        return nb
    lo = 4
    while True:
        hi = lo * 3 // 2
        if nb <= hi:
            return hi
        lo *= 2
        if nb <= lo:
            return lo


def _to_batched(starts: np.ndarray, batch: int, valid_weight: int = 1,
                bucket: bool = False):
    """(N, 3) starts → ((NB, B, 3), (NB, B)) device arrays for the scan
    passes; with ``bucket``, NB is rounded up to a geometric bucket (padded
    batches are fully masked)."""
    padded, valid = _pad_to_batches(starts, batch)
    nb = padded.shape[0] // batch
    nb_b = _bucket_nb(nb) if bucket else nb
    if nb_b > nb:
        extra = (nb_b - nb) * batch
        padded = np.concatenate(
            [padded, np.repeat(padded[-1:], extra, axis=0)], axis=0
        )
        valid = np.concatenate([valid, np.zeros(extra, np.int32)])
        nb = nb_b
    return (
        jnp.asarray(padded.reshape(nb, batch, 3)),
        jnp.asarray((valid * valid_weight).reshape(nb, batch).astype(np.int32)),
    )


def _tta_passes(cfg: SlidingWindowConfig):
    """(use_noise, flip_axis) per pass: 1 base + 4×(noise, z-flip, y-flip)
    (reference: inference.py:269-279)."""
    passes = [(False, None)]
    if cfg.tta:
        for _ in range(4):
            passes += [(True, None), (True, 0), (True, 1)]
    return passes


def _infer_dense(
    params,
    vol_dev,
    acc,
    cnt,
    starts,
    active_mask,
    plan: _DensePlan,
    key,
    cfg,
    passes,
    batch,
    roi,
    model_cfg,
    imp,
):
    """Accumulation with the dense phase-sum decomposition (see _DensePlan):
    regular windows go through vectorized phase adds (background ones as one
    constant add, the count map in closed form); clamped-tail windows ride
    the per-window loop path. Forward passes are unchanged."""
    n_passes = len(passes)
    reg = plan.regular_mask
    n_active = int(active_mask.sum())
    rank = np.full(starts.shape[0], -1, np.int64)
    rank[np.nonzero(active_mask)[0]] = np.arange(n_active)

    # count map of every regular window: closed form
    cnt = _dense_count_add(
        cnt, plan_static=plan.static, roi=roi, n_passes=n_passes, imp=imp
    )

    # background regular windows: one dense add of the skip constant
    is_bg_reg = (~active_mask) & reg
    if is_bg_reg.any():
        sel = [
            jnp.asarray(is_bg_reg[w_ids].astype(np.int32))
            for _, _, w_ids in plan.phases
        ]
        skip_src = jnp.full((1, *roi), SKIP_LOGIT * n_passes, jnp.float32)
        acc = _dense_phase_add_all(
            acc, skip_src, sel, plan_static=plan.static, roi=roi, imp=imp
        )

    # background tails: standard loop skip pass (acc + cnt)
    bg_tail = starts[(~active_mask) & ~reg]
    if bg_tail.shape[0]:
        sk_nb, sk_valid_nb = _to_batched(
            bg_tail, batch, n_passes, bucket=cfg.bucket_scan_lengths
        )
        acc, cnt = _skip_accumulate_pass(
            acc, cnt, sk_nb, sk_valid_nb, roi=roi, imp=imp
        )

    if not n_active:
        return acc, cnt

    active = starts[active_mask]
    act_nb, _ = _to_batched(active, batch, bucket=cfg.bucket_scan_lengths)
    nb = act_nb.shape[0]
    chunk = _forward_chunk_batches(roi, batch)
    noise_std = jnp.asarray(cfg.tta_noise_std, jnp.float32)

    # per-chunk gather plans (chunk-dependent, pass-independent)
    ranks_ph = [rank[w_ids] for _, _, w_ids in plan.phases]
    tail_active = np.nonzero(active_mask & ~reg)[0]
    tail_ranks = rank[tail_active]
    tail_starts_dev = (
        jnp.asarray(starts[tail_active]) if tail_active.size else None
    )
    chunk_plans = []
    for lo in range(0, nb, chunk):
        hi = min(lo + chunk, nb)
        lo_w, hi_w = lo * batch, hi * batch
        idx_list = [
            jnp.asarray(
                np.where((r >= lo_w) & (r < hi_w), r - lo_w + 1, 0).astype(
                    np.int32
                )
            )
            for r in ranks_ph
        ]
        if tail_active.size:
            tsel = (tail_ranks >= lo_w) & (tail_ranks < hi_w)
            t_idx = jnp.asarray(
                np.where(tsel, tail_ranks - lo_w + 1, 0).astype(np.int32)
            )
            t_valid = jnp.asarray(tsel.astype(np.int32))
        else:
            t_idx = t_valid = None
        chunk_plans.append((lo, hi, idx_list, t_idx, t_valid))

    for use_noise, flip_axis in passes:
        for lo, hi, idx_list, t_idx, t_valid in chunk_plans:
            key, sub = jax.random.split(key)
            logits_nb = _forward_windows_pass(
                params,
                vol_dev,
                act_nb[lo:hi],
                sub,
                noise_std,
                roi=roi,
                flip_axis=flip_axis,
                use_noise=use_noise,
                model_cfg=model_cfg,
            )
            flat = logits_nb.reshape(-1, *roi)
            acc = _dense_phase_add_all(
                acc, flat, idx_list, plan_static=plan.static, roi=roi, imp=imp
            )
            if t_idx is not None:
                acc, cnt = _tail_accumulate(
                    acc,
                    cnt,
                    flat,
                    t_idx,
                    tail_starts_dev,
                    t_valid,
                    roi=roi,
                    imp=imp,
                )
    return acc, cnt


def infer_volume(
    params,
    volume: np.ndarray,
    cfg: SlidingWindowConfig = SlidingWindowConfig(),
    model_cfg: BasicUNetConfig = BasicUNetConfig(),
    return_binary: bool = True,
):
    """Run sliding-window UNet inference over a (Z, Y, X) volume resident in
    device memory. Returns (mean_logits f32, binaries uint8 | None), both on
    device, cropped to the input shape.

    For volumes larger than HBM use the streaming engine
    (delivr_cfos_tpu.engine.streaming).
    """
    roi = tuple(cfg.roi)
    orig_shape = volume.shape
    # reflect-pad when smaller than roi (reference: sliding_window_inferer.py:119-136)
    pads = [(0, 0)] * 3
    need_pad = False
    for i in range(3):
        diff = max(roi[i] - volume.shape[i], 0)
        if diff:
            pads[i] = (diff // 2, diff - diff // 2)
            need_pad = True
    if need_pad:
        pad = jnp.pad if isinstance(volume, jax.Array) else np.pad
        volume = pad(volume, pads, mode="reflect")

    image_size = volume.shape
    interval = scan_interval(image_size, roi, cfg.overlap)
    starts = dense_patch_starts(image_size, roi, cfg.overlap)
    batch = cfg.batch_size or auto_batch_size(roi, model_cfg, volume.nbytes)

    # a jax.Array input is already device-resident — don't re-upload (the
    # host link may be slow; callers processing one volume repeatedly, like
    # TTA or the bench, upload once)
    vol_dev = volume if isinstance(volume, jax.Array) else jnp.asarray(volume)
    imp = _importance_for(cfg)
    acc = jnp.zeros(image_size, jnp.float32)
    cnt = jnp.zeros(image_size, jnp.float32 if imp is not None else jnp.int32)

    # --- host-side background scheduling ---------------------------------
    starts_padded, _ = _pad_to_batches(starts, batch)
    maxes = np.asarray(
        _window_maxes(vol_dev, jnp.asarray(starts_padded), roi=roi, batch=batch)
    )[: starts.shape[0]]
    active_mask = maxes > cfg.background_threshold
    active = starts[active_mask]
    skipped = starts[~active_mask]

    passes = _tta_passes(cfg)
    key = jax.random.PRNGKey(cfg.seed)

    plan = (
        _dense_plan_for(image_size, roi, interval)
        if cfg.dense_overlap_add
        else None
    )

    if plan is not None:
        acc, cnt = _infer_dense(
            params,
            vol_dev,
            acc,
            cnt,
            starts,
            active_mask,
            plan,
            key,
            cfg,
            passes,
            batch,
            roi,
            model_cfg,
            imp,
        )
    else:
        # --- background windows: constant accumulate, pass-count weighted --
        if skipped.shape[0]:
            sk_nb, sk_valid_nb = _to_batched(
                skipped, batch, len(passes), bucket=cfg.bucket_scan_lengths
            )
            acc, cnt = _skip_accumulate_pass(
                acc, cnt, sk_nb, sk_valid_nb, roi=roi, imp=imp
            )

        # --- active windows: one device dispatch per TTA pass --------------
        if active.shape[0]:
            act_nb, valid_nb = _to_batched(
                active, batch, bucket=cfg.bucket_scan_lengths
            )
            noise_std = jnp.asarray(cfg.tta_noise_std, jnp.float32)
            for use_noise, flip_axis in passes:
                key, sub = jax.random.split(key)
                acc, cnt = _infer_accumulate_pass(
                    params,
                    vol_dev,
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

    mean_logits = _divide(acc, cnt)
    # crop back the reflect padding
    sl = tuple(
        slice(pads[i][0], pads[i][0] + orig_shape[i]) for i in range(3)
    )
    mean_logits = mean_logits[sl]
    binaries = None
    if return_binary:
        binaries = binarize_logits(
            mean_logits,
            jnp.asarray(volume)[sl],
            threshold=cfg.threshold,
            erosion_iters=cfg.erosion_iters,
        )
    return mean_logits, binaries
