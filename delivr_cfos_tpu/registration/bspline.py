"""Cubic B-spline free-form deformation (FFD) registration.

Replaces mBrainAligner's ``local_registration`` binary (the FFD/LSFM stage,
reference: automate_mBrainaligner.py:60-72) with a JAX optimization: a cubic
B-spline control grid over the fixed volume parameterizes a displacement
field added after the affine, optimized with Adam against masked NCC plus a
bending-energy regularizer.

The dense field evaluation is three separable basis matmuls
(Z×Nz · Y×Ny · X×Nx tensor product) — pure MXU work — rather than per-voxel
kernel loops. Point evaluation (for warping cell centroids) gathers the 4³
support control points per point under ``vmap``.

Total transform: ``moving_coord = A @ fixed_coord + D(fixed_coord)``; both
volumes and points go through the same code path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from delivr_cfos_tpu.ops.resample import block_mean_downsample
from delivr_cfos_tpu.registration.affine import (
    sample_coords,
    similarity_fn,
)
from delivr_cfos_tpu.registration.warp import (
    affine_apply,
    fixed_grid,
    inside_weight,
    sample_volume,
    scan_chunk_for,
)


def _bspline_weights(f):
    """Cubic B-spline basis at fractional offset f ∈ [0, 1); returns 4 weights."""
    f2 = f * f
    f3 = f2 * f
    return (
        (1 - f) ** 3 / 6.0,
        (3 * f3 - 6 * f2 + 4) / 6.0,
        (-3 * f3 + 3 * f2 + 3 * f + 1) / 6.0,
        f3 / 6.0,
    )


def _axis_basis(n_vox: int, n_ctrl: int, spacing: float) -> np.ndarray:
    """Dense (n_vox, n_ctrl) cubic B-spline basis matrix for one axis.
    Control point j sits at fixed coordinate (j − 1)·spacing (one-point
    margin before the volume for cubic support)."""
    B = np.zeros((n_vox, n_ctrl), np.float32)
    u = np.arange(n_vox, dtype=np.float64) / spacing
    i = np.floor(u).astype(np.int64)
    f = u - i
    w = _bspline_weights(f)
    for k in range(4):
        idx = np.clip(i + k, 0, n_ctrl - 1)
        np.add.at(B, (np.arange(n_vox), idx), w[k].astype(np.float32))
    return B


# per-call gather bound for at_points (tests shrink it to force chunking)
_POINTS_CHUNK = 131072


@dataclass
class BSplineField:
    """Displacement field over fixed space: ctrl (Nz, Ny, Nx, 3), voxels."""

    spacing: float
    fixed_shape: tuple
    ctrl: np.ndarray  # (Nz, Ny, Nx, 3) float32

    @staticmethod
    def zeros(fixed_shape, spacing: float) -> "BSplineField":
        n_ctrl = tuple(int(np.ceil(s / spacing)) + 3 for s in fixed_shape)
        return BSplineField(
            spacing=float(spacing),
            fixed_shape=tuple(fixed_shape),
            ctrl=np.zeros((*n_ctrl, 3), np.float32),
        )

    def dense_field(self) -> jnp.ndarray:
        """(Z, Y, X, 3) displacement over the full fixed grid."""
        return _dense_field(
            jnp.asarray(self.ctrl), self.fixed_shape, self.spacing
        )

    def at_points(self, points_zyx) -> jnp.ndarray:
        """Displacement at arbitrary fixed-space points (N, 3).

        Chunked: the per-point 64-tap gather carries heavy TPU layout
        padding (~8 KB/point), so million-cell point sets are evaluated in
        bounded chunks (a real hemisphere has ~1e6+ detected cells)."""
        pts = jnp.asarray(points_zyx, jnp.float32)
        ctrl = jnp.asarray(self.ctrl)
        chunk = _POINTS_CHUNK
        if pts.shape[0] <= chunk:
            return _points_field(ctrl, pts, self.spacing)
        outs = []
        for lo in range(0, pts.shape[0], chunk):
            part = pts[lo : lo + chunk]
            n = part.shape[0]
            if n < chunk:  # pad to the chunk shape: one compile total
                part = jnp.concatenate(
                    [part, jnp.zeros((chunk - n, 3), jnp.float32)], axis=0
                )
            outs.append(_points_field(ctrl, part, self.spacing)[:n])
        return jnp.concatenate(outs, axis=0)


@partial(jax.jit, static_argnames=("fixed_shape", "spacing"))
def _dense_field(ctrl, fixed_shape, spacing):
    # full f32 on the MXU: displacement fields need more than the TPU's
    # default bf16 matmul precision (point/dense consistency < 1e-4 voxels)
    with jax.default_matmul_precision("highest"):
        Bz = jnp.asarray(_axis_basis(fixed_shape[0], ctrl.shape[0], spacing))
        By = jnp.asarray(_axis_basis(fixed_shape[1], ctrl.shape[1], spacing))
        Bx = jnp.asarray(_axis_basis(fixed_shape[2], ctrl.shape[2], spacing))
        t = jnp.tensordot(Bz, ctrl, axes=[[1], [0]])  # (Z, Ny, Nx, 3)
        t = jnp.tensordot(By, t, axes=[[1], [1]])  # (Y, Z, Nx, 3)
        t = jnp.tensordot(Bx, t, axes=[[1], [2]])  # (X, Y, Z, 3)
        return jnp.transpose(t, (2, 1, 0, 3))


def _points_field(ctrl, points, spacing):
    u = points / spacing
    i = jnp.floor(u).astype(jnp.int32)
    f = u - i

    def one(i3, f3):
        wz = jnp.stack(_bspline_weights(f3[0]))
        wy = jnp.stack(_bspline_weights(f3[1]))
        wx = jnp.stack(_bspline_weights(f3[2]))
        iz = jnp.clip(i3[0] + jnp.arange(4), 0, ctrl.shape[0] - 1)
        iy = jnp.clip(i3[1] + jnp.arange(4), 0, ctrl.shape[1] - 1)
        ix = jnp.clip(i3[2] + jnp.arange(4), 0, ctrl.shape[2] - 1)
        # ONE advanced-index gather: the chained ctrl[iz][:, iy][:, :, ix]
        # form vmaps into a per-point (4, Ny, Nx, 3) intermediate — 360 GB
        # at 4M points — while this gathers just the (4, 4, 4, 3) taps
        sub = ctrl[iz[:, None, None], iy[None, :, None], ix[None, None, :]]
        w = wz[:, None, None] * wy[None, :, None] * wx[None, None, :]
        return jnp.sum(sub * w[..., None], axis=(0, 1, 2))

    return jax.vmap(one)(i, f)


def _bending_energy(ctrl):
    """Squared second differences of the control grid (thin-plate proxy)."""
    e = 0.0
    for ax in range(3):
        d2 = jnp.diff(ctrl, n=2, axis=ax)
        e = e + jnp.mean(d2 * d2)
    return e


@partial(jax.jit, static_argnames=("fixed_shape", "spacing", "n_steps",
                                   "similarity", "n_samples"))
def _optimize_ffd(fixed, moving, affine, ctrl0, opt_state0, fixed_shape, spacing,
                  lr, lam, n_steps, similarity="ncc", n_samples=0, key=None):
    sim = similarity_fn(similarity)

    if n_samples:
        # stochastic similarity (see affine.py::_optimize_level): per step,
        # a fresh uniform coordinate subset; displacement evaluated by the
        # 64-tap point gather instead of the dense 3-matmul field
        def loss_fn(ctrl, coords_f):
            fixed_vals = sample_volume(fixed, coords_f)
            coords = affine_apply(affine, coords_f) + _points_field(
                ctrl, coords_f, spacing
            )
            warped = sample_volume(moving, coords)
            w = inside_weight(coords, moving.shape)
            return -sim(warped, fixed_vals, w) + lam * _bending_energy(ctrl)

        xs = jax.random.split(key, n_steps)
    else:
        grid = fixed_grid(fixed_shape)
        base = affine_apply(affine, grid)

        def loss_fn(ctrl, _):
            disp = _dense_field(ctrl, fixed_shape, spacing)
            coords = base + disp
            warped = sample_volume(moving, coords)
            w = inside_weight(coords, moving.shape)
            return -sim(warped, fixed, w) + lam * _bending_energy(ctrl)

        xs = None

    opt = optax.adam(lr)

    def step(carry, x):
        ctrl, opt_state = carry
        coords_f = (
            sample_coords(x, fixed_shape, n_samples) if n_samples else None
        )
        loss, g = jax.value_and_grad(loss_fn)(ctrl, coords_f)
        updates, opt_state = opt.update(g, opt_state)
        ctrl = optax.apply_updates(ctrl, updates)
        return (ctrl, opt_state), loss

    (ctrl, opt_state), losses = jax.lax.scan(
        step, (ctrl0, opt_state0), xs, length=n_steps
    )
    return ctrl, opt_state, losses


# Scan segmentation: the remote TPU worker crashes executing any single
# compiled program running ~2 min+ of similarity-grad steps (monolithic
# 200-step MI-FFD scans already died at 4 MVox). Bounded segments with a
# per-segment loss readback run the identical step sequence (bit-equal:
# same carried ctrl/opt state). Segment length is voxel-proportional —
# see registration/warp.py::scan_chunk_for (shared with affine.py).
_FFD_SCAN_CHUNK = 50  # upper cap; scan_chunk_for shrinks it for big volumes


def register_bspline(
    fixed: np.ndarray,
    moving: np.ndarray,
    affine: np.ndarray,
    spacing: float = 16.0,
    iters: int = 150,
    lr: float = 0.3,
    bending_weight: float = 1e-3,
    verbose: bool = False,
    similarity: str = "ncc",
    levels=(1,),
    n_samples: int = 0,
    seed: int = 0,
):
    """Returns (BSplineField, final NCC). ``affine`` is the fixed→moving
    matrix from ``register_affine``; the FFD refines on top of it.

    ``levels`` is a coarse→fine downsample-factor schedule (mBrainAligner's
    ``local_registration`` is likewise multi-resolution). The control grid
    keeps the SAME topology across levels: at factor f the level grid uses
    spacing/f in level voxels, so control point j sits at level coordinate
    (j−1)·spacing/f ↔ full-res (j−1)·spacing — identical knots — and level
    displacements map to full-res by ×f (the same half-voxel-free level
    convention ``register_affine`` uses). A level-f similarity+grad step is
    ~f³ cheaper, so e.g. ``levels=(2, 1)`` front-loads most iterations at
    an 8× discount. ``iters``/``lr`` may be per-level tuples. The default
    ``(1,)`` is the original single-resolution path, bit-identical.

    ``n_samples > 0``: stochastic similarity over that many fresh uniform
    random coordinates per gradient step (see ``register_affine``) —
    displacements come from the 64-tap point gather instead of the dense
    B-spline field, so a step is O(n_samples) regardless of volume size.
    The returned score is always a dense evaluation. 0 = dense (default).
    """
    fixed = np.asarray(fixed, np.float32)
    moving = np.asarray(moving, np.float32)
    n_levels = len(levels)
    iters_t = (iters,) * n_levels if np.isscalar(iters) else tuple(iters)
    lrs_t = (lr,) * n_levels if np.isscalar(lr) else tuple(lr)
    if not (len(iters_t) == len(lrs_t) == n_levels):
        raise ValueError("levels/iters/lr schedules disagree in length")
    field = BSplineField.zeros(fixed.shape, spacing)
    affine = np.asarray(affine, np.float32)
    ctrl = jnp.asarray(field.ctrl)  # full-resolution voxel units throughout
    last_loss = 0.0
    for li, (level, level_iters, level_lr) in enumerate(
        zip(levels, iters_t, lrs_t)
    ):
        level = int(level)
        if level == 1:
            fixed_l, moving_l = fixed, moving
            affine_l = affine
        else:
            fac = (level, level, level)
            fixed_l = np.asarray(
                block_mean_downsample(jnp.asarray(fixed), fac)
            )
            moving_l = np.asarray(
                block_mean_downsample(jnp.asarray(moving), fac)
            )
            # S⁻¹ A S: linear part is scale-invariant, translation ÷ f
            affine_l = affine.copy()
            affine_l[:, 3] = affine[:, 3] / level
        fixed_j = jnp.asarray(fixed_l)
        moving_j = jnp.asarray(moving_l)
        affine_j = jnp.asarray(affine_l)
        # small levels keep dense gradients (see register_affine's 64× bar)
        ns = n_samples if (n_samples and fixed_j.size > 64 * n_samples) else 0
        ctrl_l = ctrl / level  # displacement in level voxels
        opt_state = optax.adam(level_lr).init(ctrl_l)
        done = 0
        chunk = scan_chunk_for(ns if ns else fixed_j.size, _FFD_SCAN_CHUNK)
        while done < level_iters:
            n = min(chunk, level_iters - done)
            # fold in the level INDEX (not value): repeated factors in a
            # levels schedule must draw fresh sample coordinates, and this
            # matches register_affine's per-level stream derivation
            seg_key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), li), done
            )
            ctrl_l, opt_state, losses = _optimize_ffd(
                fixed_j,
                moving_j,
                affine_j,
                ctrl_l,
                opt_state,
                tuple(fixed_l.shape),
                float(spacing) / level,
                level_lr,
                bending_weight,
                n,
                similarity=similarity,
                n_samples=ns,
                key=seg_key,
            )
            # scalar readback bounds the in-flight program (axon rig: see
            # _FFD_SCAN_CHUNK) and synchronizes the segment
            last_loss = float(losses[-1])
            done += n
            if verbose:
                print(
                    f"[ffd] level {level}: {done}/{level_iters} "
                    f"loss {last_loss:.4f}"
                )
        ctrl = ctrl_l * level
        if ns:
            last_loss = -float(
                _ffd_dense_score(
                    fixed_j, moving_j, affine_j, ctrl_l,
                    tuple(fixed_l.shape), float(spacing) / level, similarity,
                )
            )
    field.ctrl = np.asarray(ctrl)
    ncc = -last_loss + bending_weight * 0  # loss includes reg; report raw-ish
    return field, ncc


@partial(jax.jit, static_argnames=("fixed_shape", "spacing", "similarity"))
def _ffd_dense_score(fixed, moving, affine, ctrl, fixed_shape, spacing,
                     similarity="ncc"):
    """Dense similarity of affine+FFD — reported by the stochastic path so
    scores stay comparable to the dense optimizer's."""
    grid = fixed_grid(fixed_shape)
    coords = affine_apply(affine, grid) + _dense_field(
        ctrl, fixed_shape, spacing
    )
    warped = sample_volume(moving, coords)
    w = inside_weight(coords, moving.shape)
    return similarity_fn(similarity)(warped, fixed, w)


def warp_points(affine: np.ndarray, field: BSplineField | None, points_zyx):
    """Fixed-space points → moving space through affine (+ optional FFD)."""
    pts = jnp.asarray(points_zyx, jnp.float32)
    out = affine_apply(jnp.asarray(affine, jnp.float32), pts)
    if field is not None:
        out = out + field.at_points(pts)
    return np.asarray(out)
