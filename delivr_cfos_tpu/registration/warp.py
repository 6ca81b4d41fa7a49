"""Volume warping primitives: trilinear sampling and affine coordinate maps.

These are the device-side building blocks replacing mBrainAligner's C++
resamplers (reference: automate_mBrainaligner.py:21-72 shells out to
``global_registration``/``local_registration`` binaries). Coordinates are
(z, y, x) voxel indices; an affine is a (3, 4) matrix ``A`` mapping fixed
voxel coords to moving voxel coords: ``m = A[:, :3] @ f + A[:, 3]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Step-voxel budget per compiled similarity-grad scan segment. The remote
# TPU worker kills (and takes down) any single program whose device
# execution runs ~2 min+: measured at Allen-50um scale (9.6 MVox, MI), a
# 25-step grad scan (~71 s) survives while a 50-step one (~140 s) crashes
# the worker. One step's wall time is ∝ voxel count, so bounding
# steps × voxels bounds segment wall time: 2.0e8 ≈ 20 steps at 9.6 MVox
# (~57 s), comfortably inside the envelope. Affine and FFD registration
# both chunk their scans with this.
_SCAN_STEP_VOXEL_BUDGET = 2.0e8


def scan_chunk_for(n_voxels: int, max_chunk: int = 50) -> int:
    """Iterations per compiled scan segment for a similarity-grad optimizer
    over ``n_voxels``-sized volumes (see _SCAN_STEP_VOXEL_BUDGET)."""
    return max(1, min(max_chunk, int(_SCAN_STEP_VOXEL_BUDGET // max(n_voxels, 1))))


def sample_volume(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample ``volume`` (Z, Y, X) at ``coords`` (..., 3) (z, y, x).
    Out-of-bounds reads clamp to the edge; a validity weight is NOT applied
    here (callers mask explicitly when needed)."""
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    Z, Y, X = volume.shape

    z0 = jnp.clip(jnp.floor(z), 0, Z - 1)
    y0 = jnp.clip(jnp.floor(y), 0, Y - 1)
    x0 = jnp.clip(jnp.floor(x), 0, X - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    x1 = jnp.minimum(x0 + 1, X - 1)
    wz = jnp.clip(z - z0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    wx = jnp.clip(x - x0, 0.0, 1.0)

    z0i, y0i, x0i = z0.astype(jnp.int32), y0.astype(jnp.int32), x0.astype(jnp.int32)
    z1i, y1i, x1i = z1.astype(jnp.int32), y1.astype(jnp.int32), x1.astype(jnp.int32)

    def at(zi, yi, xi):
        return volume[zi, yi, xi]

    c000 = at(z0i, y0i, x0i)
    c001 = at(z0i, y0i, x1i)
    c010 = at(z0i, y1i, x0i)
    c011 = at(z0i, y1i, x1i)
    c100 = at(z1i, y0i, x0i)
    c101 = at(z1i, y0i, x1i)
    c110 = at(z1i, y1i, x0i)
    c111 = at(z1i, y1i, x1i)

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def inside_weight(coords: jnp.ndarray, shape) -> jnp.ndarray:
    """1.0 where coords fall inside the volume, 0.0 outside (soft mask for
    similarity losses so out-of-FOV regions don't dominate)."""
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    ok = (
        (z >= 0)
        & (z <= shape[0] - 1)
        & (y >= 0)
        & (y <= shape[1] - 1)
        & (x >= 0)
        & (x <= shape[2] - 1)
    )
    return ok.astype(jnp.float32)


def fixed_grid(shape) -> jnp.ndarray:
    """Dense (Z, Y, X, 3) grid of fixed voxel coordinates."""
    zz = jnp.arange(shape[0], dtype=jnp.float32)
    yy = jnp.arange(shape[1], dtype=jnp.float32)
    xx = jnp.arange(shape[2], dtype=jnp.float32)
    g = jnp.stack(jnp.meshgrid(zz, yy, xx, indexing="ij"), axis=-1)
    return g


def affine_apply(affine: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Apply (3, 4) affine to (..., 3) coords."""
    return coords @ affine[:, :3].T + affine[:, 3]


def warp_volume_affine(moving: jnp.ndarray, affine: jnp.ndarray, fixed_shape) -> jnp.ndarray:
    """Resample ``moving`` onto the fixed grid through the affine."""
    grid = fixed_grid(fixed_shape)
    coords = affine_apply(affine, grid)
    return sample_volume(moving.astype(jnp.float32), coords)


def affine_warp_points(affine, points_zyx):
    """Map fixed-space points (N, 3) (z, y, x) into moving space."""
    return affine_apply(jnp.asarray(affine), jnp.asarray(points_zyx, jnp.float32))


def identity_affine() -> np.ndarray:
    return np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)


def moments_init(fixed: np.ndarray, moving: np.ndarray) -> np.ndarray:
    """Initial affine from intensity first/second moments: per-axis scale and
    translation aligning the mass centroids and spreads. Robust starting
    point for multi-resolution refinement."""
    def stats(v):
        v = np.asarray(v, np.float64)
        w = v / max(v.sum(), 1e-9)
        grids = np.indices(v.shape).astype(np.float64)
        mean = np.array([(g * w).sum() for g in grids])
        var = np.array([((g - m) ** 2 * w).sum() for g, m in zip(grids, mean)])
        return mean, np.sqrt(np.maximum(var, 1e-9))

    mf, sf = stats(fixed)
    mm, sm = stats(moving)
    scale = sm / sf
    A = np.diag(scale)
    t = mm - A @ mf
    return np.concatenate([A, t[:, None]], axis=1).astype(np.float32)
