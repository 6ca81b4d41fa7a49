import numpy as np
import pytest

import jax.numpy as jnp

from delivr_cfos_tpu.registration import (
    BSplineField,
    register_affine,
    register_bspline,
    warp_points,
)
from delivr_cfos_tpu.registration.warp import (
    affine_apply,
    fixed_grid,
    sample_volume,
)


def _brain_like(shape=(48, 56, 40), seed=0):
    """Smooth blobby 'brain': big ellipsoid + internal structure."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.indices(shape).astype(np.float64)
    c = np.array(shape) / 2
    r = np.array(shape) / 2.6
    body = (
        ((zz - c[0]) / r[0]) ** 2
        + ((yy - c[1]) / r[1]) ** 2
        + ((xx - c[2]) / r[2]) ** 2
    ) < 1.0
    vol = body.astype(np.float64) * 100
    for _ in range(10):
        p = rng.uniform(0.25, 0.75, 3) * shape
        s = rng.uniform(2, 5)
        blob = np.exp(
            -(((zz - p[0]) ** 2 + (yy - p[1]) ** 2 + (xx - p[2]) ** 2) / (2 * s**2))
        )
        vol += 150 * blob
    return vol.astype(np.float32)


def _apply_affine_to_volume(moving, affine, fixed_shape):
    grid = fixed_grid(fixed_shape)
    coords = affine_apply(jnp.asarray(affine, jnp.float32), grid)
    return np.asarray(sample_volume(jnp.asarray(moving), coords))


def test_affine_recovery():
    moving = _brain_like()
    true = np.array(
        [
            [1.08, 0.03, 0.0, -2.0],
            [-0.02, 0.95, 0.04, 3.0],
            [0.0, 0.02, 1.05, -1.5],
        ],
        np.float32,
    )
    fixed = _apply_affine_to_volume(moving, true, moving.shape)
    est, ncc = register_affine(fixed, moving, levels=(2, 1), iters=(300, 150))
    assert ncc > 0.995
    # point-mapping accuracy inside the brain
    pts = np.array([[24, 28, 20], [15, 35, 25], [30, 20, 15]], np.float32)
    true_m = pts @ true[:, :3].T + true[:, 3]
    est_m = pts @ est[:, :3].T + est[:, 3]
    err = np.abs(true_m - est_m).max()
    assert err < 1.0, f"max point error {err}"


def test_bspline_field_point_vs_dense_consistency():
    field = BSplineField.zeros((20, 24, 16), spacing=8.0)
    rng = np.random.default_rng(1)
    field.ctrl = rng.normal(0, 2, field.ctrl.shape).astype(np.float32)
    dense = np.asarray(field.dense_field())
    pts = np.array([[0, 0, 0], [5, 7, 3], [19, 23, 15], [10, 12, 8]], np.float32)
    at = np.asarray(field.at_points(pts))
    for p, d in zip(pts.astype(int), at):
        np.testing.assert_allclose(dense[p[0], p[1], p[2]], d, rtol=1e-4, atol=1e-4)


def test_bspline_at_points_chunked_matches_single_call(monkeypatch):
    """Chunked evaluation (million-cell point sets) is exact vs one call,
    including the padded final partial chunk."""
    from delivr_cfos_tpu.registration import bspline as bspline_mod

    field = BSplineField.zeros((20, 24, 16), spacing=8.0)
    rng = np.random.default_rng(3)
    field.ctrl = rng.normal(0, 2, field.ctrl.shape).astype(np.float32)
    pts = rng.uniform(0, 15, size=(205, 3)).astype(np.float32)
    whole = np.asarray(field.at_points(pts))
    monkeypatch.setattr(bspline_mod, "_POINTS_CHUNK", 64)  # 3 full + partial
    chunked = np.asarray(field.at_points(pts))
    np.testing.assert_array_equal(whole, chunked)


def test_bspline_recovery_improves_over_affine():
    moving = _brain_like(seed=2)
    # ground-truth smooth deformation via a random coarse B-spline field
    true_field = BSplineField.zeros(moving.shape, spacing=16.0)
    rng = np.random.default_rng(3)
    true_field.ctrl = rng.normal(0, 1.6, true_field.ctrl.shape).astype(np.float32)
    disp = np.asarray(true_field.dense_field())
    grid = np.asarray(fixed_grid(moving.shape))
    fixed = np.asarray(
        sample_volume(jnp.asarray(moving), jnp.asarray(grid + disp))
    )

    affine, ncc_aff = register_affine(fixed, moving, levels=(2, 1), iters=(200, 100))
    field, _ = register_bspline(
        fixed, moving, affine, spacing=16.0, iters=200, lr=0.25
    )
    # NCC after FFD must beat affine-only
    coords = affine_apply(jnp.asarray(affine), jnp.asarray(grid)) + field.dense_field()
    warped = np.asarray(sample_volume(jnp.asarray(moving), coords))
    mask = fixed > 10
    def ncc(a, b, m):
        a, b = a[m], b[m]
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    ncc_ffd = ncc(warped, fixed, mask)
    assert ncc_ffd > ncc_aff
    assert ncc_ffd > 0.99

    # point accuracy: true moving coord = p + disp(p)
    pts = np.array([[20, 30, 20], [25, 25, 18], [30, 35, 22]], np.float32)
    true_m = pts + np.asarray(true_field.at_points(pts))
    est_m = warp_points(affine, field, pts)
    err = np.abs(true_m - est_m).max()
    assert err < 1.5, f"max point error {err}"


def test_bspline_multires_recovery():
    """Coarse→fine FFD (levels=(2, 1)) recovers a known field to the same
    point-accuracy bound as single-res with only a third of the full-res
    iterations (the level-2 iterations cost ~1/8 each)."""
    moving = _brain_like(seed=2)
    true_field = BSplineField.zeros(moving.shape, spacing=16.0)
    rng = np.random.default_rng(7)
    true_field.ctrl = rng.normal(0, 1.6, true_field.ctrl.shape).astype(
        np.float32
    )
    disp = np.asarray(true_field.dense_field())
    grid = np.asarray(fixed_grid(moving.shape))
    fixed = np.asarray(
        sample_volume(jnp.asarray(moving), jnp.asarray(grid + disp))
    )

    affine, _ = register_affine(fixed, moving, levels=(2, 1), iters=(200, 100))
    field, _ = register_bspline(
        fixed, moving, affine, spacing=16.0,
        levels=(2, 1), iters=(150, 60), lr=0.25,
    )
    pts = np.array([[20, 30, 20], [25, 25, 18], [30, 35, 22]], np.float32)
    true_m = pts + np.asarray(true_field.at_points(pts))
    est_m = warp_points(affine, field, pts)
    err = np.abs(true_m - est_m).max()
    assert err < 1.5, f"max point error {err}"


def test_sample_coords_stratified():
    """The jittered-lattice sampler is stratified: every lattice cell gets
    exactly one point, points stay in-bounds, and the draw is key-dependent
    (fresh coordinates each optimizer step)."""
    import jax

    from delivr_cfos_tpu.registration.affine import sample_coords

    shape = (30, 40, 50)
    n = 1000
    pts = np.asarray(sample_coords(jax.random.PRNGKey(0), shape, n))
    assert pts.shape[1] == 3
    # ~n points (lattice rounding), never wildly off
    assert 0.5 * n <= pts.shape[0] <= 2.0 * n
    assert (pts >= 0).all()
    assert (pts <= np.asarray(shape, np.float32) - 1.0).all()
    # stratification: each point lies in its own lattice cell → the set of
    # occupied cells has no duplicates and covers every cell
    dims = np.asarray(shape, np.float64)
    scale = (pts.shape[0] / dims.prod()) ** (1.0 / 3.0)
    counts = np.maximum(1, np.round(dims * scale).astype(int))
    pitch = dims / counts
    cells = np.minimum(
        (pts / pitch).astype(int), counts - 1
    )
    lin = np.ravel_multi_index(cells.T, counts)
    assert len(np.unique(lin)) == pts.shape[0]
    # key-dependence
    pts2 = np.asarray(sample_coords(jax.random.PRNGKey(1), shape, n))
    assert not np.array_equal(pts, pts2)


def test_affine_recovery_sampled():
    """Stochastic-similarity affine (n_samples>0, elastix-style) recovers
    the same transform as the dense path within the dense test's bound.
    n_samples=1024 activates sampling at level 1 only (48·56·40 voxels >
    64·1024; the level-2 grid stays dense per the 64× bar)."""
    moving = _brain_like()
    true = np.array(
        [
            [1.08, 0.03, 0.0, -2.0],
            [-0.02, 0.95, 0.04, 3.0],
            [0.0, 0.02, 1.05, -1.5],
        ],
        np.float32,
    )
    fixed = _apply_affine_to_volume(moving, true, moving.shape)
    est, ncc = register_affine(
        fixed, moving, levels=(2, 1), iters=(300, 150), n_samples=1024
    )
    # the reported score is a DENSE evaluation (comparable to the dense path)
    assert ncc > 0.99
    pts = np.array([[24, 28, 20], [15, 35, 25], [30, 20, 15]], np.float32)
    true_m = pts @ true[:, :3].T + true[:, 3]
    est_m = pts @ est[:, :3].T + est[:, 3]
    err = np.abs(true_m - est_m).max()
    assert err < 1.25, f"max point error {err}"
    # deterministic for a fixed seed
    est2, _ = register_affine(
        fixed, moving, levels=(2, 1), iters=(300, 150), n_samples=1024
    )
    np.testing.assert_array_equal(est, est2)


def test_bspline_sampled_recovery():
    """Stochastic-similarity FFD (the 64-tap point-gather loss) recovers a
    known field within the dense test's point bound."""
    moving = _brain_like(seed=2)
    true_field = BSplineField.zeros(moving.shape, spacing=16.0)
    rng = np.random.default_rng(3)
    true_field.ctrl = rng.normal(0, 1.6, true_field.ctrl.shape).astype(
        np.float32
    )
    disp = np.asarray(true_field.dense_field())
    grid = np.asarray(fixed_grid(moving.shape))
    fixed = np.asarray(
        sample_volume(jnp.asarray(moving), jnp.asarray(grid + disp))
    )

    affine, _ = register_affine(
        fixed, moving, levels=(2, 1), iters=(200, 100), n_samples=1024
    )
    field, _ = register_bspline(
        fixed, moving, affine, spacing=16.0, iters=200, lr=0.25,
        n_samples=1024,
    )
    pts = np.array([[20, 30, 20], [25, 25, 18], [30, 35, 22]], np.float32)
    true_m = pts + np.asarray(true_field.at_points(pts))
    est_m = warp_points(affine, field, pts)
    err = np.abs(true_m - est_m).max()
    assert err < 2.0, f"max point error {err}"


def test_warp_points_affine_only():
    affine = np.array([[2.0, 0, 0, 1.0], [0, 0.5, 0, 0], [0, 0, 1.0, -3.0]], np.float32)
    pts = np.array([[1.0, 2.0, 3.0]], np.float32)
    out = warp_points(affine, None, pts)
    np.testing.assert_allclose(out, [[3.0, 1.0, 0.0]])
