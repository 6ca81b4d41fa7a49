"""Mosaic-of-real-patches brain phantom (VERDICT r3 missing-2): tile real
cFos LSFM patches into a brain-scale phantom, warp through a known
affine+FFD, degrade, and measure MI affine+FFD recovery. Establishes the
bounds for the acceptance test. CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -u scripts/proto_mosaic_phantom.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from delivr_cfos_tpu.registration.affine import register_affine
from delivr_cfos_tpu.registration.bspline import BSplineField, register_bspline
from delivr_cfos_tpu.registration.validate import (
    affine_ffd_transform_fn,
    affine_transform_fn,
    apply_transform_volume,
    lsfm_degrade,
)
from delivr_cfos_tpu.utils.io.nifti import read_nifti_raw

RAW_DIR = "/root/reference/training_data/cFos/raw"


def build_mosaic(n_y=2, n_x=2, seed=0):
    """(100, 100·n_y, 100·n_x) phantom: distinct real patches, blended at
    seams, inside an ellipsoidal brain mask with zero outside."""
    paths = sorted(glob.glob(os.path.join(RAW_DIR, "*.nii.gz")))
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(paths), size=n_y * n_x, replace=False)
    tiles = []
    for p in picks:
        raw = read_nifti_raw(paths[p]).astype(np.float32)
        vol = np.transpose(raw, (2, 1, 0))
        vol = np.clip(vol / np.percentile(vol, 99.5) * 255.0, 0, 255)
        tiles.append(vol)
    rows = [
        np.concatenate(tiles[i * n_x : (i + 1) * n_x], axis=2)
        for i in range(n_y)
    ]
    mosaic = np.concatenate(rows, axis=1)
    # ellipsoidal brain mask so the phantom has a real outline to lock onto
    Z, Y, X = mosaic.shape
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij"
    )
    q = (
        ((zz - Z / 2) / (Z / 1.9)) ** 2
        + ((yy - Y / 2) / (Y / 1.9)) ** 2
        + ((xx - X / 2) / (X / 1.9)) ** 2
    )
    return (mosaic * (q <= 1.0)).astype(np.float32)


def main():
    moving = build_mosaic()
    print("mosaic", moving.shape)

    th = 0.08
    rot = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]]
    )
    A_true = np.zeros((3, 4), np.float32)
    A_true[:, :3] = rot @ np.diag([1.04, 0.97, 1.03])
    A_true[:, 3] = [2.0, -3.0, 4.0]
    field_true = BSplineField.zeros(moving.shape, spacing=25.0)
    nz, ny, nx, _ = field_true.ctrl.shape
    cz, cy, cx = np.meshgrid(
        np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij"
    )
    field_true.ctrl = np.stack(
        [
            3.0 * np.sin(2 * np.pi * cz / nz + 0.7),
            3.5 * np.cos(2 * np.pi * cy / ny + 0.3),
            3.0 * np.sin(2 * np.pi * (cx / nx + cy / ny)),
        ],
        axis=-1,
    ).astype(np.float32)
    tf_true = affine_ffd_transform_fn(A_true, field_true)

    t0 = time.time()
    # full-grid warp via the DENSE field (the per-point gather form carries
    # ~8 KB/point of TPU layout padding; dense_field is a 3-matmul chain)
    from delivr_cfos_tpu.registration.warp import (
        affine_apply,
        fixed_grid,
        sample_volume,
    )

    Z, Y, X = moving.shape
    grid = fixed_grid(moving.shape)
    coords = affine_apply(
        jnp.asarray(A_true), grid.reshape(-1, 3)
    ).reshape(Z, Y, X, 3) + field_true.dense_field()
    fixed_clean = np.asarray(sample_volume(jnp.asarray(moving), coords))
    fixed = lsfm_degrade(
        fixed_clean, seed=2, blur_sigma=(1.8, 0.8, 0.8), noise_std=4.0,
        fov_crop_z=0.0,
    )
    print(f"phantom warped in {time.time()-t0:.0f}s")

    t0 = time.time()
    A_est, _ = register_affine(
        fixed, moving, similarity="mi",
        levels=(4, 2), iters=(300, 200), lrs=(0.02, 0.008),
    )
    print(f"affine {time.time()-t0:.0f}s")
    t0 = time.time()
    levels = (2, 1) if "--multires" in sys.argv else (1,)
    iters = (200, 60) if levels == (2, 1) else 200
    field_est, _ = register_bspline(
        fixed, moving, A_est, spacing=25.0, iters=iters, similarity="mi",
        levels=levels,
    )
    print(f"ffd levels={levels} {time.time()-t0:.0f}s")

    zz, yy, xx = np.nonzero(fixed_clean > np.percentile(fixed_clean, 99))
    rng = np.random.default_rng(5)
    idx = rng.choice(zz.shape[0], size=min(600, zz.shape[0]), replace=False)
    pts = jnp.asarray(np.stack([zz[idx], yy[idx], xx[idx]], 1).astype(np.float32))
    true = np.asarray(tf_true(pts))
    for name, tf in [
        ("affine", affine_transform_fn(A_est)),
        ("affine+ffd", affine_ffd_transform_fn(A_est, field_est)),
    ]:
        err = np.linalg.norm(np.asarray(tf(pts)) - true, axis=1)
        print(
            f"{name}: mean {err.mean():.3f} p95 {np.percentile(err,95):.3f} "
            f"max {err.max():.3f}"
        )


if __name__ == "__main__":
    main()
