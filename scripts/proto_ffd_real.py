"""Tune the real-texture FFD acceptance case: print affine-only vs
affine+FFD point errors for a few FFD settings so the test bounds are set
from measurements. Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/proto_ffd_real.py
"""

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

REAL_PATCH = "/root/reference/training_data/cFos/raw/patchvolume_1008_0.nii.gz"


def main():
    raw = read_nifti_raw(REAL_PATCH).astype(np.float32)
    moving = np.transpose(raw, (2, 1, 0))
    moving = np.clip(moving / np.percentile(moving, 99.5) * 255.0, 0, 255)

    th = 0.10
    rot = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]]
    )
    A_true = np.zeros((3, 4), np.float32)
    A_true[:, :3] = rot @ np.diag([1.05, 0.96, 1.04])
    A_true[:, 3] = [1.5, -2.0, 2.5]
    field_true = BSplineField.zeros(moving.shape, spacing=20.0)
    # coherent low-frequency ground-truth warp (measured: iid-random control
    # values smooth into a sub-voxel effective field that the affine nearly
    # absorbs, leaving MI-FFD nothing recoverable above its noise floor)
    nz, ny, nx, _ = field_true.ctrl.shape
    cz, cy, cx = np.meshgrid(
        np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij"
    )
    ctrl = np.stack(
        [
            3.5 * np.sin(2 * np.pi * cz / nz + 0.4),
            3.0 * np.cos(2 * np.pi * cy / ny + 1.1),
            3.5 * np.sin(2 * np.pi * (cx / nx + cz / nz)),
        ],
        axis=-1,
    )
    field_true.ctrl = ctrl.astype(np.float32)
    tf_true = affine_ffd_transform_fn(A_true, field_true)
    fixed_clean = apply_transform_volume(moving, moving.shape, tf_true)
    fixed = lsfm_degrade(
        fixed_clean, seed=4, blur_sigma=(1.6, 0.7, 0.7), noise_std=3.0,
        fov_crop_z=0.0,
    )

    t0 = time.time()
    A_est, _ = register_affine(
        fixed, moving, similarity="mi",
        levels=(2, 1), iters=(400, 200), lrs=(0.01, 0.004),
    )
    print(f"affine done {time.time()-t0:.0f}s")

    zz, yy, xx = np.nonzero(fixed_clean > np.percentile(fixed_clean, 99))
    prng = np.random.default_rng(3)
    idx = prng.choice(zz.shape[0], size=min(500, zz.shape[0]), replace=False)
    pts = jnp.asarray(np.stack([zz[idx], yy[idx], xx[idx]], 1).astype(np.float32))
    true = np.asarray(tf_true(pts))

    def report(name, tf):
        est = np.asarray(tf(pts))
        err = np.linalg.norm(est - true, axis=1)
        print(
            f"{name}: mean {err.mean():.3f} p95 {np.percentile(err,95):.3f} "
            f"max {err.max():.3f}"
        )
        return err.mean()

    report("affine-only", affine_transform_fn(A_est))

    import json

    variants = (
        json.loads(sys.argv[1])
        if len(sys.argv) > 1
        else [[20.0, 300, 0.3, 1e-3], [20.0, 600, 0.3, 1e-3]]
    )
    for spacing, iters, lr, bw in variants:
        t0 = time.time()
        field_est, _ = register_bspline(
            fixed, moving, A_est, spacing=spacing, iters=iters, lr=lr,
            bending_weight=bw, similarity="mi",
        )
        dt = time.time() - t0
        m = report(
            f"ffd sp={spacing} it={iters} lr={lr} bw={bw} ({dt:.0f}s)",
            affine_ffd_transform_fn(A_est, field_est),
        )


if __name__ == "__main__":
    main()
