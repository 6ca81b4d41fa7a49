"""Stage-4 intensity registration at PRODUCTION scale (VERDICT r3: the
per-stage wall-clock picture stopped at stage 3): Allen 50 µm template
shape (228, 160, 264) = 9.6 MVox, synthetic Voronoi atlas, brain = atlas
pulled back through a known affine + B-spline field with LSFM degradation,
recovered by the production path (multistart MI affine + MI FFD). Reports
per-phase wall seconds and point-recovery error — the stage-4 row for
PERF.md's per-stage table. TPU:
  python -u scripts/probe_stage4_scale.py [--multires]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from delivr_cfos_tpu.registration.affine import register_affine_multistart
from delivr_cfos_tpu.registration.bspline import BSplineField, register_bspline
from delivr_cfos_tpu.registration.validate import (
    affine_ffd_transform_fn,
    affine_transform_fn,
    lsfm_degrade,
    make_synthetic_atlas,
)
from delivr_cfos_tpu.registration.warp import (
    affine_apply,
    fixed_grid,
    sample_volume,
)

SHAPE = (228, 160, 264)  # Allen CCF3 50 um, (z, y, x) per config.py


def main():
    t_all = time.time()
    cache = "/tmp/s4_atlas_cache.npy"  # the 40-region Voronoi build is
    # ~19 min on this box's single host core; cache it across probe runs
    if os.path.exists(cache):
        moving = np.load(cache)
    else:
        moving, _ = make_synthetic_atlas(SHAPE, n_regions=40, seed=0)
        np.save(cache, moving)
    print("atlas", moving.shape, flush=True)

    th = 0.06
    rot = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]]
    )
    A_true = np.zeros((3, 4), np.float32)
    A_true[:, :3] = rot @ np.diag([1.05, 0.96, 1.02])
    A_true[:, 3] = [3.0, -4.0, 5.0]
    field_true = BSplineField.zeros(moving.shape, spacing=32.0)
    nz, ny, nx, _ = field_true.ctrl.shape
    cz, cy, cx = np.meshgrid(
        np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij"
    )
    field_true.ctrl = np.stack(
        [
            3.5 * np.sin(2 * np.pi * cz / nz + 0.5),
            4.0 * np.cos(2 * np.pi * cy / ny + 0.2),
            3.5 * np.sin(2 * np.pi * (cx / nx + cz / nz)),
        ],
        axis=-1,
    ).astype(np.float32)
    tf_true = affine_ffd_transform_fn(A_true, field_true)

    t0 = time.time()
    fcache = "/tmp/s4_fixed_cache.npz"  # phantom build is host-core bound
    if os.path.exists(fcache):
        dat = np.load(fcache)
        fixed_clean, fixed = dat["clean"], dat["deg"]
    else:
        Z, Y, X = moving.shape
        grid = fixed_grid(moving.shape)
        coords = affine_apply(
            jnp.asarray(A_true), grid.reshape(-1, 3)
        ).reshape(Z, Y, X, 3) + field_true.dense_field()
        fixed_clean = np.asarray(sample_volume(jnp.asarray(moving), coords))
        fixed = lsfm_degrade(
            fixed_clean, seed=1, blur_sigma=(1.6, 0.8, 0.8), noise_std=4.0,
            fov_crop_z=0.0,
        )
        np.savez(fcache, clean=fixed_clean, deg=fixed)
    print(f"phantom built {time.time()-t0:.0f}s", flush=True)

    ns = 0
    if "--samples" in sys.argv:
        ns = int(sys.argv[sys.argv.index("--samples") + 1])
    t0 = time.time()
    A_est, score, flip = register_affine_multistart(
        fixed, moving, similarity="mi", n_samples=ns
    )
    t_aff = time.time() - t0
    print(f"multistart affine {t_aff:.0f}s score {score:.4f} flip {flip}", flush=True)

    t0 = time.time()
    levels = (2, 1) if "--multires" in sys.argv else (1,)
    iters = (150, 50) if levels == (2, 1) else 150
    field_est, _ = register_bspline(
        fixed, moving, A_est, spacing=32.0, iters=iters, similarity="mi",
        levels=levels, n_samples=ns,
    )
    t_ffd = time.time() - t0
    print(f"ffd levels={levels} {t_ffd:.0f}s", flush=True)

    zz, yy, xx = np.nonzero(fixed_clean > np.percentile(fixed_clean, 99))
    rng = np.random.default_rng(5)
    idx = rng.choice(zz.shape[0], size=min(800, zz.shape[0]), replace=False)
    pts = jnp.asarray(
        np.stack([zz[idx], yy[idx], xx[idx]], 1).astype(np.float32)
    )
    true = np.asarray(tf_true(pts))
    for name, tf in [
        ("affine", affine_transform_fn(A_est)),
        ("affine+ffd", affine_ffd_transform_fn(A_est, field_est)),
    ]:
        err = np.linalg.norm(np.asarray(tf(pts)) - true, axis=1)
        print(
            f"{name}: mean {err.mean():.3f} p95 {np.percentile(err,95):.3f} "
            f"max {err.max():.3f}", flush=True,
        )
    print(f"total stage-4-scale wall {time.time()-t_all:.0f}s", flush=True)


if __name__ == "__main__":
    main()
