"""Prototype for the full six-stage e2e: build a synthetic 50 µm template +
an affinely-related brain, push the brain through stage-1-like processing
(block mean + 8-bit stretch), register, and measure point-warp error vs the
ground-truth affine. Run: JAX_PLATFORMS=cpu python scripts/proto_full_e2e.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


TEMPLATE_SHAPE = (228, 160, 264)  # mBrainAligner 50 µm (z, y, x)


def template_fn(z, y, x):
    """Analytic template: ellipsoidal brain with smooth multi-axis texture.
    Accepts broadcastable float arrays in template voxel coords."""
    c = (80.0, 80.0, 130.0)
    r = (58.0, 60.0, 108.0)
    q = (
        ((z - c[0]) / r[0]) ** 2
        + ((y - c[1]) / r[1]) ** 2
        + ((x - c[2]) / r[2]) ** 2
    )
    inside = (q <= 1.0).astype(np.float32)
    tex = (
        150.0
        + 60.0 * np.sin(2 * np.pi * z / 50.0)
        + 45.0 * np.cos(2 * np.pi * y / 40.0)
        + 35.0 * np.sin(2 * np.pi * x / 60.0)
        - 70.0 * q  # radial falloff gives the registration a strong anchor
        # strongly mirror-asymmetric parts so the multistart flip race has
        # a unique winner: linear ramps + an off-center bright lobe
        + 0.45 * z
        + 0.5 * y
        + 0.25 * x
        + 90.0 * np.exp(
            -((z - 55.0) ** 2 + (y - 55.0) ** 2 + (x - 85.0) ** 2)
            / (2 * 22.0**2)
        )
    )
    return inside * np.clip(tex, 10.0, None)


def build_template():
    Z, Y, X = TEMPLATE_SHAPE
    z, y, x = np.meshgrid(
        np.arange(Z, dtype=np.float32),
        np.arange(Y, dtype=np.float32),
        np.arange(X, dtype=np.float32),
        indexing="ij",
    )
    return template_fn(z, y, x).astype(np.float32)


# ground-truth affine: fixed (downsampled brain, (23, 24, 24)) -> template
def gt_affine(fixed_shape):
    s = np.array([100.0 / fixed_shape[0], 120.0 / fixed_shape[1], 200.0 / fixed_shape[2]])
    A = np.diag(s)
    # small in-plane rotation (y-x) of 4 degrees
    th = np.deg2rad(4.0)
    R = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]]
    )
    A = A @ R
    t = np.array([30.0, 20.0, 30.0])
    return np.concatenate([A, t[:, None]], axis=1).astype(np.float32)


def main():
    RAW = (24, 96, 96)
    RATIOS = (1, 4, 4)
    ds_depth = int(np.ceil(RAW[0] / RATIOS[0])) - 1  # reference z-chunk quirk
    fixed_shape = (ds_depth, RAW[1] // RATIOS[1], RAW[2] // RATIOS[2])
    print("fixed_shape", fixed_shape)

    A = gt_affine(fixed_shape)

    # brain at raw resolution: evaluate template at A(raw/ratios)
    zz, yy, xx = np.meshgrid(
        np.arange(RAW[0], dtype=np.float32) / RATIOS[0],
        (np.arange(RAW[1], dtype=np.float32) + 0.5) / RATIOS[1] - 0.5,
        (np.arange(RAW[2], dtype=np.float32) + 0.5) / RATIOS[2] - 0.5,
        indexing="ij",
    )
    pts = np.stack([zz, yy, xx], -1).reshape(-1, 3)
    tpts = pts @ A[:, :3].T + A[:, 3]
    raw = template_fn(tpts[:, 0], tpts[:, 1], tpts[:, 2]).reshape(RAW)
    rng = np.random.default_rng(0)
    raw16 = np.clip(raw * 80.0 + rng.normal(0, 30, RAW), 0, 65535).astype(
        np.uint16
    )
    # background noise under the threshold
    raw16 = np.where(raw > 1.0, np.maximum(raw16, 300), raw16)

    # stage-1-like processing: block mean + threshold mask + 8-bit stretch
    import jax.numpy as jnp

    from delivr_cfos_tpu.ops.resample import block_mean_downsample

    chunks = []
    for z0 in range(0, RAW[0] - RATIOS[0], RATIOS[0]):
        chunk = raw16[z0 : z0 + RATIOS[0]]
        chunks.append(
            np.asarray(
                block_mean_downsample(jnp.asarray(chunk), RATIOS)
            )
        )
    ds = np.concatenate(chunks, axis=0).astype(np.uint16)
    print("ds shape", ds.shape)
    mask = (ds > 250).astype(np.uint16)
    masked = (mask * ds).astype(np.uint16)
    minval = round(float(np.percentile(masked, 1)))
    maxval = round(float(np.percentile(masked, 99)))
    clipped = np.clip(masked, minval, maxval)
    eq16 = ((clipped.astype(np.float64) - minval) / max(maxval - minval, 1) * 65534).astype(np.uint16)
    fixed8 = (eq16 >> 8).astype(np.uint8)
    print("fixed8 stats", fixed8.min(), fixed8.max(), (fixed8 > 0).mean())

    template = build_template()
    print("template built", template.shape, template.max())

    from delivr_cfos_tpu.registration.affine import register_affine_multistart

    t0 = time.time()
    aff, score, flip = register_affine_multistart(
        fixed8.astype(np.float32), template, similarity="ncc"
    )
    print(f"registered in {time.time()-t0:.1f}s score {score:.4f} flip {flip}")

    # point-warp error over brain-interior fixed points
    zi, yi, xi = np.nonzero(fixed8 > 10)
    sel = rng.choice(len(zi), size=min(500, len(zi)), replace=False)
    p = np.stack([zi[sel], yi[sel], xi[sel]], -1).astype(np.float32)
    gt = p @ A[:, :3].T + A[:, 3]
    est = p @ aff[:, :3].T + aff[:, 3]
    err = np.linalg.norm(gt - est, axis=1)
    print(f"point-warp error: mean {err.mean():.2f} p95 {np.percentile(err,95):.2f} max {err.max():.2f} (template voxels)")


if __name__ == "__main__":
    main()
