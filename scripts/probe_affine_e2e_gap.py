"""Bisect the e2e-fixture affine error: fixture geometry vs backend (VERDICT r4 item 5).

`bench_full_e2e_tpu.py` measured affine_err_mean = 7.68 template-vox on the
TPU while the Allen-scale probe sits at 1.11 and the mosaic phantom at 1.27.
Three candidate causes: (a) fixture geometry — the e2e fixture's fixed brain
is only (23, 24, 24) and its GT affine scales it ~(4.3, 5.0, 8.3)x into the
(228, 160, 264) template, so one fixed-voxel of registration slack is ~6
template-vox; (b) bf16/precision on the TPU backend; (c) the stochastic
similarity sampling.

This probe runs the EXACT stage-4 entry (`register_affine_multistart`, ncc,
fixture settings) on the same synthetic fixed/template pair in two fresh
subprocesses — one forced to CPU, one on the TPU — and reports the error at
the blob ground truth in BOTH frames (template-vox and fixed-vox, i.e.
error pulled back through the GT scale). Equal CPU/TPU errors => (a);
a TPU-only inflation => (b)/(c).

Usage: python scripts/probe_affine_e2e_gap.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
platform = sys.argv[1]
if platform == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import test_pipeline_full_e2e as fx
from delivr_cfos_tpu.registration.affine import register_affine_multistart

A = fx.gt_affine()

# fixed = the template pulled back through A_gt on the DS grid — the same
# signal content stage 1 hands stage 4 (sans blobs/noise; both backends see
# the identical array, which is the point of the bisect)
Z, Y, X = fx.DS_SHAPE
zz, yy, xx = np.meshgrid(
    np.arange(Z, dtype=np.float64),
    np.arange(Y, dtype=np.float64),
    np.arange(X, dtype=np.float64),
    indexing="ij",
)
pts = np.stack([zz, yy, xx], -1).reshape(-1, 3)
tpts = pts @ A[:, :3].T + A[:, 3]
fixed = fx.template_fn(tpts[:, 0], tpts[:, 1], tpts[:, 2]).reshape(fx.DS_SHAPE)

TZ, TY, TX = fx.TEMPLATE_SHAPE
tz, ty, tx = np.meshgrid(
    np.arange(TZ, dtype=np.float64),
    np.arange(TY, dtype=np.float64),
    np.arange(TX, dtype=np.float64),
    indexing="ij",
)
template = fx.template_fn(tz, ty, tx).astype(np.float32)

t0 = time.time()
A_est, score, flip = register_affine_multistart(
    fixed.astype(np.float32), template, similarity="ncc", n_samples=0
)
dt = time.time() - t0

blobs = np.array(fx.BLOBS_FRONT + fx.BLOBS_BACK, np.float64)
est = blobs @ A_est[:, :3].T + A_est[:, 3]
true = blobs @ A[:, :3].T + A[:, 3]
err_t = np.linalg.norm(est - true, axis=1)
# pull the same displacement back to fixed-voxel units through the GT scale
scale = np.array([100.0 / fx.DS_SHAPE[0], 120.0 / fx.DS_SHAPE[1],
                  200.0 / fx.DS_SHAPE[2]])
err_f = np.linalg.norm((est - true) / scale, axis=1)

print(json.dumps({
    "backend": jax.devices()[0].platform,
    "ncc": round(float(score), 4),
    "flip": list(flip),
    "err_template_vox_mean": round(float(err_t.mean()), 2),
    "err_template_vox_max": round(float(err_t.max()), 2),
    "err_fixed_vox_mean": round(float(err_f.mean()), 3),
    "err_fixed_vox_max": round(float(err_f.max()), 3),
    "seconds": round(dt, 1),
}))
"""


def run(platform: str, timeout: int = 2400):
    env = dict(os.environ)
    if platform == "cpu":
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, platform],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": (proc.stdout[-1000:] + proc.stderr[-1000:])}


if __name__ == "__main__":
    platforms = sys.argv[1:] or ["cpu", "default"]
    for p in platforms:
        print(json.dumps({p: run(p)}), flush=True)
