"""Trace one full infer_volume run on the bench volume and print the
per-op device-time table — shows engine overheads (accumulate scans,
window maxes, skip folding, divide) that the forward-only trace
(trace_forward.py) does not cover.

Run on the TPU host:  python scripts/trace_engine.py
"""

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import (
    SlidingWindowConfig,
    infer_volume,
)
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, init_params


def main():
    Z, Y, X = 192, 480, 384  # the bench volume
    rng = np.random.default_rng(0)
    vol = np.zeros((Z, Y, X), np.uint16)
    vol[:, : Y // 2] = (rng.random((Z, Y // 2, X)) * 900 + 100).astype(
        np.uint16
    )
    cfg = SlidingWindowConfig(roi=(96, 96, 64), overlap=0.5, batch_size=0)
    model_cfg = BasicUNetConfig.fast()
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    vol_dev = jnp.asarray(vol)
    _ = float(np.asarray(vol_dev[0, 0, 0]))

    def run():
        out, _ = infer_volume(
            params, vol_dev, cfg, model_cfg, return_binary=False
        )
        return float(np.asarray(out[0, 0, 0]))

    run()  # compile
    import time

    t0 = time.perf_counter()
    run()
    total_s = time.perf_counter() - t0
    print(f"wall: {total_s * 1e3:.1f} ms "
          f"({vol.size / total_s / 1e9:.4f} GVox/s)")

    trace_dir = tempfile.mkdtemp(prefix="delivr_engine_trace_")
    with jax.profiler.trace(trace_dir):
        run()

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not files:
        print("no xplane captured", trace_dir)
        return
    data = jax.profiler.ProfileData.from_file(files[0])
    per_op = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns / 1e6
    total = sum(per_op.values())
    print(f"device op-total {total:.1f} ms (spans overlap)")
    print(f"{'op':58s} {'ms':>8s} {'%':>5s}")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{name[:58]:58s} {ms:8.2f} {100 * ms / total:5.1f}")


if __name__ == "__main__":
    main()
