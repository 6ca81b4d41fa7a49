"""Calibrate auto_batch_size's live-activation model against real HBM
telemetry (VERDICT r2 weak #6: the "8 × roi × f0" estimate was asserted,
not measured).

Runs the fast-mode forward at several batch sizes on the TPU and reads
`device.memory_stats()` peak deltas; prints measured bytes/window next to
the heuristic's estimate.

Run: python scripts/calibrate_batch.py   (TPU host)
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import auto_batch_size
from delivr_cfos_tpu.models.basic_unet import (
    BasicUNetConfig,
    basic_unet_apply,
    init_params,
)

ROI = (96, 96, 64)


def peak_bytes():
    stats = jax.devices()[0].memory_stats() or {}
    return int(stats.get("peak_bytes_in_use", 0)), int(
        stats.get("bytes_in_use", 0)
    )


def main():
    cfg = BasicUNetConfig.fast()
    params = init_params(jax.random.PRNGKey(0), cfg)
    roi_vox = int(np.prod(ROI))
    dtype_bytes = 2
    model_per_window = 8 * roi_vox * cfg.features[0] * dtype_bytes

    print(f"heuristic per-window estimate: {model_per_window / 2**20:.0f} MiB")
    rows = []
    for batch in (2, 4, 8, 16):
        x = jnp.asarray(
            np.random.default_rng(0)
            .random((batch, *ROI, 1))
            .astype(np.float32)
        )

        @jax.jit
        def fwd(x):
            return basic_unet_apply(params, x, cfg)

        out = fwd(x)
        _ = float(np.asarray(out[0, 0, 0, 0, 0]))  # sync
        base_peak, base_now = peak_bytes()
        # second run from a clean high-water mark is impossible without
        # resetting stats; instead compare peaks across batch sizes below
        rows.append((batch, base_peak, base_now, x.nbytes + out.nbytes))
        del x, out

    print(f"{'batch':>5} {'peak MiB':>10} {'in-use MiB':>11} {'io MiB':>8}")
    for batch, peak, now, io in rows:
        print(f"{batch:5d} {peak / 2**20:10.0f} {now / 2**20:11.0f} "
              f"{io / 2**20:8.0f}")
    # slope between successive batch sizes ≈ live bytes per extra window
    for (b0, p0, _, _), (b1, p1, _, _) in zip(rows, rows[1:]):
        slope = (p1 - p0) / (b1 - b0)
        print(
            f"measured slope {b0}->{b1}: {slope / 2**20:.0f} MiB/window "
            f"(heuristic {model_per_window / 2**20:.0f})"
        )
    print("auto_batch_size() on this device:",
          auto_batch_size(ROI, cfg, volume_bytes=0))


if __name__ == "__main__":
    main()
