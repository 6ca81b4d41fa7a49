"""Measure the streaming engine's double-buffered IO pipeline on TPU.

The streaming path serializes, per slab: host slice → H2D upload → compute
→ D2H readback → memmap writes. ``prefetch=True`` moves the loads onto a
loader thread and the finalize IO onto an ordered writer thread, so both
directions of IO overlap compute. On this rig the tunnel moves ~30 MB/s
each way, making the win large; on a production PCIe host the same overlap
hides the (smaller) IO share.

Interleaved A/B, min-of-N, binary output only (the production stage-2
streaming shape). Run on the TPU rig:
    python scripts/probe_streaming_prefetch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig  # noqa: E402
from delivr_cfos_tpu.engine.streaming import infer_volume_streaming  # noqa: E402
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, init_params  # noqa: E402


def main():
    backend = jax.default_backend()
    shape = (432, 480, 384) if backend == "tpu" else (96, 96, 64)
    rng = np.random.default_rng(0)
    vol = np.zeros(shape, np.uint16)
    vol[:, : shape[1] // 2] = (
        rng.random((shape[0], shape[1] // 2, shape[2])) * 900 + 100
    ).astype(np.uint16)
    vol = np.ascontiguousarray(vol)

    model_cfg = (
        BasicUNetConfig.fast()
        if backend == "tpu"
        else BasicUNetConfig(features=(4, 4, 8, 16, 32, 4))
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    cfg = SlidingWindowConfig(
        roi=(96, 96, 64) if backend == "tpu" else (16, 16, 16),
        overlap=0.5,
        batch_size=0 if backend == "tpu" else 2,
    )

    binary = np.zeros(shape, np.uint8)  # pre-touch: lazily-backed host pages
    gvox = vol.size / 1e9

    def run(prefetch):
        t0 = time.perf_counter()
        infer_volume_streaming(
            params,
            vol,
            cfg,
            model_cfg,
            slab_z_starts=2,
            binary_out=binary,
            prefetch=prefetch,
        )
        return time.perf_counter() - t0

    run(True)  # warmup/compile
    times = {True: [], False: []}
    for _ in range(3):
        for pf in (False, True):
            times[pf].append(run(pf))
    for pf in (False, True):
        best = min(times[pf])
        print(
            f"prefetch={pf}: min {best:.3f}s  {gvox / best:.4f} GVox/s  "
            f"(all: {[f'{t:.2f}' for t in times[pf]]})"
        )
    print(f"speedup: {min(times[False]) / min(times[True]):.3f}x")


if __name__ == "__main__":
    main()
