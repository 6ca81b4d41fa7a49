"""Capture a jax.profiler trace of the fast-mode forward pass and print a
per-op device-time table (the PERF.md trace-table methodology, automated).

Run on the TPU host:  python scripts/trace_forward.py [batch]
"""

import functools
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.models.basic_unet import (
    BasicUNetConfig,
    basic_unet_apply,
    init_params,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = BasicUNetConfig.fast()
    params = init_params(jax.random.PRNGKey(0), cfg)
    # generate ON DEVICE: this rig's host->device tunnel can run at
    # ~0.1 MB/s under load (see bench.py) — a 19 MB upload can hang for
    # minutes and a killed-mid-transfer process wedges the grant
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 96, 96, 64, 1))

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(c, _):
            y = basic_unet_apply(params, c, cfg)
            return c + y.astype(c.dtype) * 1e-6, y[0, 0, 0, 0, 0]

        out, ys = jax.lax.scan(body, x, None, length=n)
        return out[0, 0, 0, 0, 0] + ys.sum()

    n_steps = 10
    _ = float(np.asarray(chain(x, n_steps)))  # compile
    trace_dir = tempfile.mkdtemp(prefix="delivr_trace_")
    with jax.profiler.trace(trace_dir):
        _ = float(np.asarray(chain(x, n_steps)))

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
    print(f"device total over {n_steps} steps: {total:.1f} ms "
          f"({total / n_steps:.2f} ms/step)")
    width = int(os.environ.get("DELIVR_TRACE_NAME_WIDTH", "55"))
    print(f"{'op':{width}s} {'ms/step':>8s} {'%':>5s}")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{name[:width]:{width}s} {ms / n_steps:8.3f} "
              f"{100 * ms / total:5.1f}")


if __name__ == "__main__":
    main()
