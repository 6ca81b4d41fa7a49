"""Benchmark: sliding-window UNet inference throughput (GVoxel/s per chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GVoxel/s", "vs_baseline": N,
     "parity_mode_value": N, "fast_mode": {...}}

Measures the end-to-end single-pass sliding-window throughput of the
full-size BasicUNet (features (32,32,64,128,256,32), window 96×96×64,
overlap 0.5 — the reference's production configuration, config.json:24-28,
inference.py:125,190-197) over a synthetic brain-like volume resident in
device memory, in OUTPUT voxels per second over the whole volume (each
output voxel costs ~8 window-voxel computations at 0.5 overlap; the
background-skip scheduler removes the empty half of the volume, as in the
reference).

Two modes are reported (VERDICT r1 item 2a):
- **fast** (headline `value`): BasicUNetConfig.fast() — bf16 activations on
  the MXU with f32 conv accumulation and f32 instance-norm statistics.
  Logits differ from the f32 path only at bf16 rounding level.
- **parity** (`parity_mode_value`): float32 / precision='highest', the
  bit-stability configuration the pipeline uses by default.

Measured physics on TPU v5e (r2/r3 profiling; see PERF.md): the model is
32 channels wide (M=32 of the MXU's 128 rows per conv dot). Round 2
measured a ~34 TFLOP/s per-conv ceiling at that width; round 3 diagnosed
it as an M-row ceiling and broke it with multi-plane packing (P output
z-planes share one (P·32)-row accumulator) — the production conv kernel
now runs at 83.5 TFLOP/s real (vs 16.2 for XLA's emitter at P=1 shape).
With reference semantics (8× overlap redundancy, halo-doubled windows)
the full-volume pass measures 0.0365 GVox/s; the conv FLOPs alone at the
kernel's measured rate bound the engine at ~0.05 on one chip, with the
gap held by the deconv chain, pooling, epilogues and dispatch (trace
table in PERF.md).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator is a documented estimate of the reference's per-GPU
single-pass effective throughput, 0.012 GVox/s, derived as follows: the
reference's own VRAM calibration (~810 MB per 96×96×64 window,
inference.py:177-186) puts ~11 windows in flight on a 2080Ti-class 11 GB
GPU; MONAI-style sliding-window pipelines with host-side accumulation and
per-batch H2D/D2H round-trips (SURVEY.md §3.3) are observed at ~20-25
windows/s on that class of hardware ⇒ ~22 win/s × 0.59 MVox/window ÷ 8×
coverage ÷ ~0.65 host-overhead factor ≈ 0.012 GVox/s of unique output.

The measurement runs in a watchdog subprocess (the TPU tunnel in this image
can wedge on device transfers); on timeout it falls back to the CPU backend
and says so in the metric name. Timing forces a host readback after each
run: on the axon backend ``block_until_ready`` returns before execution
completes, so readback is the only reliable synchronization.

**Wall-budget design (round 5).** The driver's bench capture has a finite
timeout; round 4 produced rc=124 with an empty tail because this script
withheld its one JSON line until all five children finished. Now:

- the headline line is printed (and flushed) the moment the ``fast`` child
  lands — a driver-side kill after that point still captures the metric;
- every child is gated on a self-imposed total wall budget
  (``DELIVR_BENCH_BUDGET_S``, default 1080 s) and sized so the budget can
  never be exceeded by a single slow child;
- the blind 1500 s TPU retry is replaced by a 120 s tiny-op probe — if the
  probe can't touch the chip, we fall straight back to CPU;
- the ``cells`` child caches its trained params in ``.bench_cache/`` keyed
  by the fixture config, so the expensive on-chip training runs once per
  machine, not once per invocation;
- children share a persistent XLA compilation cache (``.jax_cache/``) so
  repeat invocations skip most compile time.

As each enrichment child (cells/parity/tta) completes within budget, the
cumulative result line re-prints with that child's fields added; consumers
that parse the last JSON line get everything that landed before any kill,
consumers that parse the first get the headline.
"""

import json
import os
import subprocess
import sys
import time

_CHILD_CODE = r"""
import json, sys, time
import numpy as np

platform = sys.argv[1]
mode = sys.argv[2]
# platform selection happens in the PARENT's env (see _run_child): this
# image's sitecustomize registers the TPU plugin before this code runs
import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, init_params

backend = jax.default_backend()
# brain-like synthetic volume: bright foreground half, empty half.
# Generated ON DEVICE: this rig's host->device tunnel measured as low as
# ~0.1 MB/s under load — uploading even 35 MB could eat the child's whole
# timeout (and production TPU hosts feed chips over PCIe/DMA anyway)
Z, Y, X = (192, 480, 384) if backend == "tpu" else (96, 192, 128)
n_vox = Z * Y * X
bright = (
    jax.random.uniform(jax.random.PRNGKey(0), (Z, Y // 2, X)) * 900 + 100
).astype(jnp.uint16)
vol_dev = jnp.concatenate(
    [bright, jnp.zeros((Z, Y - Y // 2, X), jnp.uint16)], axis=1
)

cfg = SlidingWindowConfig(
    roi=(96, 96, 64), overlap=0.5,
    batch_size=0 if backend == "tpu" else 2,  # 0 = HBM-aware auto sizing
    tta=(mode == "tta"),  # reference default: 13 passes (inference.py:269-279)
)
if mode in ("fast", "tta"):
    # the Pallas conv path is TPU-compiled; off-TPU it would run in the
    # (slow) interpreter, so the CPU fallback measures the XLA lowering
    model_cfg = (
        BasicUNetConfig.fast()
        if backend == "tpu"
        else BasicUNetConfig.fast(conv_impl="xla3d")
    )
else:
    model_cfg = BasicUNetConfig()
params = init_params(jax.random.PRNGKey(0), model_cfg)

_ = float(np.asarray(vol_dev[0, 0, 0]))  # force device materialization

def run_once():
    out, _ = infer_volume(params, vol_dev, cfg, model_cfg, return_binary=False)
    # force full completion: axon's block_until_ready is async-acknowledged
    return float(np.asarray(out[0, 0, 0]))

run_once()  # warmup/compile
n_rep = 1 if mode == "tta" else (3 if backend == "tpu" else 1)
t0 = time.perf_counter()
for _ in range(n_rep):
    run_once()
dt = (time.perf_counter() - t0) / n_rep
gvox = n_vox / dt / 1e9
print(json.dumps({"gvox_per_s": gvox, "backend": backend, "seconds": dt,
                  "mode": mode}))
"""

# tiny-op liveness probe: compiles one small matmul and forces a readback.
# If this can't finish in ~2 min the TPU grant is wedged and a full bench
# retry would only burn the wall budget.
_PROBE_CODE = r"""
import json, sys
import numpy as np
import jax, jax.numpy as jnp
backend = jax.default_backend()
x = jnp.ones((256, 256), jnp.bfloat16)
y = jax.jit(lambda a: a @ a)(x)
_ = float(np.asarray(y[0, 0]))
print(json.dumps({"backend": backend, "ok": True}))
"""


# fast-vs-parity at the ACCEPTANCE metric on the real chip (VERDICT r3
# item 2): train the production-size UNet to decisive logits on a synthetic
# brain, run the stage-2 binarization chain in parity and in fast/pallas_cs,
# and compare cell counts + centroids (stage-3 semantics). Also reports the
# principled flip bound: a voxel may flip only if its parity logit sits
# within the measured fast-vs-parity logit deviation of the sigmoid cut
# (reference chain: inference/inference.py:120, create_nifti_seg :60-95).
_CELLS_CODE = r"""
import json, sys, time
import numpy as np

platform = sys.argv[1]
# platform selection happens in the PARENT's env (see _run_child)
import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig
from delivr_cfos_tpu.ops.connected_components import (
    component_statistics,
    label_volume_host,
)
from delivr_cfos_tpu.training import TrainConfig, make_train_step

backend = jax.default_backend()
SHAPE = (96, 256, 256) if backend == "tpu" else (32, 96, 96)
rng = np.random.default_rng(0)
# the volume lives ON DEVICE from birth (the tunnel measured as low as
# ~0.1 MB/s under load — no bulk uploads anywhere in this child):
# strictly positive background (the 30-iter erosion re-mask is then a
# no-op, border_value=1, as on a fully-imaged volume) + bright blobs
# placed by dynamic_update_slice at host-chosen centers
vol_dev = (
    jax.random.uniform(jax.random.PRNGKey(0), SHAPE) * 300 + 10
).astype(jnp.uint16)
centers = []
n_blobs = 60 if backend == "tpu" else 12
blob = jnp.full((2, 6, 6), 50000, jnp.uint16)
for _ in range(n_blobs):
    c = rng.integers((2, 5, 5), np.array(SHAPE) - (2, 5, 5))
    centers.append(c)
    vol_dev = jax.lax.dynamic_update_slice(
        vol_dev, blob, (int(c[0]) - 1, int(c[1]) - 3, int(c[2]) - 3)
    )

model = BasicUNetConfig() if backend == "tpu" else BasicUNetConfig(
    features=(4, 4, 8, 16, 32, 4)
)

# the on-chip training is the expensive part of this child (150 steps of
# the production-size UNet); cache the trained params per fixture config
# so repeat bench invocations skip it entirely
import pickle, pathlib
# v2: device-generated fixture (jax-RNG volume, device-sliced patches)
cache_key = f"cells-{backend}-{SHAPE}-{n_blobs}-{model.features}-150steps-v2"
# this child runs via `python -c` (no __file__); _run_child pins cwd to
# the repo root, so the cache lives beside bench.py either way
cache_dir = pathlib.Path.cwd() / ".bench_cache"
cache_file = cache_dir / (cache_key.replace(" ", "") + ".pkl")
params = None
if cache_file.exists():
    try:
        with open(cache_file, "rb") as f:
            host_params = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, host_params)
    except Exception:
        params = None
if params is None:
    tc = TrainConfig(model=model, learning_rate=1e-2)
    init_state, step = make_train_step(tc)
    params, opt_state = init_state()
    win_rng = np.random.default_rng(11)

    @jax.jit
    def gather_batch(vol_d, starts):
        # patches are sliced ON DEVICE from the resident volume — the old
        # host-slice + upload path moved ~78 MB over the tunnel per
        # training run
        def one(s):
            p = jax.lax.dynamic_slice(vol_d, (s[0], s[1], s[2]), (32, 32, 32))
            return p.astype(jnp.float32), (p > 40000).astype(jnp.float32)
        xs, ys = jax.vmap(one)(starts)
        return xs[..., None], ys[..., None]

    for i in range(150):
        starts = []
        for k in range(4):
            if k % 2 == 0:
                c = centers[win_rng.integers(len(centers))]
                z0 = int(np.clip(c[0]-16, 0, SHAPE[0]-32))
                y0 = int(np.clip(c[1]-16, 0, SHAPE[1]-32))
                x0 = int(np.clip(c[2]-16, 0, SHAPE[2]-32))
            else:
                z0, y0, x0 = (
                    int(v) for v in
                    win_rng.integers((0,0,0), np.array(SHAPE)-32, endpoint=True)
                )
            starts.append((z0, y0, x0))
        xb, yb = gather_batch(vol_dev, jnp.asarray(starts, jnp.int32))
        params, opt_state, _ = step(params, opt_state, xb, yb)
    cache_dir.mkdir(exist_ok=True)
    host_params = jax.tree_util.tree_map(np.asarray, params)
    tmp = cache_file.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(host_params, f)
    tmp.replace(cache_file)

roi = (96, 96, 64) if backend == "tpu" else (16, 16, 16)
cfg = SlidingWindowConfig(roi=roi, overlap=0.5, tta=False,
                          batch_size=0 if backend == "tpu" else 2)
_ = float(np.asarray(vol_dev[0, 0, 0]))  # force device materialization

parity_cfg = BasicUNetConfig(
    features=model.features, precision="highest", conv_impl="xla3d"
)
fast_cfg = (
    BasicUNetConfig.fast(features=model.features)
    if backend == "tpu"
    else BasicUNetConfig.fast(features=model.features, conv_impl="xla3d")
)
# logits stay ON DEVICE (f32 full volumes would be ~50 MB of downloads
# through the slow tunnel) — the deviation analysis reduces to scalars
# there; only the uint8 binaries come back, for host labeling
log_p_d, bin_p_d = infer_volume(params, vol_dev, cfg, parity_cfg)
log_f_d, bin_f_d = infer_volume(params, vol_dev, cfg, fast_cfg)
flip_d = bin_p_d != bin_f_d
max_dev = float(np.asarray(jnp.abs(log_f_d - log_p_d).max()))
# principled bound: every flipped voxel's parity logit must be within the
# measured deviation of the cut (sigmoid(x) >= 0.5 <=> x >= 0)
within = bool(
    np.asarray(
        jnp.where(flip_d, jnp.abs(log_p_d), 0.0).max() <= max_dev + 1e-6
    )
)
n_flipped = int(np.asarray(flip_d.sum()))
bin_p = np.asarray(bin_p_d); bin_f = np.asarray(bin_f_d)

lab_p, n_p = label_volume_host(bin_p)
lab_f, n_f = label_volume_host(bin_f)
stats_p = component_statistics(lab_p, n_p)
stats_f = component_statistics(lab_f, n_f)
cp = np.asarray(stats_p["centroids"]); cf = np.asarray(stats_f["centroids"])
cent_ok = False
if n_p == n_f and n_p > 0:
    op = np.lexsort(cp.T); of = np.lexsort(cf.T)
    cent_ok = bool(np.allclose(cp[op], cf[of], atol=1.0))
print(json.dumps({
    "backend": backend,
    "n_parity": int(n_p), "n_fast": int(n_f),
    "cells_equal": bool(n_p == n_f and n_p == n_blobs),
    "centroids_agree": cent_ok,
    "flipped_voxels": n_flipped,
    "max_abs_logit_dev": max_dev,
    "flips_within_logit_margin": within,
}))
"""


def _run_child(platform: str, mode: str, timeout: float):
    if timeout <= 5:
        return None
    if mode == "cells":
        code = _CELLS_CODE
    elif mode == "probe":
        code = _PROBE_CODE
    else:
        code = _CHILD_CODE
    # force the platform from the PARENT env: this image's sitecustomize
    # registers the TPU plugin at interpreter startup, i.e. before any
    # env-var surgery inside the child script could run
    env = dict(os.environ)
    if platform != "default":
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = platform
    # persistent compilation cache: repeat invocations (and the driver's
    # capture run after an in-session warmup) skip most compile time
    here = os.path.dirname(os.path.abspath(__file__))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(here, ".jax_cache"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code, platform, mode],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
            cwd=here,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    except subprocess.TimeoutExpired:
        return None
    return None


def main():
    # documented estimate of the reference's per-GPU effective single-pass
    # throughput (see module docstring)
    reference_estimate_gvox_s = 0.012

    t0 = time.monotonic()
    budget = float(os.environ.get("DELIVR_BENCH_BUDGET_S", "1080"))

    def left() -> float:
        return budget - (time.monotonic() - t0)

    # --- headline: the fast child, probe-gated retry, CPU fallback --------
    fast = _run_child("default", "fast", timeout=min(480.0, left()))
    if fast is None and left() > 240:
        # short liveness probe instead of a blind full retry: if a tiny
        # matmul can't land in 2 min, the grant is wedged — go to CPU
        probe = _run_child("default", "probe", timeout=min(180.0, left()))
        if probe is not None and left() > 240:
            fast = _run_child("default", "fast", timeout=min(420.0, left() - 90))
    if fast is None:
        fast = _run_child("cpu", "fast", timeout=max(left() - 20, 60.0))
    if fast is None:
        print(
            json.dumps(
                {
                    "metric": "unet_sliding_window_throughput (bench failed)",
                    "value": 0.0,
                    "unit": "GVoxel/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        return

    metric = "unet_sliding_window_throughput_per_chip"
    if fast["backend"] != "tpu":
        metric += f" ({fast['backend']} fallback)"
    result = {
        "metric": metric,
        "value": round(fast["gvox_per_s"], 4),
        "unit": "GVoxel/s",
        "vs_baseline": round(fast["gvox_per_s"] / reference_estimate_gvox_s, 2),
    }
    # the headline lands NOW — a driver-side timeout after this point still
    # captures the metric (round 4 lost its number to a withheld print)
    print(json.dumps(result), flush=True)

    # --- enrichments, each gated on the remaining wall budget -------------
    # the cumulative result line re-prints after EVERY enrichment child:
    # the driver keeps the last parseable JSON line, so a driver-side kill
    # between children still records everything that landed so far
    if fast["backend"] == "tpu":
        # fast-vs-parity cell-count equality ON THE CHIP (VERDICT r3 item 2);
        # cheap when the .bench_cache params hit, ~training-dominated when cold
        cells = (
            _run_child("default", "cells", timeout=min(420.0, left() - 60))
            if left() > 240
            else None
        )
        if cells is not None:
            result["fast_parity_cells_equal"] = bool(
                cells["cells_equal"] and cells["centroids_agree"]
            )
            result["fast_parity_cells"] = {
                k: cells[k]
                for k in (
                    "n_parity",
                    "n_fast",
                    "flipped_voxels",
                    "max_abs_logit_dev",
                    "flips_within_logit_margin",
                )
            }
            print(json.dumps(result), flush=True)
        parity = (
            _run_child("default", "parity", timeout=min(300.0, left() - 40))
            if left() > 180
            else None
        )
        if parity is not None:
            result["parity_mode_value"] = round(parity["gvox_per_s"], 4)
            print(json.dumps(result), flush=True)
        # reference-default semantics: TTA on = 13 full-volume passes
        # (inference.py:269-279); tta_value is unique-output GVox/s for the
        # complete 13-pass run (VERDICT r2 item 4: measured, not projected)
        tta = (
            _run_child("default", "tta", timeout=min(300.0, left() - 30))
            if left() > 150
            else None
        )
        if tta is not None:
            result["tta_value"] = round(tta["gvox_per_s"], 4)
            print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
