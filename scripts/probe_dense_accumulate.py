import sys, os; sys.path.insert(0, "/root/repo")
import time, numpy as np, dataclasses
import jax, jax.numpy as jnp
from delivr_cfos_tpu.engine.sliding_window import SlidingWindowConfig, infer_volume
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, init_params

Z, Y, X = (192, 480, 384)
rng = np.random.default_rng(0)
vol = np.zeros((Z, Y, X), np.uint16)
vol[:, : Y // 2] = (rng.random((Z, Y // 2, X)) * 900 + 100).astype(np.uint16)
model_cfg = BasicUNetConfig.fast()
params = init_params(jax.random.PRNGKey(0), model_cfg)
vol_dev = jnp.asarray(vol); _ = float(np.asarray(vol_dev[0,0,0]))

cfgs = {
  "dense": SlidingWindowConfig(roi=(96,96,64), overlap=0.5),
  "loop": SlidingWindowConfig(roi=(96,96,64), overlap=0.5, dense_overlap_add=False),
}
def run(cfg):
    out, _ = infer_volume(params, vol_dev, cfg, model_cfg, return_binary=False)
    return float(np.asarray(out[0,0,0]))
for name, c in cfgs.items():
    run(c)  # warm compile
times = {k: [] for k in cfgs}
for rep in range(3):
    for name, c in cfgs.items():
        t0 = time.perf_counter(); run(c); times[name].append(time.perf_counter()-t0)
for name, ts in times.items():
    best = min(ts)
    print(name, [round(t,3) for t in ts], "min", round(best,3), "gvox/s", round(Z*Y*X/best/1e9, 5))
