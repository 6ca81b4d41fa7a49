"""TPU probe: overlap-add accumulation formulations for the sliding-window
engine. The engine's `_accumulate_windows` is a serial fori_loop of
dynamic_update_slice pairs (acc + cnt) — one dependency chain of ~300
window updates per bench volume (~10% of engine wall). Candidates:

  A  current: fori_loop, per-window dynamic_update_slice on acc and cnt
  B  scatter-add on acc only (cnt would become analytic: the count map is
     data-independent — coverage × passes — so it needs no accumulation)

Run: python scripts/probe_accumulate.py   (TPU host)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.engine.sliding_window import (
    _accumulate_windows,
    dense_patch_starts,
)

SHAPE = (192, 480, 384)
ROI = (96, 96, 64)

_SCATTER_DIMS = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2, 3),
    inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0, 1, 2),
)


def variant_a(acc, cnt, starts, contrib, valid):
    return _accumulate_windows(acc, cnt, starts, contrib, valid, ROI)


def variant_b(acc, cnt, starts, contrib, valid):
    w = valid.astype(jnp.float32)[:, None, None, None]
    acc = jax.lax.scatter_add(
        acc, starts, contrib * w, _SCATTER_DIMS,
        indices_are_sorted=True, unique_indices=False,
    )
    return acc, cnt


def time_variant(name, fn, n=6):
    starts_np = dense_patch_starts(SHAPE, ROI, 0.5)
    starts = jnp.asarray(starts_np)
    rng = jax.random.PRNGKey(0)
    contrib = jax.random.normal(rng, (starts_np.shape[0], *ROI), jnp.float32)
    valid = jnp.ones((starts_np.shape[0],), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run(reps):
        def body(carry, _):
            acc, cnt = carry
            acc, cnt = fn(acc, cnt, starts, contrib, valid)
            return (acc * 0.5, cnt), acc[0, 0, 0]

        init = (
            jnp.zeros(SHAPE, jnp.float32),
            jnp.zeros(SHAPE, jnp.int32),
        )
        (acc, cnt), ys = jax.lax.scan(body, init, None, length=reps)
        return acc[0, 0, 0] + cnt[0, 0, 0] + ys.sum()

    try:
        _ = float(np.asarray(run(1)))
        _ = float(np.asarray(run(1 + n)))
        t0 = time.perf_counter()
        _ = float(np.asarray(run(1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(run(1 + n)))
        tn = time.perf_counter() - t0
        ms = (tn - t1) / n * 1000
        print(f"{name}: {ms:.1f} ms per full-volume accumulate "
              f"({starts_np.shape[0]} windows)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)


def check_equal():
    shape = (96, 192, 128)
    starts_np = dense_patch_starts(shape, ROI, 0.5)
    starts = jnp.asarray(starts_np)
    contrib = jax.random.normal(
        jax.random.PRNGKey(1), (starts_np.shape[0], *ROI), jnp.float32
    )
    valid = jnp.ones((starts_np.shape[0],), jnp.int32).at[-1].set(0)
    acc0 = jnp.zeros(shape, jnp.float32)
    cnt0 = jnp.zeros(shape, jnp.int32)

    def a():
        return _accumulate_windows(acc0, cnt0, starts, contrib, valid, ROI)

    a_acc, _ = jax.jit(a)()
    b_acc, _ = jax.jit(
        lambda: variant_b(acc0, cnt0, starts, contrib, valid)
    )()
    print("acc maxdiff A vs B:", float(jnp.abs(a_acc - b_acc).max()),
          flush=True)


if __name__ == "__main__":
    check_equal()
    time_variant("A fori (acc+cnt)", variant_a)
    time_variant("B scatter (acc only)", variant_b)
