"""TPU probe: overlap-add accumulation formulations for the sliding-window
engine, at the engine's real shapes (the bench volume's window set, batched
(NB, B, ...) exactly like `_accumulate_logits_pass`).

  A  current: scan over batches, inner fori of dynamic_update_slice pairs
  B  scatter-add per batch inside the scan (acc), cnt via a second scatter

Timing: python-loop with host readback per call (each call is ≫ the ~30 ms
dispatch floor; both variants carry the same floor).

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
    _accumulate_logits_pass,
    _to_batched,
    dense_patch_starts,
)

SHAPE = (192, 480, 384)
ROI = (96, 96, 64)
BATCH = 16

_SCATTER_DIMS = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2, 3),
    inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0, 1, 2),
)


@functools.partial(jax.jit, donate_argnames=("acc", "cnt"))
def scatter_pass(acc, cnt, starts_nb, valid_nb, logits_nb):
    def body(carry, inp):
        acc, cnt = carry
        starts, valid, contrib = inp
        w = valid.astype(jnp.float32)[:, None, None, None]
        acc = jax.lax.scatter_add(
            acc, starts, contrib * w, _SCATTER_DIMS,
            indices_are_sorted=False, unique_indices=False,
        )
        ones = jnp.broadcast_to(
            valid.astype(jnp.int32)[:, None, None, None],
            contrib.shape,
        )
        cnt = jax.lax.scatter_add(
            cnt, starts, ones, _SCATTER_DIMS,
            indices_are_sorted=False, unique_indices=False,
        )
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(
        body, (acc, cnt), (starts_nb, valid_nb, logits_nb)
    )
    return acc, cnt


def main():
    starts_np = dense_patch_starts(SHAPE, ROI, 0.5)
    starts_nb, valid_nb = _to_batched(starts_np, BATCH)
    nb = starts_nb.shape[0]
    logits_nb = jax.random.normal(
        jax.random.PRNGKey(0), (nb, BATCH, *ROI), jnp.float32
    )
    print(f"{starts_np.shape[0]} windows, {nb} batches of {BATCH}")

    def timeit(name, fn, n=8):
        try:
            acc = jnp.zeros(SHAPE, jnp.float32)
            cnt = jnp.zeros(SHAPE, jnp.int32)
            acc, cnt = fn(acc, cnt, starts_nb, valid_nb, logits_nb)
            _ = float(np.asarray(acc[0, 0, 0]))  # compile+sync
            t0 = time.perf_counter()
            for _i in range(n):
                acc2, cnt2 = fn(acc, cnt, starts_nb, valid_nb, logits_nb)
                acc, cnt = acc2, cnt2
                _ = float(np.asarray(acc[0, 0, 0]))
            ms = (time.perf_counter() - t0) / n * 1000
            print(f"{name}: {ms:.1f} ms/full-volume pass (incl. ~30 ms "
                  f"dispatch floor)", flush=True)
            return acc, cnt
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None, None

    def pass_a(acc, cnt, s, v, l):
        return _accumulate_logits_pass(acc, cnt, s, v, l, roi=ROI)

    a_acc, a_cnt = timeit("A fori pass", pass_a)
    b_acc, b_cnt = timeit("B scatter pass", scatter_pass)
    if a_acc is not None and b_acc is not None:
        print("cnt equal:", bool(jnp.array_equal(a_cnt, b_cnt)))
        print("acc maxdiff:", float(jnp.abs(a_acc - b_acc).max()))


if __name__ == "__main__":
    main()
