"""TPU probe: 2x2x2 max-pool formulations in the CS layout (B, D, C, H·W).

r5 trace of the fast forward pass shows the level-0 pool chain costing
~4.4 ms/step (slice_maximum_fusion.23 1.34 + copy.171 1.28 (a {1,2,5,3,0,4}
relayout!) + reshape.548 1.12 + slice_maximum_fusion.22 0.66) against a
~0.6 ms HBM-bandwidth bound (read 302 MB + write 75 MB at ~800 GB/s).
This probe times candidate formulations at the level-0 shape with the
rig-safe methodology (dependent lax.scan chain, host readback sync).

Run: python scripts/probe_pool.py   (on the TPU host)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

B, D, C, H, W = 8, 96, 32, 96, 64
S = H * W
DT = jnp.bfloat16


def pool_dfirst(x):
    # current default (models/basic_unet_cs.py::_maxpool2_cs)
    b, d, c, s = x.shape
    y = x.reshape(b, d // 2, 2, c, s)
    y = jnp.maximum(y[:, :, 0], y[:, :, 1])
    y = y.reshape(b, d // 2, c, H // 2, 2, W)
    y = jnp.maximum(y[:, :, :, :, 0], y[:, :, :, :, 1])
    y = y.reshape(b, d // 2, c, (H // 2) * (W // 2), 2)
    return jnp.maximum(y[..., 0], y[..., 1])


def pool_wfirst(x):
    b, d, c, s = x.shape
    y = x.reshape(b, d, c, H, W // 2, 2)
    y = jnp.maximum(y[..., 0], y[..., 1])
    y = y.reshape(b, d, c, H // 2, 2, W // 2)
    y = jnp.maximum(y[:, :, :, :, 0], y[:, :, :, :, 1])
    y = y.reshape(b, d // 2, 2, c, (H // 2) * (W // 2))
    return jnp.maximum(y[:, :, 0], y[:, :, 1])


def pool_joint(x):
    # one reshape exposing all three pair axes, one fused 3-axis max
    b, d, c, s = x.shape
    y = x.reshape(b, d // 2, 2, c, H // 2, 2, W // 2, 2)
    y = jnp.max(y, axis=(2, 5, 7))
    return y.reshape(b, d // 2, c, (H // 2) * (W // 2))


def pool_8slice(x):
    # maximum of the 8 strided phase slices of one reshaped view — no
    # intermediate tensors, one kLoop fusion if XLA cooperates
    b, d, c, s = x.shape
    v = x.reshape(b, d // 2, 2, c, H // 2, 2, W // 2, 2)
    m = None
    for a in range(2):
        for bb in range(2):
            for cc in range(2):
                p = v[:, :, a, :, :, bb, :, cc]
                m = p if m is None else jnp.maximum(m, p)
    return m.reshape(b, d // 2, c, (H // 2) * (W // 2))


def pool_d_then_joint_hw(x):
    # free d-pool (major split), then one fused 2-axis max over (h, w) pairs
    b, d, c, s = x.shape
    y = x.reshape(b, d // 2, 2, c, s)
    y = jnp.maximum(y[:, :, 0], y[:, :, 1])
    y = y.reshape(b, d // 2, c, H // 2, 2, W // 2, 2)
    y = jnp.max(y, axis=(4, 6))
    return y.reshape(b, d // 2, c, (H // 2) * (W // 2))


def pool_d_then_4slice(x):
    b, d, c, s = x.shape
    y = x.reshape(b, d // 2, 2, c, s)
    y = jnp.maximum(y[:, :, 0], y[:, :, 1])
    v = y.reshape(b, d // 2, c, H // 2, 2, W // 2, 2)
    m = jnp.maximum(
        jnp.maximum(v[:, :, :, :, 0, :, 0], v[:, :, :, :, 0, :, 1]),
        jnp.maximum(v[:, :, :, :, 1, :, 0], v[:, :, :, :, 1, :, 1]),
    )
    return m.reshape(b, d // 2, c, (H // 2) * (W // 2))


def pool_reduce_window(x):
    b, d, c, s = x.shape
    y = x.reshape(b, d, c, H, W)
    y = jax.lax.reduce_window(
        y, -jnp.inf if y.dtype != jnp.bfloat16 else jnp.finfo(jnp.bfloat16).min,
        jax.lax.max, (1, 2, 1, 2, 2), (1, 2, 1, 2, 2), "VALID",
    )
    return y.reshape(b, d // 2, c, (H // 2) * (W // 2))


def time_variant(name, fn, x, n_chain=30):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(carry, _):
            y = fn(carry)
            # dependent chain: tile the pooled output back up (cheap reads)
            nxt = carry + jnp.tile(y, (1, 2, 1, 4)).astype(carry.dtype) * 0
            return nxt, y[0, 0, 0, 0]

        out, ys = jax.lax.scan(body, x, None, length=n)
        return out[0, 0, 0, 0] + ys.sum()

    try:
        _ = float(np.asarray(chain(x, 2)))
        _ = float(np.asarray(chain(x, 2 + n_chain)))
        t0 = time.perf_counter()
        _ = float(np.asarray(chain(x, 2)))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(chain(x, 2 + n_chain)))
        tn = time.perf_counter() - t0
        ms = (tn - t2) / n_chain * 1000
        print(f"{name}: {ms:.2f} ms/call  (chain {n_chain})", flush=True)
        return ms
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


VARIANTS = [
    ("dfirst (current)", pool_dfirst),
    ("wfirst", pool_wfirst),
    ("joint", pool_joint),
    ("8slice", pool_8slice),
    ("d_then_joint_hw", pool_d_then_joint_hw),
    ("d_then_4slice", pool_d_then_4slice),
    ("reduce_window", pool_reduce_window),
]


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, C, S), DT)

    # compare ON DEVICE: bulk downloads through this rig's tunnel can run
    # at ~0.1 MB/s under load — only the scalar max comes back
    ref = jax.jit(pool_dfirst)(x)
    for name, fn in VARIANTS[1:]:
        err = float(
            np.asarray(
                jax.jit(lambda x: jnp.abs(fn(x).astype(jnp.float32)
                                          - ref.astype(jnp.float32)).max())(x)
            )
        )
        print(f"{name}: max|err| = {err}", flush=True)

    for name, fn in VARIANTS:
        time_variant(name, fn, x)


if __name__ == "__main__":
    main()
