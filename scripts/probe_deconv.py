"""TPU probe: deconv 2x2x2 interleave formulations in the CS layout.

VERDICT r2 item 2: the trace shows ~12 ms/step of layout copies around the
deconv block interleave (reshape.30 + copy.17). This probe times isolated
formulations of deconv+interleave at the upcat_1 shape (the hot one) with
the rig-safe methodology (host readback sync, lax.scan chain amortization,
on-device data; see PERF.md "Measurement methodology").

Variants:
  A  current: dot -> reshape -> transpose(0,1,4,7,2,5,3,6) -> reshape
  B  weight cols (dz,o,dy,dx): transpose(0,1,4,5,2,6,3,7) keeps dx minor
  C  stack assembly: dot to (8O) rows-before-S, slice phases, x-interleave
     via stack(-1)+reshape, y/z interleaves via free row-major merges
  D  pallas kernel: per-(b,d) program does the dot + repeat/select
     x-interleave + strided parity stores; all other merges free reshapes
  E  lax.conv_transpose with CS-ish dimension numbers

Run: python scripts/probe_deconv.py  (on the TPU host; ~minutes)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# upcat_1 deconv: input (B, D/2, f1=32, (h/2)*(w/2)), h=96, w=64
B, D, C, H, W = 8, 48, 32, 48, 32
O = 32
S = H * W
DT = jnp.bfloat16


def variant_a(x, w, b):
    wm = jnp.transpose(w, (0, 2, 3, 4, 1)).reshape(C, 8 * O).astype(x.dtype)
    y = jax.lax.dot_general(
        x, wm, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.reshape(B, D, H, W, 2, 2, 2, O)
    y = jnp.transpose(y, (0, 1, 4, 7, 2, 5, 3, 6))
    return y.reshape(B, 2 * D, O, 4 * S) + b.astype(x.dtype)[None, None, :, None]


def variant_b(x, w, b):
    # weight columns ordered (dz, o, dy, dx)
    wm = jnp.transpose(w, (0, 2, 1, 3, 4)).reshape(C, 8 * O).astype(x.dtype)
    y = jax.lax.dot_general(
        x, wm, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.reshape(B, D, H, W, 2, O, 2, 2)
    y = jnp.transpose(y, (0, 1, 4, 5, 2, 6, 3, 7))
    return y.reshape(B, 2 * D, O, 4 * S) + b.astype(x.dtype)[None, None, :, None]


def variant_c(x, w, b):
    # rows-before-S dot: (8O, C) @ (B, D, C, S) -> (8O, B, D, S) -> transpose
    wm = jnp.transpose(w, (2, 3, 4, 1, 0)).reshape(8 * O, C).astype(x.dtype)
    y = jax.lax.dot_general(
        wm, x, dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (8O, B, D, S)
    y = jnp.transpose(y, (1, 2, 0, 3))  # (B, D, 8O, S) — minor dim preserved
    y = y.reshape(B, D, 2, 2, 2, O, S)  # (dz, dy, dx, O)
    ph = y.reshape(B, D, 2, 2, 2, O, H, W)
    rows = []
    for dz in range(2):
        for dy in range(2):
            a0 = ph[:, :, dz, dy, 0]
            a1 = ph[:, :, dz, dy, 1]
            # x-interleave: stack minor-most + merge
            r = jnp.stack([a0, a1], axis=-1).reshape(B, D, O, H, 2 * W)
            rows.append(r)
    r0 = jnp.stack([rows[0], rows[1]], axis=-2)  # (B,D,O,H,2,2W) free merge next
    r1 = jnp.stack([rows[2], rows[3]], axis=-2)
    z = jnp.stack([r0, r1], axis=2)  # (B,D,2,O,H,2,2W)
    out = z.reshape(B, 2 * D, O, 4 * S)
    return out + b.astype(x.dtype)[None, None, :, None]


def _pallas_kernel(x_ref, w_ref, b_ref, out_ref, *, cin, cout, h, wdt,
                   y_mode):
    # x block: (1, 1, cin, S); w: (cin, 8O) cols (dz, dy, dx, o)
    y = jax.lax.dot_general(
        w_ref[...], x_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8O, S) rows (dz, dy, dx, o)
    s = h * wdt
    bias = b_ref[...][:, None]
    for dz in range(2):
        rows = []
        for dy in range(2):
            p0 = y[(dz * 4 + dy * 2 + 0) * cout : (dz * 4 + dy * 2 + 1) * cout]
            p1 = y[(dz * 4 + dy * 2 + 1) * cout : (dz * 4 + dy * 2 + 2) * cout]
            # x-interleave: (cout, s, 2) minor-most stack then merge
            row = jnp.stack([p0, p1], axis=-1).reshape(cout, 2 * s) + bias
            rows.append(row.astype(out_ref.dtype))
        if y_mode == "stack":
            # in-kernel y-interleave: (cout, h, 2, 2w), contiguous store
            a = rows[0].reshape(cout, h, 2 * wdt)
            bv = rows[1].reshape(cout, h, 2 * wdt)
            out_ref[0, 0, dz] = jnp.stack([a, bv], axis=2)
        else:  # 'split': dy-major blocks; XLA transposes afterwards
            out_ref[0, 0, dz, 0] = rows[0]
            out_ref[0, 0, dz, 1] = rows[1]


def _variant_d(x, w, b, y_mode):
    wm = jnp.transpose(w, (0, 2, 3, 4, 1)).reshape(C, 8 * O).astype(DT)
    kern = functools.partial(
        _pallas_kernel, cin=C, cout=O, h=H, wdt=W, y_mode=y_mode
    )
    if y_mode == "stack":
        out_shape = jax.ShapeDtypeStruct((B, D, 2, O, H, 2, 2 * W), DT)
        out_spec = pl.BlockSpec(
            (1, 1, 2, O, H, 2, 2 * W), lambda bb, d: (bb, d, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((B, D, 2, 2, O, 2 * S), DT)
        out_spec = pl.BlockSpec(
            (1, 1, 2, 2, O, 2 * S), lambda bb, d: (bb, d, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        kern,
        grid=(B, D),
        in_specs=[
            pl.BlockSpec((1, 1, C, S), lambda bb, d: (bb, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 8 * O), lambda bb, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda bb, d: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(x.astype(DT), wm, jnp.asarray(b, jnp.float32))
    if y_mode == "stack":
        return out.reshape(B, 2 * D, O, 4 * S)
    # (B, D, dz, dy, O, h·2w) → (B, D, dz, O, h, dy, 2w) → merge
    out = out.reshape(B, D, 2, 2, O, H, 2 * W)
    out = jnp.transpose(out, (0, 1, 2, 4, 5, 3, 6))
    return out.reshape(B, 2 * D, O, 4 * S)


def variant_d(x, w, b):
    return _variant_d(x, w, b, "stack")


def variant_f(x, w, b):
    return _variant_d(x, w, b, "split")


def variant_e(x, w, b):
    # lax.conv_transpose on (B, D, C, H, W) with C as the feature dim
    xg = x.reshape(B, D, C, H, W)
    wt = jnp.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].astype(x.dtype)
    y = jax.lax.conv_transpose(
        xg, wt, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
    )
    return (
        y.reshape(B, 2 * D, O, 4 * S) + b.astype(x.dtype)[None, None, :, None]
    )


def variant_g(x, w, b):
    # z-phase split: out[2i+a] = 2D stride-2 transposed conv of plane i with
    # w[:, :, a] — two kz=1 conv_transposes (z stride 1), then the
    # z-interleave is a FREE reshape ((D, 2) are adjacent in this layout)
    xg = x.reshape(B, D, C, H, W)
    outs = []
    for a in range(2):
        # (1, 2, 2, C, O), y/x flipped like variant E's kernel prep
        wt = jnp.transpose(w[:, :, a], (2, 3, 0, 1))[::-1, ::-1][None]
        y = jax.lax.conv_transpose(
            xg, wt.astype(x.dtype), strides=(1, 2, 2), padding="VALID",
            dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
        )  # (B, D, O, 2H, 2W)
        outs.append(y)
    y = jnp.stack(outs, axis=2)  # (B, D, 2, O, 2H, 2W)
    return (
        y.reshape(B, 2 * D, O, 4 * S) + b.astype(x.dtype)[None, None, :, None]
    )


def variant_h(x, w, b):
    # conv_transpose in C-minor NDHWC (XLA's native conv layout) with
    # explicit transposes at the boundary — tests whether the emitter's
    # canonical-layout copies are cheaper when it never fights the layout
    xg = jnp.transpose(x.reshape(B, D, C, H, W), (0, 1, 3, 4, 2))
    wt = jnp.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].astype(x.dtype)
    y = jax.lax.conv_transpose(
        xg, wt, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (B, 2D, 2H, 2W, O)
    y = jnp.transpose(y, (0, 1, 4, 2, 3)).reshape(B, 2 * D, O, 4 * S)
    return y + b.astype(x.dtype)[None, None, :, None]


def time_variant(name, fn, x, w, b, n_chain=20):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(carry, _):
            y = fn(carry, w, b)
            # feed a reduced slice back so the chain is dependent but cheap
            nxt = carry + y[:, :D, :C, :S].astype(carry.dtype) * 1e-6
            return nxt, y[0, 0, 0, 0]
        out, ys = jax.lax.scan(body, x, None, length=n)
        return out[0, 0, 0, 0] + ys.sum()

    try:
        # compile BOTH scan lengths before any timing (a cold chain(n)
        # call includes its own compilation)
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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, C, S), DT)
    w = jax.random.normal(key, (C, O, 2, 2, 2), jnp.float32) * 0.1
    b = jax.random.normal(key, (O,), jnp.float32)

    # correctness vs variant A first (on small slices, via jit once)
    ref = np.asarray(jax.jit(variant_a)(x, w, b), np.float32)
    for name, fn in [("B", variant_b), ("C", variant_c), ("D", variant_d),
                     ("E", variant_e), ("F", variant_f), ("G", variant_g),
                     ("H", variant_h)]:
        try:
            got = np.asarray(jax.jit(fn)(x, w, b), np.float32)
            err = np.abs(got - ref).max()
            print(f"variant {name}: max|err| = {err:.5f}", flush=True)
        except Exception as e:
            print(f"variant {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    for name, fn in [("A", variant_a), ("E", variant_e), ("G", variant_g),
                     ("H", variant_h)]:
        time_variant(name, fn, x, w, b)


if __name__ == "__main__":
    main()
