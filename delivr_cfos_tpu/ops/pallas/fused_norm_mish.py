"""Pallas TPU kernel: fused instance-norm + mish epilogue.

Every conv block in the UNet ends with instance-norm → mish
(models/basic_unet.py, matching the reference's MONAI Convolution with
adn_ordering='NDA', inference/inference.py:190-197). XLA emits this as a
reduce + elementwise pair over HBM; this kernel does it in two VMEM-resident
phases so each activation tile is read exactly twice and written once:

phase 1 — per-tile partial Σx and Σx² per (sample, channel), accumulated in a
          VMEM scratch across the spatial grid;
phase 2 — normalize + affine + mish per tile using the finalized statistics.

Both phases run inside one ``pallas_call`` by iterating a (2, spatial) grid:
the first sweep only accumulates, the second applies. Layout: activations are
(N, S, C) with S = flattened D·H·W (spatial-last-but-one keeps C on the
128-lane axis, the natural TPU layout for channels-last convs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IN_EPS = 1e-5


def _kernel(x_ref, scale_ref, bias_ref, out_ref, stats_ref, *, n_spatial_tiles, total_s):
    phase = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _():
        x = x_ref[...].astype(jnp.float32)  # (1, S_tile, C)
        stats_ref[0, :] += jnp.sum(x[0], axis=0)
        stats_ref[1, :] += jnp.sum(x[0] * x[0], axis=0)

    @pl.when(phase == 1)
    def _():
        x = x_ref[...].astype(jnp.float32)
        inv_n = 1.0 / total_s
        mean = stats_ref[0, :] * inv_n
        var = stats_ref[1, :] * inv_n - mean * mean
        inv = jax.lax.rsqrt(var + _IN_EPS)
        y = (x - mean[None, None, :]) * inv[None, None, :]
        y = y * scale_ref[...][None, None, :] + bias_ref[...][None, None, :]
        out_ref[...] = (y * jnp.tanh(jax.nn.softplus(y))).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def instance_norm_mish_pallas(x, scale, bias, interpret: bool = False):
    """x: (N, D, H, W, C) → instance-norm(affine) + mish, same shape/dtype.

    Numerically equivalent (modulo f32 sum order) to
    ``basic_unet._mish(basic_unet._instance_norm(x, scale, bias))``.
    """
    n, d, h, w, c = x.shape
    s = d * h * w
    xs = x.reshape(n, s, c)

    # spatial tile: multiple of 8 sublanes, capped for VMEM
    s_tile = min(s, 2048)
    while s % s_tile:
        s_tile //= 2
    s_tile = max(s_tile, 1)
    n_spatial_tiles = s // s_tile

    def run_one(sample):  # (S, C)
        sample = sample[None]  # (1, S, C)
        out = pl.pallas_call(
            partial(
                _kernel,
                n_spatial_tiles=n_spatial_tiles,
                total_s=float(s),
            ),
            grid=(2, n_spatial_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, s_tile, c),
                    lambda p, t: (0, t, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
                pl.BlockSpec((c,), lambda p, t: (0,), memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((c,), lambda p, t: (0,), memory_space=pl.ANY if interpret else pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, s_tile, c),
                lambda p, t: (0, t, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((1, s, c), x.dtype),
            scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
            interpret=interpret,
        )(sample, scale.astype(jnp.float32), bias.astype(jnp.float32))
        return out[0]

    return jax.vmap(run_one)(xs).reshape(n, d, h, w, c)
