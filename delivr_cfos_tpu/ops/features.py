"""Ilastik-style per-voxel feature bank as XLA ops (separable Gaussian convs).

Ilastik's pixel classification computes a bank of image filters per voxel and
feeds them to a random forest (reference: the external Ilastik binary invoked
at downsample/downsample_and_mask.py:75-83). We reproduce the standard bank —
Gaussian smoothing, Laplacian of Gaussian, Gaussian gradient magnitude, and
difference of Gaussians over a scale set — with separable 1D convolutions,
which XLA maps onto fused VPU passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SIGMAS = (0.7, 1.6, 3.5)


def _gauss_kernel(sigma: float, order: int = 0) -> np.ndarray:
    """1D Gaussian (order 0), first derivative (1), or second derivative (2),
    matching scipy.ndimage conventions (truncate=4)."""
    radius = max(int(4.0 * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    if order == 0:
        return g
    if order == 1:
        return g * (-x / sigma**2)
    if order == 2:
        return g * ((x**2 - sigma**2) / sigma**4)
    raise ValueError(order)


def _sep_conv(vol: jnp.ndarray, kernels) -> jnp.ndarray:
    """Separable 3D convolution with per-axis 1D kernels, reflect padding
    (scipy.ndimage default boundary)."""
    x = vol
    for axis, k in enumerate(kernels):
        if k is None:
            continue
        k = jnp.asarray(k, jnp.float32)
        r = (k.shape[0] - 1) // 2
        pads = [(0, 0)] * 3
        pads[axis] = (r, r)
        xp = jnp.pad(x, pads, mode="reflect")
        # conv along `axis` via conv_general_dilated on a reshaped view
        moved = jnp.moveaxis(xp, axis, -1)
        shp = moved.shape
        lhs = moved.reshape(1, -1, shp[-1], 1)  # N, H(batchish), W, C
        rhs = k[::-1].reshape(1, k.shape[0], 1, 1)  # HWIO (flip → correlation)
        out = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = out.reshape(shp[0], shp[1], shp[2] - 2 * r)
        x = jnp.moveaxis(out, -1, axis)
    return x


@partial(jax.jit, static_argnames=("sigmas",))
def feature_bank(vol: jnp.ndarray, sigmas: tuple = DEFAULT_SIGMAS) -> jnp.ndarray:
    """(Z, Y, X) volume → (Z, Y, X, F) float32 feature stack.

    F = 1 (raw) + per σ: smoothing, LoG, gradient magnitude; plus
    difference-of-Gaussians between consecutive σ.
    """
    x = vol.astype(jnp.float32)
    feats = [x]
    smoothed = []
    for s in sigmas:
        g = _gauss_kernel(s, 0)
        sm = _sep_conv(x, (g, g, g))
        smoothed.append(sm)
        feats.append(sm)
        # Laplacian of Gaussian: sum of per-axis second derivatives
        d2 = _gauss_kernel(s, 2)
        log_f = (
            _sep_conv(x, (d2, g, g))
            + _sep_conv(x, (g, d2, g))
            + _sep_conv(x, (g, g, d2))
        )
        feats.append(log_f)
        # gradient magnitude
        d1 = _gauss_kernel(s, 1)
        gz = _sep_conv(x, (d1, g, g))
        gy = _sep_conv(x, (g, d1, g))
        gx = _sep_conv(x, (g, g, d1))
        feats.append(jnp.sqrt(gz**2 + gy**2 + gx**2 + 1e-12))
    for a, b in zip(smoothed, smoothed[1:]):
        feats.append(a - b)
    return jnp.stack(feats, axis=-1)
