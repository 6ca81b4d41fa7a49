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


# --------------------------------------------------------------------------
# Ilastik-compatible feature bank (for .ilp-imported classifiers)
# --------------------------------------------------------------------------

# canonical Ilastik pixel-classification feature ids, in the order the GUI
# (and the .ilp SelectionMatrix rows) list them
ILASTIK_FEATURE_IDS = (
    "GaussianSmoothing",
    "LaplacianOfGaussian",
    "GaussianGradientMagnitude",
    "DifferenceOfGaussians",
    "StructureTensorEigenvalues",
    "HessianOfGaussianEigenvalues",
)


def _eigvals_sym3(a11, a22, a33, a12, a13, a23):
    """Eigenvalues of a symmetric 3×3 per-voxel field, descending — closed
    form (trigonometric/Cardano), fully vectorized."""
    q = (a11 + a22 + a33) / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = (
        b11**2 + b22**2 + b33**2 + 2.0 * (a12**2 + a13**2 + a23**2)
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det((A − qI)/p) / 2
    detb = (
        b11 * (b22 * b33 - a23 * a23)
        - a12 * (a12 * b33 - a23 * a13)
        + a13 * (a12 * a23 - b22 * a13)
    )
    r = jnp.clip(detb / (2.0 * p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    degen = p2 < 1e-20
    return (
        jnp.where(degen, q, e1),
        jnp.where(degen, q, e2),
        jnp.where(degen, q, e3),
    )


def _deriv_conv(x, sigma, orders):
    """Gaussian-derivative filter with per-axis derivative orders (z, y, x)."""
    ks = tuple(_gauss_kernel(sigma, o) for o in orders)
    return _sep_conv(x, ks)


def ilastik_feature_channels(fid: str, sigma: float):
    """Number of channels a 3D Ilastik feature produces."""
    return 3 if fid in (
        "StructureTensorEigenvalues",
        "HessianOfGaussianEigenvalues",
    ) else 1


@partial(jax.jit, static_argnames=("spec",))
def ilastik_feature_bank(vol: jnp.ndarray, spec: tuple) -> jnp.ndarray:
    """(Z, Y, X) volume → (Z, Y, X, F) float32 features for an Ilastik
    feature selection ``spec`` = tuple of (feature_id, sigma) in .ilp
    SelectionMatrix order (feature ids outer, scales inner).

    Filter definitions follow ilastik's (lazyflow OpPixelFeaturesPresmoothed
    semantics, computed exactly at σ rather than via ilastik's presmoothed
    pyramid approximation):
      DifferenceOfGaussians(σ)        = gauss(σ) − gauss(0.66·σ)
      StructureTensorEigenvalues(σ)   : inner scale σ, outer scale σ/2,
                                        3 eigenvalues descending
      HessianOfGaussianEigenvalues(σ) : 3 eigenvalues descending
    """
    x = vol.astype(jnp.float32)
    feats = []
    for fid, s in spec:
        s = float(s)
        if fid == "GaussianSmoothing":
            g = _gauss_kernel(s, 0)
            feats.append(_sep_conv(x, (g, g, g)))
        elif fid == "LaplacianOfGaussian":
            feats.append(
                _deriv_conv(x, s, (2, 0, 0))
                + _deriv_conv(x, s, (0, 2, 0))
                + _deriv_conv(x, s, (0, 0, 2))
            )
        elif fid == "GaussianGradientMagnitude":
            gz = _deriv_conv(x, s, (1, 0, 0))
            gy = _deriv_conv(x, s, (0, 1, 0))
            gx = _deriv_conv(x, s, (0, 0, 1))
            feats.append(jnp.sqrt(gz**2 + gy**2 + gx**2 + 1e-12))
        elif fid == "DifferenceOfGaussians":
            g1 = _gauss_kernel(s, 0)
            g2 = _gauss_kernel(0.66 * s, 0)
            feats.append(_sep_conv(x, (g1, g1, g1)) - _sep_conv(x, (g2, g2, g2)))
        elif fid == "StructureTensorEigenvalues":
            gz = _deriv_conv(x, s, (1, 0, 0))
            gy = _deriv_conv(x, s, (0, 1, 0))
            gx = _deriv_conv(x, s, (0, 0, 1))
            go = _gauss_kernel(s / 2.0, 0)
            sm = lambda t: _sep_conv(t, (go, go, go))  # noqa: E731
            e1, e2, e3 = _eigvals_sym3(
                sm(gz * gz), sm(gy * gy), sm(gx * gx),
                sm(gz * gy), sm(gz * gx), sm(gy * gx),
            )
            feats += [e1, e2, e3]
        elif fid == "HessianOfGaussianEigenvalues":
            e1, e2, e3 = _eigvals_sym3(
                _deriv_conv(x, s, (2, 0, 0)),
                _deriv_conv(x, s, (0, 2, 0)),
                _deriv_conv(x, s, (0, 0, 2)),
                _deriv_conv(x, s, (1, 1, 0)),
                _deriv_conv(x, s, (1, 0, 1)),
                _deriv_conv(x, s, (0, 1, 1)),
            )
            feats += [e1, e2, e3]
        else:
            raise ValueError(f"unknown Ilastik feature id {fid!r}")
    return jnp.stack(feats, axis=-1)


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
