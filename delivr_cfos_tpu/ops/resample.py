"""Volume resampling ops: anisotropic block-mean downsample, trilinear zoom,
and the reference's 8-bit contrast stretch — all as XLA device ops.

These replace stage 1's CPU machinery (reference:
downsample/downsample_and_mask.py): the ``mp.Pool`` of
``skimage.transform.downscale_local_mean`` calls (:184-192), the
single-threaded ``scipy.ndimage.zoom`` mask upsample that "will take days" on
>50 GB datasets (:296-315), and ``histogram_equalization_8b`` (:118-136).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("factors",))
def block_mean_downsample(volume: jnp.ndarray, factors: tuple) -> jnp.ndarray:
    """``skimage.transform.downscale_local_mean(volume, factors)`` semantics:
    zero-pad each dim up to a multiple of the factor, then block-average
    (padded zeros are included in the mean, as in skimage), returning float32.

    The reference truncates the result to uint16 afterwards
    (downsample_and_mask.py:44); callers do that cast explicitly.
    """
    pads = tuple(
        (0, (-volume.shape[i]) % factors[i]) for i in range(volume.ndim)
    )
    if any(p[1] for p in pads):
        volume = jnp.pad(volume, pads, constant_values=0)
    x = volume.astype(jnp.float32)
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=factors,
        window_strides=factors,
        padding="VALID",
    )
    return summed / float(np.prod(factors))


@partial(jax.jit, static_argnames=("out_shape",))
def trilinear_zoom(volume: jnp.ndarray, out_shape: tuple) -> jnp.ndarray:
    """Trilinear resize with scipy ``zoom(..., order=1, grid_mode=False)``
    coordinate convention: output index i maps to input coordinate
    ``i · (in−1)/(out−1)`` (endpoints aligned). Returns float32.

    This is the on-device replacement for the reference's order-2 spline mask
    upsample (downsample_and_mask.py:296-299); for a binary mask the
    difference is confined to the interpolation band around mask edges, which
    the 30-iteration erosion in the binarization chain dominates anyway.
    """
    x = volume.astype(jnp.float32)

    def resize_axis(arr, axis, n_out):
        n_in = arr.shape[axis]
        if n_out == n_in:
            return arr
        scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        coords = jnp.arange(n_out, dtype=jnp.float32) * scale
        coords = jnp.clip(coords, 0.0, n_in - 1)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (coords - lo.astype(jnp.float32))
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return a * (1.0 - w) + b * w

    for ax in range(3):
        x = resize_axis(x, ax, out_shape[ax])
    return x


def zoom_mask_to(
    mask: np.ndarray, out_shape: tuple, chunk_z: int = 64, out=None
) -> np.ndarray:
    """Upsample a small binary (z, y, x) mask to ``out_shape`` in z-chunks on
    device; returns uint8 with scipy-style truncation toward zero (the
    reference zooms into a uint8 memmap, downsample_and_mask.py:296-299).

    Chunking maps each output z-slab to the input z-range it interpolates
    from, so peak device memory is one output slab. Pass a disk memmap as
    ``out`` for full-resolution masks (a hemisphere-scale mask does not fit
    in RAM — same discipline as the reference's mask_us memmap).
    """
    zi, yi, xi = mask.shape
    zo, yo, xo = out_shape
    if out is None:
        out = np.empty(out_shape, np.uint8)
    assert out.shape == tuple(out_shape)
    mask_f = mask.astype(np.float32)
    z_scale = (zi - 1) / (zo - 1) if zo > 1 else 0.0
    for z0 in range(0, zo, chunk_z):
        z1 = min(z0 + chunk_z, zo)
        # input coordinate range needed for this output slab
        src0 = int(np.floor(z0 * z_scale))
        src1 = min(int(np.floor(max(z1 - 1, 0) * z_scale)) + 2, zi)
        sub = jnp.asarray(mask_f[src0:src1])
        res = _zoom_slab(sub, (z1 - z0, yo, xo), z0, z_scale, src0, zi)
        out[z0:z1] = np.asarray(res).astype(np.uint8)
    return out


@partial(jax.jit, static_argnames=("out_shape",))
def _zoom_slab(sub, out_shape, z0, z_scale, src0, zi):
    n_out_z, yo, xo = out_shape
    coords = (jnp.arange(n_out_z, dtype=jnp.float32) + z0) * z_scale
    coords = jnp.clip(coords, 0.0, zi - 1) - src0
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, sub.shape[0] - 1)
    w = (coords - lo.astype(jnp.float32))[:, None, None]
    a = jnp.take(sub, lo, axis=0)
    b = jnp.take(sub, hi, axis=0)
    slab = a * (1.0 - w) + b * w
    slab = trilinear_zoom(slab, (n_out_z, yo, xo))
    return slab


@jax.jit
def contrast_stretch_8bit(stack: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``histogram_equalization_8b``
    (downsample_and_mask.py:118-136): clip to the [1%, 99%] percentiles
    (rounded), stretch to 0..65534 uint16, then skimage ``img_as_ubyte``
    (a >>8 bit shift for uint16 → uint8).
    """
    x = stack.astype(jnp.float32)
    flat = x.ravel()
    minval = jnp.round(jnp.percentile(flat, 1))
    maxval = jnp.round(jnp.percentile(flat, 99))
    x = jnp.clip(x, minval, maxval)
    eq16 = ((x - minval) / (maxval - minval) * 65534.0).astype(jnp.uint16)
    return (eq16 >> 8).astype(jnp.uint8)
