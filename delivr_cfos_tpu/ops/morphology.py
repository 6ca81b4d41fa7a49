"""Binary morphology on device: the reference's binarization chain.

The reference binarizes UNet output blockwise: sigmoid → ≥ threshold →
re-derive the >0 mask from the input volume → 30-iteration binary erosion with
the default 6-connected cross structuring element and ``border_value=1`` →
AND into the thresholded output (reference: inference/inference.py:31-95).

``border_value=1`` means voxels outside the array behave as foreground, so
block/slab cuts never erode inward — which is what lets the reference apply
erosion per Arrayterator block and us per z-slab.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _erode_once(x: jnp.ndarray) -> jnp.ndarray:
    """One erosion step with the 3D 6-connected cross; outside counts as 1.

    Implemented as an elementwise min over the 6 axis shifts (VPU-friendly;
    XLA fuses the pads/slices into a single loop).
    """
    out = x
    for axis in range(x.ndim):
        n = x.shape[axis]
        if n == 1:
            continue
        pad_lo = [(0, 0)] * x.ndim
        pad_lo[axis] = (1, 0)
        pad_hi = [(0, 0)] * x.ndim
        pad_hi[axis] = (0, 1)
        lo = jax.lax.slice_in_dim(
            jnp.pad(x, pad_lo, constant_values=1), 0, n, axis=axis
        )
        hi = jax.lax.slice_in_dim(
            jnp.pad(x, pad_hi, constant_values=1), 1, n + 1, axis=axis
        )
        out = jnp.minimum(out, jnp.minimum(lo, hi))
    return out


def binary_erosion_cross(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """``scipy.ndimage.binary_erosion(mask, iterations=n, border_value=1)``
    semantics (default cross structure), on device.

    ``mask`` is any integer/bool array; returns uint8.
    """
    x = (mask > 0).astype(jnp.uint8)
    if iterations <= 0:
        return x

    def body(_, m):
        return _erode_once(m)

    return jax.lax.fori_loop(0, iterations, body, x)


def binarize_logits(
    mean_logits: jnp.ndarray,
    input_volume: jnp.ndarray,
    threshold: float = 0.5,
    erosion_iters: int = 30,
) -> jnp.ndarray:
    """Reference binarization chain (inference/inference.py:60-95):
    sigmoid(mean_logits) ≥ threshold, AND eroded (input > 0) mask.

    ``mean_logits`` and ``input_volume`` are (Z, Y, X) blocks/slabs; erosion
    is applied within the block with border_value=1, exactly like the
    reference's per-block application.
    """
    seg = (jax.nn.sigmoid(mean_logits.astype(jnp.float32)) >= threshold).astype(
        jnp.uint8
    )
    mask = binary_erosion_cross(input_volume > 0, erosion_iters)
    return seg * mask
