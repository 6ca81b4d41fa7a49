import numpy as np
import pytest

import jax.numpy as jnp
from scipy.ndimage import zoom as scipy_zoom

from delivr_cfos_tpu.ops.resample import (
    block_mean_downsample,
    contrast_stretch_8bit,
    trilinear_zoom,
    zoom_mask_to,
)


def test_block_mean_matches_skimage_semantics():
    """downscale_local_mean zero-pads to a multiple and includes pad in mean."""
    rng = np.random.default_rng(0)
    vol = (rng.random((10, 31, 17)) * 60000).astype(np.uint16)
    factors = (4, 15, 15)
    out = np.asarray(block_mean_downsample(jnp.asarray(vol), factors))
    # manual: pad to (12, 45, 30) with zeros, then block mean
    padded = np.zeros((12, 45, 30), np.float64)
    padded[:10, :31, :17] = vol
    expected = padded.reshape(3, 4, 3, 15, 2, 15).mean(axis=(1, 3, 5))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_trilinear_zoom_matches_scipy_order1():
    rng = np.random.default_rng(1)
    vol = rng.random((7, 9, 5)).astype(np.float32)
    out_shape = (21, 27, 15)
    ours = np.asarray(trilinear_zoom(jnp.asarray(vol), out_shape))
    ref = scipy_zoom(vol, (3, 3, 3), order=1, prefilter=False, grid_mode=False)
    assert ref.shape == out_shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_trilinear_zoom_noninteger_factors():
    rng = np.random.default_rng(2)
    vol = rng.random((10, 8, 6)).astype(np.float32)
    out_shape = (23, 19, 17)
    ours = np.asarray(trilinear_zoom(jnp.asarray(vol), out_shape))
    ref = scipy_zoom(
        vol, (23 / 10, 19 / 8, 17 / 6), order=1, prefilter=False, grid_mode=False
    )
    assert ref.shape == out_shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_zoom_mask_chunked_equals_unchunked():
    rng = np.random.default_rng(3)
    mask = (rng.random((6, 10, 8)) > 0.5).astype(np.uint8)
    out_shape = (25, 40, 32)
    chunked = zoom_mask_to(mask, out_shape, chunk_z=7)
    ref = scipy_zoom(
        mask.astype(np.float32),
        (25 / 6, 40 / 10, 32 / 8),
        order=1,
        prefilter=False,
        grid_mode=False,
    ).astype(np.uint8)
    np.testing.assert_array_equal(chunked, ref)


def test_contrast_stretch_matches_reference_formula():
    rng = np.random.default_rng(4)
    stack = (rng.random((4, 32, 32)) * 50000).astype(np.uint16)
    ours = np.asarray(contrast_stretch_8bit(jnp.asarray(stack)))
    s = stack.astype(np.float64)
    minval = round(np.percentile(s.ravel(), 1))
    maxval = round(np.percentile(s.ravel(), 99))
    s = np.clip(s, minval, maxval)
    eq16 = ((s - minval) / (maxval - minval) * 65534).astype(np.uint16)
    expected = (eq16 >> 8).astype(np.uint8)
    # percentile interpolation may differ by ±1 grayvalue at the cutoffs
    assert np.abs(ours.astype(int) - expected.astype(int)).max() <= 1
