"""From-scratch zarr v2 codec + streaming-engine integration (BASELINE
config 2: blockwise inference over a multi-chunk zarr volume)."""

import json
import os

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.utils.io.zarr import ZarrVolume, write_zarr


def test_zarr_roundtrip_compressors(tmp_path):
    rng = np.random.default_rng(0)
    arr = (rng.random((37, 22, 15)) * 1000).astype(np.uint16)
    for comp in (None, "zlib"):
        p = str(tmp_path / f"a_{comp}")
        write_zarr(p, arr, chunks=(16, 8, 8), compressor=comp)
        z = ZarrVolume(p)
        assert z.shape == arr.shape and z.dtype == arr.dtype
        np.testing.assert_array_equal(np.asarray(z), arr)


def test_zarr_gzip_chunks_are_true_gzip(tmp_path):
    """A 'gzip' compressor id must produce gzip-framed chunks (magic
    1f 8b) so external numcodecs GZip readers can decode them."""
    import gzip

    rng = np.random.default_rng(2)
    arr = (rng.random((10, 8)) * 255).astype(np.uint8)
    p = str(tmp_path / "g")
    write_zarr(p, arr, chunks=(10, 8), compressor="gzip")
    chunk = [f for f in os.listdir(p) if not f.startswith(".")][0]
    raw = open(os.path.join(p, chunk), "rb").read()
    assert raw[:2] == b"\x1f\x8b"
    assert gzip.decompress(raw) == arr.tobytes()  # independent decoder
    np.testing.assert_array_equal(np.asarray(ZarrVolume(p)), arr)


def test_zarr_partial_reads(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((40, 30, 20)).astype(np.float32)
    p = str(tmp_path / "b")
    write_zarr(p, arr, chunks=(7, 9, 20))
    z = ZarrVolume(p)
    np.testing.assert_array_equal(z[3:25], arr[3:25])
    np.testing.assert_array_equal(z[5:6, 2:29, 3:17], arr[5:6, 2:29, 3:17])
    np.testing.assert_array_equal(z[12], arr[12])
    np.testing.assert_array_equal(z[:, 4], arr[:, 4])


def test_zarr_missing_chunks_fill(tmp_path):
    arr = np.ones((8, 8), np.int32)
    p = str(tmp_path / "c")
    write_zarr(p, arr, chunks=(4, 4), compressor=None)
    os.remove(os.path.join(p, "1.1"))
    z = ZarrVolume(p)
    got = np.asarray(z)
    assert (got[:4, :4] == 1).all()
    assert (got[4:, 4:] == 0).all()


def test_zarr_dimension_separator_slash(tmp_path):
    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    p = str(tmp_path / "d")
    write_zarr(p, arr, chunks=(2, 3), dimension_separator="/")
    # chunk files live in subdirectories
    assert os.path.isfile(os.path.join(p, "0", "0"))
    z = ZarrVolume(p)
    np.testing.assert_array_equal(np.asarray(z), arr)


def test_streaming_inference_from_zarr(tmp_path):
    """The streaming engine consumes a ZarrVolume directly (arraylike
    protocol) and matches the in-RAM result."""
    from delivr_cfos_tpu.engine.sliding_window import (
        SlidingWindowConfig,
        infer_volume,
    )
    from delivr_cfos_tpu.engine.streaming import infer_volume_streaming
    from delivr_cfos_tpu.models import BasicUNetConfig, init_params

    model_cfg = BasicUNetConfig(features=(4, 4, 8, 16, 32, 4))
    params = init_params(jax.random.PRNGKey(5), model_cfg)
    rng = np.random.default_rng(2)
    vol = np.zeros((48, 32, 32), np.uint16)
    vol[:, :16] = (rng.random((48, 16, 32)) * 700).astype(np.uint16)
    p = str(tmp_path / "vol.zarr")
    write_zarr(p, vol, chunks=(16, 16, 16))
    z = ZarrVolume(p)

    cfg = SlidingWindowConfig(roi=(16, 16, 16), overlap=0.5, batch_size=4, tta=False)
    logits = np.empty(vol.shape, np.float32)
    infer_volume_streaming(
        params, z, cfg, model_cfg, slab_z_starts=2, logits_out=logits
    )
    mean_whole, _ = infer_volume(params, vol, cfg, model_cfg, return_binary=False)
    np.testing.assert_allclose(logits, np.asarray(mean_whole), rtol=1e-4, atol=1e-4)
