"""NRRD codec (Allen atlas volume format) round-trips and header handling."""

import gzip

import numpy as np
import pytest

from delivr_cfos_tpu.utils.io.nrrd import read_nrrd, write_nrrd


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32, np.int32])
@pytest.mark.parametrize("encoding", ["raw", "gzip"])
def test_roundtrip(tmp_path, dtype, encoding):
    rng = np.random.default_rng(0)
    arr = (rng.random((9, 7, 5)) * 200).astype(dtype)
    p = str(tmp_path / "a.nrrd")
    write_nrrd(p, arr, encoding=encoding)
    back, header = read_nrrd(p)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, arr)
    # sizes are written fastest-axis-first (NRRD convention)
    assert header["sizes"] == "5 7 9"


def test_reads_allen_style_header(tmp_path):
    """Hand-built header in the Allen informatics-archive style (gzip,
    little endian, space directions present but ignored)."""
    arr = np.arange(24, dtype=np.uint16).reshape(2, 3, 4)
    payload = gzip.compress(arr.astype("<u2").tobytes())
    header = (
        b"NRRD0004\n"
        b"# Complete NRRD file format specification at:\n"
        b"type: unsigned short\n"
        b"dimension: 3\n"
        b"space: left-posterior-superior\n"
        b"sizes: 4 3 2\n"
        b"space directions: (50,0,0) (0,50,0) (0,0,50)\n"
        b"kinds: domain domain domain\n"
        b"endian: little\n"
        b"encoding: gzip\n"
        b"space origin: (0,0,0)\n"
        b"\n"
    )
    p = tmp_path / "allen.nrrd"
    p.write_bytes(header + payload)
    back, hdr = read_nrrd(str(p))
    np.testing.assert_array_equal(back, arr)
    assert hdr["space"] == "left-posterior-superior"


def test_rejects_non_nrrd(tmp_path):
    p = tmp_path / "x.nrrd"
    p.write_bytes(b"not a nrrd\n\n")
    with pytest.raises(ValueError):
        read_nrrd(str(p))
