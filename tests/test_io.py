import glob
import os
import zipfile

import numpy as np
import pytest

from delivr_cfos_tpu.utils.io import (
    NPY_HEADER_BYTES,
    open_memmap,
    read_nifti,
    read_tiff,
    read_v3draw,
    tiff_page_infos,
    write_nifti,
    write_tiff,
    write_tiff_stack,
    write_v3draw,
    write_xlsx,
)
from delivr_cfos_tpu.utils.io.nifti import read_nifti_raw, write_nifti_raw
from delivr_cfos_tpu.utils.io.npy import memmap_raw

REF_PATCHES = sorted(
    glob.glob("/root/reference/training_data/cFos/raw/*.nii.gz")
)


# ---------------- TIFF ----------------


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_tiff_roundtrip_gray(tmp_path, dtype):
    rng = np.random.default_rng(0)
    img = (rng.random((37, 53)) * 200).astype(dtype)
    p = str(tmp_path / "img.tif")
    write_tiff(p, img)
    back = read_tiff(p)
    assert back.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(back, img)


def test_tiff_roundtrip_gray_compressed(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((64, 80)) * 65535).astype(np.uint16)
    p = str(tmp_path / "img.tif")
    write_tiff(p, img, compress=True)
    np.testing.assert_array_equal(read_tiff(p), img)


def test_tiff_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(2)
    img = (rng.random((21, 33, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.tif")
    write_tiff(p, img)
    np.testing.assert_array_equal(read_tiff(p), img)


def test_tiff_multipage_stack(tmp_path):
    rng = np.random.default_rng(3)
    stack = (rng.random((5, 17, 23)) * 65535).astype(np.uint16)
    p = str(tmp_path / "stack.tif")
    write_tiff_stack(p, stack)
    infos = tiff_page_infos(p)
    assert len(infos) == 5
    np.testing.assert_array_equal(read_tiff(p), stack)
    # lazy single-page access
    np.testing.assert_array_equal(infos[3].read(), stack[3])


def test_tiff_interop_with_cv2(tmp_path):
    """Cross-validate our codec against OpenCV's libtiff in both directions."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    img = (rng.random((40, 60)) * 65535).astype(np.uint16)
    p_cv, p_ours = str(tmp_path / "cv.tif"), str(tmp_path / "ours.tif")
    assert cv2.imwrite(p_cv, img)
    np.testing.assert_array_equal(read_tiff(p_cv), img)
    write_tiff(p_ours, img)
    back = cv2.imread(p_ours, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, img)


def test_tiff_native_lzw_packbits_decoders(tmp_path):
    """The C++ strip codecs (native/tiff_codec.cpp) must agree byte-for-byte
    with the Python reference decoders and read cv2/libtiff-written LZW and
    PackBits files. Skips if g++ is unavailable."""
    from delivr_cfos_tpu.native.build import native_available
    from delivr_cfos_tpu.native.tiff import decode_native
    from delivr_cfos_tpu.utils.io.tiff import _lzw_decode, _packbits_decode

    if not native_available():
        pytest.skip("native library unavailable")
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(12)
    # compressible texture: smooth gradient + sparse bright cells
    img = (
        np.linspace(0, 2000, 48 * 64).reshape(48, 64)
        + (rng.random((48, 64)) > 0.97) * 30000
    ).astype(np.uint16)
    for code, kind in ((5, "lzw"), (32773, "packbits")):
        p = str(tmp_path / f"c{code}.tif")
        assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, code])
        np.testing.assert_array_equal(read_tiff(p), img)
        # strip-level: native == Python decoder on the actual strips
        for info in tiff_page_infos(p):
            assert info.compression == code
            with open(p, "rb") as f:
                for off, cnt in zip(info.data_offsets, info.data_byte_counts):
                    f.seek(off)
                    raw = f.read(cnt)
                    ref = (
                        _lzw_decode(raw) if kind == "lzw"
                        else _packbits_decode(raw)
                    )
                    got = decode_native(kind, raw, len(ref) + 16)
                    assert got is not None
                    assert bytes(got) == ref


def test_tiff_native_page_decode_odd_dims(tmp_path):
    """The one-call native page decoder handles odd dimensions (short last
    strip, odd row length) identically to libtiff's own reading."""
    from delivr_cfos_tpu.native.build import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(13)
    for shape in ((45, 63), (7, 129), (201, 31)):
        img = (rng.random(shape) * 65535).astype(np.uint16)
        for code in (5, 32773):
            p = str(tmp_path / f"odd_{shape[0]}x{shape[1]}_{code}.tif")
            assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, code])
            np.testing.assert_array_equal(read_tiff(p), img)


def test_tiff_interop_rgb_with_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    img = (rng.random((16, 24, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.tif")
    write_tiff(p, img)
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back[..., ::-1], img)  # cv2 is BGR


# ---------------- NIfTI ----------------


def test_nifti_roundtrip_conventions(tmp_path):
    rng = np.random.default_rng(6)
    vol = (rng.random((10, 12, 8)) * 1000).astype(np.uint16)  # (y, x, z)
    p = str(tmp_path / "vol.nii.gz")
    write_nifti(p, vol)
    back = read_nifti(p)
    assert back.shape == vol.shape
    np.testing.assert_array_equal(back, vol)


def test_nifti_raw_roundtrip_nii_and_gz(tmp_path):
    rng = np.random.default_rng(7)
    vol = rng.random((9, 7, 5)).astype(np.float32)
    for name in ("a.nii", "b.nii.gz"):
        p = str(tmp_path / name)
        write_nifti_raw(p, vol)
        np.testing.assert_array_equal(read_nifti_raw(p), vol)


@pytest.mark.skipif(not REF_PATCHES, reason="reference training patches unavailable")
def test_nifti_reads_reference_training_patch():
    vol = read_nifti_raw(REF_PATCHES[0])
    assert vol.shape == (100, 100, 100)
    assert vol.dtype == np.float64
    assert np.isfinite(vol).all()
    assert vol.max() > vol.min()


# ---------------- npy ----------------


def test_npy_header_is_128_bytes(tmp_path):
    p = str(tmp_path / "x.npy")
    mm = open_memmap(p, shape=(1, 1, 4, 5, 6), dtype=np.uint16)
    mm[:] = 3
    mm.flush()
    raw = memmap_raw(p, shape=(1, 1, 4, 5, 6), dtype=np.uint16)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(mm))
    with open(p, "rb") as f:
        header = f.read(NPY_HEADER_BYTES)
    assert header[:6] == b"\x93NUMPY"


# ---------------- v3draw ----------------


def test_v3draw_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    vol = (rng.random((6, 10, 14)) * 65535).astype(np.uint16)
    p = str(tmp_path / "v.v3draw")
    write_v3draw(p, vol)
    back = read_v3draw(p)
    np.testing.assert_array_equal(back, vol)


# ---------------- xlsx ----------------


def test_xlsx_readable_by_zip_and_shapes(tmp_path):
    import pandas as pd

    df = pd.DataFrame(
        {"name": ["Isocortex", "CA1"], "count": [120, 7], "frac": [0.5, np.nan]},
        index=["r1", "r2"],
    )
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, {"overview": df, "raw rows": [["a", 1], ["b", 2.5]]})
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert "xl/workbook.xml" in names
        assert "xl/worksheets/sheet1.xml" in names
        assert "xl/worksheets/sheet2.xml" in names
        sheet1 = z.read("xl/worksheets/sheet1.xml").decode()
    assert "Isocortex" in sheet1
    assert "120" in sheet1


def test_xlsx_pandas_can_read_back(tmp_path):
    import pandas as pd

    try:
        import pandas.io.excel._base  # noqa: F401
        import xml.etree.ElementTree  # noqa: F401
    except ImportError:
        pytest.skip("pandas excel machinery unavailable")
    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, {"s": df})
    try:
        back = pd.read_excel(p, sheet_name="s", index_col=0)
    except ImportError:
        pytest.skip("no excel reader engine installed")
    assert list(back["a"]) == [1, 2]
    assert list(back["b"]) == ["x", "y"]
