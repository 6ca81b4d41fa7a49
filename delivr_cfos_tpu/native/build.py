"""Compile-on-first-use build for the native library (g++ → shared object).

The .so is cached next to the sources, keyed by a hash of the source text, so
rebuilds happen only when the C++ changes. No Python headers are required —
the library exposes a plain C ABI consumed via ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["cc_label.cpp", "tiff_codec.cpp"]
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_SRC_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _build(so_path: str) -> None:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        "-o",
        so_path,
        *srcs,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_library():
    """Returns the ctypes CDLL, building it if needed; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(_SRC_DIR, f"_delivr_native_{_source_hash()}.so")
        try:
            if not os.path.exists(so_path):
                _build(so_path)
            lib = ctypes.CDLL(so_path)
            lib.cc_label_u8.restype = ctypes.c_int64
            lib.cc_label_u8.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.cc_statistics_i32.restype = None
            lib.cc_statistics_i32.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            for name in ("tiff_lzw_decode", "tiff_packbits_decode"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_int64,
                    ctypes.c_void_p,
                    ctypes.c_int64,
                ]
            lib.tiff_decode_strips.restype = ctypes.c_int64
            lib.tiff_decode_strips.argtypes = [
                ctypes.c_void_p,  # src
                ctypes.c_void_p,  # src_offs
                ctypes.c_void_p,  # src_lens
                ctypes.c_int64,   # n_strips
                ctypes.c_void_p,  # dst
                ctypes.c_void_p,  # dst_offs
                ctypes.c_void_p,  # dst_caps
                ctypes.c_int64,   # kind
                ctypes.c_int64,   # n_threads
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_library() is not None
