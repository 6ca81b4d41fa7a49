"""Native (C++) runtime components, loaded via ctypes.

The reference relies on prebuilt C++ binaries for its host-side heavy lifting
(cc3d labeling, TeraConverter, Ilastik; SURVEY.md §2.2). Here the native
pieces live in-tree as C++ sources compiled on first use with the system
toolchain; every native entry point has a pure-Python fallback so the
framework works without a compiler.
"""

from delivr_cfos_tpu.native.build import get_library, native_available
from delivr_cfos_tpu.native.cc import cc_label_native, cc_statistics_native

__all__ = [
    "get_library",
    "native_available",
    "cc_label_native",
    "cc_statistics_native",
]
