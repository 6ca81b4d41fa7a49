from delivr_cfos_tpu.utils.io.tiff import (
    read_tiff,
    write_tiff,
    read_tiff_stack,
    write_tiff_stack,
    TiffPageInfo,
    tiff_page_infos,
)
from delivr_cfos_tpu.utils.io.nifti import read_nifti, write_nifti
from delivr_cfos_tpu.utils.io.v3draw import read_v3draw, write_v3draw
from delivr_cfos_tpu.utils.io.npy import open_memmap, NPY_HEADER_BYTES
from delivr_cfos_tpu.utils.io.xlsx import write_xlsx

__all__ = [
    "read_tiff",
    "write_tiff",
    "read_tiff_stack",
    "write_tiff_stack",
    "TiffPageInfo",
    "tiff_page_infos",
    "read_nifti",
    "write_nifti",
    "read_v3draw",
    "write_v3draw",
    "open_memmap",
    "NPY_HEADER_BYTES",
    "write_xlsx",
]
