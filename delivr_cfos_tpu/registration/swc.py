"""SWC point-file I/O matching the reference's exchange format.

The reference writes cell centroids as SWC files for mBrainAligner's
``swc_registration`` (reference: automate_mBrainaligner.py:75-197): header
line ``##n type x y z radius parent``, space-separated rows where the pandas
index is the cell number, ``type`` = 1, ``radius`` carries the blob Size, and
``parent`` = −1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SWC_HEADER = "##n type x y z radius parent\n"


def write_swc(path: str, df: pd.DataFrame) -> None:
    """``df`` columns: Structure, x, y, z, Size, Parent; index = cell number
    (reference: automate_mBrainaligner.py:135-144,188-196)."""
    with open(path, "w") as f:
        f.write(SWC_HEADER)
        df.to_csv(f, header=False, sep=" ")


def read_swc(path: str, skiprows: int = 1) -> pd.DataFrame:
    """Reads an SWC into columns n, type, x, y, z, radius, parent
    (reference: automate_mBrainaligner.py:242-244)."""
    return pd.read_csv(
        path,
        sep=" ",
        skiprows=skiprows,
        names=["n", "type", "x", "y", "z", "radius", "parent"],
    )


def swc_frame_from_cells(x, y, z, size) -> pd.DataFrame:
    """Build the reference's SWC-conform frame: Structure=1, coords rounded
    to 3 digits, Size in the radius column, Parent=−1
    (automate_mBrainaligner.py:121-144)."""
    df = pd.DataFrame(
        {
            "Structure": 1,
            "x": np.round(np.asarray(x, np.float64), 3),
            "y": np.round(np.asarray(y, np.float64), 3),
            "z": np.round(np.asarray(z, np.float64), 3),
            "Size": np.asarray(size),
            "Parent": -1,
        }
    )
    return df
