"""Obtain + convert the Allen 50 µm average template for registration.

The reference registers brains against mBrainAligner's 50 µm CCF target
space, ``-a 264 -b 160 -c 228`` (reference: automate_mBrainaligner.py:347,
363, 422). This framework's in-repo registration (stage 4) needs the
average-template volume in that space via ``atlas_alignment.template_file``
— no template ships with either repo (the Allen volume is ~100 MB).

To obtain it (network required — run on any machine, copy the file over):

    python scripts/fetch_allen_template.py --out template_50um.npy

or manually:

    curl -O http://download.alleninstitute.org/informatics-archive/\
current-release/mouse_ccf/average_template/average_template_50.nrrd
    python scripts/fetch_allen_template.py average_template_50.nrrd \
        --out template_50um.npy

Then point the config at it:

    "atlas_alignment": { "template_file": "/path/to/template_50um.npy", ... }

Orientation note: ``average_template_50.nrrd`` carries sizes (264, 160,
228) fastest-axis-first, i.e. it reads as a C-order (228, 160, 264) array —
exactly the (z, y, x) layout stage 4 expects (pipeline/stage04_atlas_align.py
ATLAS_SHAPE_ZYX). The conversion is therefore just a decode + dtype cast;
this script exists to document that and to validate the shape.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALLEN_URL = (
    "http://download.alleninstitute.org/informatics-archive/"
    "current-release/mouse_ccf/average_template/average_template_50.nrrd"
)
EXPECTED_ZYX = (228, 160, 264)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("nrrd", nargs="?", help="already-downloaded NRRD path")
    ap.add_argument("--out", default="template_50um.npy")
    args = ap.parse_args()

    path = args.nrrd
    if path is None:
        import urllib.request

        path = "average_template_50.nrrd"
        print(f"downloading {ALLEN_URL} ...")
        urllib.request.urlretrieve(ALLEN_URL, path)

    from delivr_cfos_tpu.utils.io.nrrd import read_nrrd

    vol, header = read_nrrd(path)
    print(f"read {path}: shape {vol.shape}, dtype {vol.dtype}")
    if vol.shape != EXPECTED_ZYX:
        print(
            f"WARNING: expected (z, y, x) {EXPECTED_ZYX}; stage 4 will "
            "still run but the 50 µm target-space convention "
            "(automate_mBrainaligner.py:347) assumes that shape"
        )
    np.save(args.out, vol.astype(np.float32))
    print(f"wrote {args.out} — set atlas_alignment.template_file to it")


if __name__ == "__main__":
    main()
