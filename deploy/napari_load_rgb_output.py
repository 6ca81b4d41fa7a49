# Paste into the napari console to view a stage-6 RGB visualization stack.
#
# Analog of the reference's napari loader snippet
# (reference: misc_files/napari_load_delivr_rgb_output_v01.txt) for the
# identical output contract this framework writes:
# <output>/06_visualization/output/<brain>_rgb_tiffs/<brain>rgb_C0{0,1,2}_z*.tif
#
# Runs on the *viewing* workstation (napari + tifffile installed there);
# on a machine with this framework available you can swap tifffile for
# `from delivr_cfos_tpu.utils.io.tiff import read_tiff`.

import glob
import os

import numpy as np
import tifffile

input_folder = "/path/to/output/06_visualization/output/brainA_rgb_tiffs/"

# z-voxel pitch / y / x in µm at the stage-6 output resolution — the
# reference ships 25 µm-isotropic-registered data rescaled to the raw
# acquisition grid; adjust to your acquisition (reference snippet used
# [3.0, 4.75, 4.75]).
scale_zyx = [3.0, 4.75, 4.75]

for channel, colormap in (("C00", "red"), ("C01", "green"), ("C02", "blue")):
    files = sorted(glob.glob(os.path.join(input_folder, f"*{channel}*")))
    if not files:
        continue
    stack = np.stack([tifffile.imread(f) for f in files])
    viewer.add_image(  # noqa: F821  (napari console provides `viewer`)
        stack, colormap=colormap, blending="additive", scale=scale_zyx
    )

viewer.scale_bar.unit = "um"  # noqa: F821
viewer.scale_bar.length = 1000  # noqa: F821
viewer.scale_bar.visible = True  # noqa: F821
