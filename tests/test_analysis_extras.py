import os

import numpy as np
import pandas as pd
import pytest

from delivr_cfos_tpu.analysis.brainrender_export import (
    export_cells_for_brainrender,
    mbrainaligner_atlas_to_ccf_um,
)
from delivr_cfos_tpu.analysis.depth_profile import (
    calculate_mask_distance,
    depth_intensity_profile,
)


def test_depth_profile_monotone_geometry():
    """A solid ball with intensity ∝ depth should give increasing medians."""
    shape = (40, 40, 40)
    zz, yy, xx = np.indices(shape)
    c = 20
    dist = np.sqrt((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2)
    vol = np.where(dist < 15, (15 - dist) * 100, 0).astype(np.uint16)
    profile = depth_intensity_profile(vol, spacing=(1, 1, 1))
    med = profile["median_intensity"].dropna().to_numpy()
    assert len(med) >= 10
    assert (np.diff(med) >= 0).mean() > 0.8  # essentially monotone


def test_calculate_mask_distance_artifacts(tmp_path):
    rng = np.random.default_rng(0)
    vol = np.zeros((20, 20, 20), np.uint16)
    vol[4:16, 4:16, 4:16] = (rng.random((12, 12, 12)) * 500 + 50).astype(np.uint16)
    out = str(tmp_path)
    profile = calculate_mask_distance(vol, out, "sampleA", spacing=(6, 1.62, 1.62))
    assert os.path.exists(os.path.join(out, "sampleA_combined_data.csv"))
    assert len(profile) > 0


def test_brainrender_transform_formula():
    cells = pd.DataFrame({"x": [528.0, 210.0], "y": [320.0, 120.0], "z": [10.0, 50.0]})
    pts = mbrainaligner_atlas_to_ccf_um(cells)
    # x' = (528−x−210)·25 ; y' = (320−y+200)·25 ; z' = z·25
    np.testing.assert_allclose(pts[0], [(-210) * 25, 200 * 25, 250])
    np.testing.assert_allclose(pts[1], [(528 - 210 - 210) * 25, (320 - 120 + 200) * 25, 1250])


def test_export_cells_for_brainrender(tmp_path):
    cells = pd.DataFrame(
        {
            "x": [10, 20],
            "y": [30, 40],
            "z": [50, 60],
            "acronym": ["CA1", "Isocortex"],
        }
    )
    csv = str(tmp_path / "cells_m.csv")
    cells.to_csv(csv)
    out = export_cells_for_brainrender(csv, str(tmp_path), "m", region_acronyms=["CA1"])
    pts = np.load(out)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [50 * 25, 30 * 25, 10 * 25])


def test_napari_loader_layers(tmp_path):
    """misc_files/napari_load_delivr_rgb_output_v01.txt parity: three
    additive RGB layers with the reference scale and a visible scale bar."""
    import numpy as np
    from delivr_cfos_tpu.analysis.napari_loader import load_rgb_output
    from delivr_cfos_tpu.utils.io.tiff import write_tiff

    class _Bar:
        pass

    class _Viewer:
        def __init__(self):
            self.layers = []
            self.scale_bar = _Bar()

        def add_image(self, img, **kw):
            self.layers.append((img.shape, kw))

    for z in range(4):
        for c in range(3):
            write_tiff(
                str(tmp_path / f"rgb_C{c:02d}_z{z:04d}.tif"),
                np.full((6, 5), c, np.uint8),
            )
    v = _Viewer()
    load_rgb_output(v, str(tmp_path))
    assert len(v.layers) == 3
    shapes = {s for s, _ in v.layers}
    assert shapes == {(4, 6, 5)}
    cmaps = [kw["colormap"] for _, kw in v.layers]
    assert cmaps == ["red", "green", "blue"]
    assert all(kw["blending"] == "additive" for _, kw in v.layers)
    assert all(kw["scale"] == [3.0, 4.75, 4.75] for _, kw in v.layers)
    assert v.scale_bar.visible and v.scale_bar.length == 1000.0


REAL_ONTOLOGY = "/root/reference/models/AllenMouseCCFv3_ontology_22Feb2021.xml"


@pytest.mark.skipif(not os.path.exists(REAL_ONTOLOGY), reason="reference asset absent")
def test_parse_real_allen_ontology_asset():
    """Parse the actual shipped Allen CCFv3 ontology (1327 structures) —
    the asset every real deployment feeds to stage 5
    (reference: cells_to_atlas.py:26-90, models/ dir)."""
    from delivr_cfos_tpu.analysis.ontology import parse_ontology_xml

    df = parse_ontology_xml(REAL_ONTOLOGY)
    assert len(df) == 1328  # synthetic background row + 1327 structures

    # row 0: background sentinel; row 1: root in document order
    assert df.iloc[0]["acronym"] == "bgr"
    root = df.iloc[1]
    assert root["id"] == 997
    assert root["acronym"] == "root"  # double quotes stripped
    assert root["parent_acronym"] == '"root"'  # reference quirk kept verbatim
    assert root["graph_order"] == 0

    # document order IS graph_order order for the Allen ontology — the
    # annotation volume indexes rows by iloc[graph_order + 1]
    orders = df["graph_order"].to_numpy()[1:]
    assert (orders == np.arange(1327)).all()

    # the two id remaps fire on the real file (only the remapped ids exist
    # in the annotation volume)
    ids = set(df["id"].tolist())
    assert 312782560 in ids and 614454272 in ids
    assert 312782566 not in ids and 614454277 not in ids

    # every color triplet parsed to valid RGB
    for ch in ("red", "green", "blue"):
        v = df[ch].to_numpy()[1:]
        assert v.min() >= 0 and v.max() <= 255
    # spot-check a well-known structure: Isocortex is green 70FF71
    iso = df[df["acronym"] == "Isocortex"].iloc[0]
    assert iso["color-hex-triplet"] == "70FF71"
    assert (iso["red"], iso["green"], iso["blue"]) == (0x70, 0xFF, 0x71)
