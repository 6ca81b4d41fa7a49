"""Render-driver tests: scene-spec construction + headless spec export.

Pins the pure scene-assembly semantics of the reference's render drivers
(reference: 2021_preprocess_for_brainrender_v13.py — render_screenshot
:180-260, render_videos :333-400, density clouds :282-287, cameras
:435-493) WITHOUT requiring brainrender/vedo/GL: ``build_scene_spec`` is
pure, and the screenshot/video entry points degrade to a spec-JSON export
on headless hosts.
"""

import json
import os

import numpy as np
import pytest

from delivr_cfos_tpu.analysis.brainrender_render import (
    CAMERAS,
    BrainRenderUnavailable,
    build_scene_spec,
    render_screenshot,
    render_video,
    resolve_camera,
)

CELLS = np.array([[100.0, 200.0, 300.0], [110.0, 210.0, 310.0]])


def test_camera_presets_complete_and_resolvable():
    # the seven presets shipped by the reference (ref :435-493)
    assert set(CAMERAS) == {
        "techpaper_cam_01",
        "cFosCamera_01",
        "cFosCamera_02",
        "cFos_Fig4_camera_01",
        "cFos_sagittal",
        "cFos_coronal",
        "cFos_top",
    }
    for name, cam in CAMERAS.items():
        resolved = resolve_camera(name)
        assert resolved == cam and resolved is not cam  # defensive copy
        assert set(cam) == {
            "pos", "viewup", "clippingRange", "focalPoint", "distance"
        }
    assert resolve_camera(None) is None
    explicit = {"pos": (0, 0, 0)}
    assert resolve_camera(explicit) is explicit
    with pytest.raises(KeyError):
        resolve_camera("nope")


def test_single_region_screenshot_spec():
    spec = build_scene_spec(CELLS, "brain7", cells_color="red",
                            region_to_extract="CA1", camera="cFos_coronal")
    # ref :216: cells_video_{region}_{output_name}
    assert spec["name"] == "cells_video_CA1_brain7"
    assert spec["regions"] == [{"acronym": "CA1", "alpha": 0.2}]
    (actor,) = spec["actors"]
    assert actor == {
        "type": "points", "subset_region": "CA1", "colors": "red",
        "alpha": 0.2, "res": 5, "radius": 15.0,
    }
    assert spec["camera"] == CAMERAS["cFos_coronal"]
    assert spec["n_cells"] == 2
    json.dumps(spec)  # JSON-serializable contract


def test_multi_region_video_spec_colors_by_region():
    anim = {"type": "turntable", "azimuth": -2.0, "fps": 15}
    spec = build_scene_spec(CELLS, "brain7",
                            region_to_extract=["CA1", "DG"],
                            camera="cFos_sagittal", animation=anim)
    # list names drop the region component (ref :334)
    assert spec["name"] == "cells_video_brain7"
    assert [a["subset_region"] for a in spec["actors"]] == ["CA1", "DG"]
    # each region's subset is colored by its own mesh color (ref :373-379)
    assert all(a["colors"] == "region" for a in spec["actors"])
    # animation shrinks the point radius (ref :379)
    assert all(a["radius"] == 3 for a in spec["actors"])
    assert spec["animation"] == anim and spec["animation"] is not anim


def test_density_spec_swaps_actor_and_prefix():
    spec = build_scene_spec(CELLS, "brain7", density=True,
                            region_to_extract="grey")
    assert spec["name"] == "density_video_grey_brain7"
    (actor,) = spec["actors"]
    assert actor["type"] == "points_density"
    assert actor["dims"] == [100, 100, 100]
    assert actor["colormap"] == "twilight"
    assert actor["radius"] == 750  # screenshot radius (ref :285)
    anim_spec = build_scene_spec(CELLS, "b", density=True,
                                 animation={"type": "turntable"})
    assert anim_spec["actors"][0]["radius"] == 500  # video radius (ref :369)


def test_headless_screenshot_exports_spec(tmp_path):
    brainrender_missing = True
    try:  # pragma: no cover - env-dependent
        import brainrender  # noqa: F401

        brainrender_missing = False
    except ImportError:
        pass
    if not brainrender_missing:
        pytest.skip("brainrender installed; headless fallback not exercised")

    out = render_screenshot(str(tmp_path), CELLS, "brainX",
                            region_to_extract="CA1", camera="cFos_top")
    assert out.endswith("cells_video_CA1_brainX_scene.json")
    with open(out) as f:
        spec = json.load(f)
    assert spec["camera"]["viewup"] == [-1, 0, 0]
    pts = np.load(os.path.join(str(tmp_path), spec["points_file"]))
    np.testing.assert_array_equal(pts, CELLS)
    with pytest.raises(BrainRenderUnavailable):
        render_screenshot(str(tmp_path), CELLS, "brainX", strict=True)


def test_headless_video_exports_spec_with_reference_animation(tmp_path):
    try:  # pragma: no cover - env-dependent
        import brainrender  # noqa: F401

        pytest.skip("brainrender installed; headless fallback not exercised")
    except ImportError:
        pass
    out = render_video(str(tmp_path), CELLS, "brainY",
                       region_to_extract=["CA1", "DG"])
    with open(out) as f:
        spec = json.load(f)
    # ref :392-396: 30 s turntable, 15 fps, azimuth −2°/frame, 3840×3840
    assert spec["animation"] == {
        "type": "turntable", "azimuth": -2.0, "elevation": 0,
        "duration": 30.0, "fps": 15, "size": "3840x3840",
    }
    assert spec["name"] == "cells_video_brainY"
