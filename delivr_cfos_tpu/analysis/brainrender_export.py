"""Brainrender-compatible point-cloud exports.

Rebuild of the data-preparation side of the reference's offline
brainrender script (reference: 2021_preprocess_for_brainrender_v13.py):
registered cell coordinates are converted into µm-scale CCF coordinates and
exported as .npy point clouds that brainrender/vedo (not installed in this
image) consume directly. Rendering itself stays external, as in the
reference (the script is out-of-pipeline, SURVEY.md §2.1 P13).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from delivr_cfos_tpu.analysis.brainrender_render import (  # noqa: F401
    CAMERAS,
    render_screenshot,
    render_video,
)


def mbrainaligner_atlas_to_ccf_um(cells: pd.DataFrame) -> np.ndarray:
    """The brainrender-variant coordinate transform
    (reference: 2021_preprocess_for_brainrender_v13.py:309-331): flip
    x (528−x) and y (320−y) in 25 µm CCF space, apply the empirically
    determined padding offsets (−210 x, +200 y), scale ×25 to µm. Input
    columns x, y, z; returns (N, 3) float64."""
    cells = cells.copy()
    cells["x"] = 528 - cells["x"]
    cells["y"] = 320 - cells["y"]
    cells["x"] = cells["x"] - 210
    cells["y"] = cells["y"] + 200
    cells[["x", "y", "z"]] = cells[["x", "y", "z"]] * 25
    return cells[["x", "y", "z"]].to_numpy(np.float64)


def export_cells_for_brainrender(
    cells_csv: str,
    output_dir: str,
    mouse_name: str,
    region_acronyms: list | None = None,
) -> str:
    """Load a stage-5 ``cells_{mouse}.csv``, optionally filter to regions,
    transform to µm CCF coordinates, save ``{mouse}_cells_um.npy``."""
    os.makedirs(output_dir, exist_ok=True)
    cells = pd.read_csv(cells_csv, index_col=0)
    if region_acronyms:
        cells = cells[cells["acronym"].isin(region_acronyms)]
    # stage-5 cells are in 25 µm CCF voxel indices; brainrender wants µm in
    # the (AP, DV, ML) = (z, y, x)·25 frame
    pts = cells[["z", "y", "x"]].to_numpy(np.float64) * 25.0
    out = os.path.join(output_dir, f"{mouse_name}_cells_um.npy")
    np.save(out, pts)
    return out


def render_screenshot(
    screenshots_folder: str,
    cells: np.ndarray,
    output_name: str,
    cells_color: str = "red",
    region_to_extract="HIP",
    camera: str | dict | None = "cFosCamera_01",
    radius: float = 15,
    alpha: float = 0.2,
):
    """Reference render driver (2021_preprocess_for_brainrender_v13.py:
    render_screenshot :180-260): add the region mesh + region-subset cell
    points to a brainrender Scene, apply a camera preset, screenshot.

    brainrender/vedo are not installed in this image, so without them the
    full scene specification (points file + regions + camera) is written as
    JSON next to the screenshots instead — everything a brainrender install
    needs to reproduce the render; with brainrender importable the render
    runs directly. Returns the artifact path."""
    os.makedirs(screenshots_folder, exist_ok=True)
    cam = CAMERAS.get(camera, camera) if isinstance(camera, str) else camera
    regions = (
        region_to_extract
        if isinstance(region_to_extract, list)
        else [region_to_extract]
    )
    name = "video_" + "_".join(map(str, regions)) + "_" + output_name
    try:
        from brainrender import Scene  # noqa: F401  (external, optional)
        from brainrender.actors import Points  # noqa: F401
    except ImportError:
        pts_file = os.path.join(screenshots_folder, name + "_points.npy")
        np.save(pts_file, np.asarray(cells))
        spec = {
            "title": None,
            "inset": None,
            "points_file": os.path.basename(pts_file),
            "regions": [
                {"acronym": r, "alpha": 0.2} for r in regions
            ],
            "points": {"color": cells_color, "alpha": alpha, "radius": radius, "res": 5},
            "camera": cam,
            "screenshot_name": name,
        }
        spec_file = os.path.join(screenshots_folder, name + "_scene.json")
        with open(spec_file, "w") as f:
            json.dump(spec, f, indent=2)
        return spec_file

    scene = Scene(title=None, screenshots_folder=screenshots_folder, inset=None)
    pts = np.asarray(cells)
    for r in regions:
        region = scene.add_brain_region(r, alpha=0.2)
        inside = region.mesh.insidePoints(pts).points()
        scene.add(Points(inside, colors=cells_color, alpha=alpha, res=5, radius=radius))
    scene.render(camera=cam, interactive=False)
    shot = scene.screenshot(name=name)
    scene.close()
    return shot


def render_video(
    video_folder: str,
    cells: np.ndarray,
    output_name: str,
    cells_color: str = "red",
    region_to_extract="HIP",
    camera: str | dict | None = "cFos_sagittal",
    n_frames: int = 360,
):
    """Reference video driver (ref :render_videos, 360° turntable). Without
    brainrender installed, writes the scene spec JSON with the animation
    parameters (degrees per frame, fps) for external rendering; with
    brainrender importable, builds the scene and renders an actual
    turntable — one frame per degree step over ``n_frames`` — via
    vedo's offscreen plotter."""
    try:
        from brainrender import Scene
        from brainrender.actors import Points
    except ImportError:
        spec_or_shot = render_screenshot(
            video_folder, cells, output_name, cells_color, region_to_extract, camera
        )
        with open(spec_or_shot) as f:
            spec = json.load(f)
        spec["animation"] = {"type": "turntable", "n_frames": n_frames, "fps": 30}
        with open(spec_or_shot, "w") as f:
            json.dump(spec, f, indent=2)
        return spec_or_shot

    os.makedirs(video_folder, exist_ok=True)
    cam = CAMERAS.get(camera, camera) if isinstance(camera, str) else camera
    regions = (
        region_to_extract
        if isinstance(region_to_extract, list)
        else [region_to_extract]
    )
    name = "video_" + "_".join(map(str, regions)) + "_" + output_name
    scene = Scene(title=None, screenshots_folder=video_folder, inset=None)
    pts = np.asarray(cells)
    for r in regions:
        region = scene.add_brain_region(r, alpha=0.2)
        inside = region.mesh.insidePoints(pts).points()
        scene.add(Points(inside, colors=cells_color, alpha=0.2, res=5, radius=15))
    scene.render(camera=cam, interactive=False)
    frames = []
    for i in range(n_frames):
        scene.plotter.camera.Azimuth(360.0 / n_frames)
        frames.append(scene.screenshot(name=f"{name}_f{i:04d}"))
    scene.close()
    return frames[-1] if frames else name
