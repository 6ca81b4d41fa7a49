"""Native elastix/transformix point transforms (reference
2021_preprocess_for_brainrender_v13.py:60-167) and the brainrender render
drivers' no-backend scene-spec path."""

import json
import os

import numpy as np

from delivr_cfos_tpu.analysis.elastix_points import (
    apply_transform,
    apply_transform_chain,
    parse_transformix_output,
    read_transform_parameters,
    transform_points_native,
    write_transformix_output,
    write_transformix_points,
)


def _write_affine(path, A, t, c, initial="NoInitialTransform"):
    p = list(np.asarray(A).ravel()) + list(t)
    path.write_text(
        f'(Transform "AffineTransform")\n'
        f'(NumberOfParameters 12)\n'
        f'(TransformParameters {" ".join(f"{v:.9f}" for v in p)})\n'
        f'(CenterOfRotationPoint {c[0]} {c[1]} {c[2]})\n'
        f'(InitialTransformParametersFileName "{initial}")\n'
    )


def test_affine_transform_parameters_roundtrip(tmp_path):
    A = np.array([[1.1, 0.02, 0.0], [0.0, 0.9, 0.05], [0.01, 0.0, 1.05]])
    t = [3.0, -2.0, 1.0]
    c = [10.0, 12.0, 8.0]
    f = tmp_path / "TransformParameters.0.txt"
    _write_affine(f, A, t, c)
    params = read_transform_parameters(str(f))
    assert params["Transform"] == ["AffineTransform"]
    pts = np.random.default_rng(0).uniform(0, 30, (50, 3))
    got = apply_transform(pts, params)
    ref = (pts - c) @ A.T + c + t
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_bspline_transform_zero_coefficients_is_identity(tmp_path):
    size = (6, 5, 4)
    n = int(np.prod(size))
    f = tmp_path / "TransformParameters.1.txt"
    f.write_text(
        '(Transform "BSplineTransform")\n'
        "(BSplineTransformSplineOrder 3)\n"
        f"(GridSize {size[0]} {size[1]} {size[2]})\n"
        "(GridOrigin -10.0 -10.0 -10.0)\n"
        "(GridSpacing 10.0 10.0 10.0)\n"
        f'(TransformParameters {" ".join(["0.0"] * (3 * n))})\n'
    )
    params = read_transform_parameters(str(f))
    pts = np.random.default_rng(1).uniform(0, 20, (20, 3))
    np.testing.assert_allclose(apply_transform(pts, params), pts, atol=1e-12)


def test_bspline_constant_displacement(tmp_path):
    """Constant coefficients c shift every point by exactly c (B-spline
    partition of unity)."""
    size = (8, 8, 8)
    n = int(np.prod(size))
    cx, cy, cz = 2.5, -1.0, 4.0
    coeffs = [cx] * n + [cy] * n + [cz] * n
    f = tmp_path / "TransformParameters.1.txt"
    f.write_text(
        '(Transform "BSplineTransform")\n'
        "(BSplineTransformSplineOrder 3)\n"
        f"(GridSize {size[0]} {size[1]} {size[2]})\n"
        "(GridOrigin -20.0 -20.0 -20.0)\n"
        "(GridSpacing 10.0 10.0 10.0)\n"
        f'(TransformParameters {" ".join(str(v) for v in coeffs)})\n'
    )
    params = read_transform_parameters(str(f))
    pts = np.random.default_rng(2).uniform(0, 25, (30, 3))
    np.testing.assert_allclose(
        apply_transform(pts, params), pts + [cx, cy, cz], atol=1e-9
    )


def _rot(axis, a):
    c, s = np.cos(a), np.sin(a)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_euler_transform(tmp_path):
    """ITK Euler3DTransform: params (θx, θy, θz, t); R = Rz·Rx·Ry unless
    ComputeZYX (elastix default false)."""
    ax, ay, az = 0.3, -0.2, 0.7
    t = np.array([4.0, -1.0, 2.0])
    c = np.array([5.0, 6.0, 7.0])
    f = tmp_path / "TransformParameters.0.txt"
    f.write_text(
        '(Transform "EulerTransform")\n'
        "(NumberOfParameters 6)\n"
        f"(TransformParameters {ax} {ay} {az} {t[0]} {t[1]} {t[2]})\n"
        f"(CenterOfRotationPoint {c[0]} {c[1]} {c[2]})\n"
        '(ComputeZYX "false")\n'
    )
    params = read_transform_parameters(str(f))
    pts = np.random.default_rng(6).uniform(0, 30, (25, 3))
    R = _rot("z", az) @ _rot("x", ax) @ _rot("y", ay)
    np.testing.assert_allclose(
        apply_transform(pts, params), (pts - c) @ R.T + c + t, atol=1e-9
    )
    # ComputeZYX flips the composition to Rz·Ry·Rx
    params["ComputeZYX"] = ["true"]
    Rzyx = _rot("z", az) @ _rot("y", ay) @ _rot("x", ax)
    np.testing.assert_allclose(
        apply_transform(pts, params), (pts - c) @ Rzyx.T + c + t, atol=1e-9
    )


def test_similarity_transform(tmp_path):
    """ITK Similarity3DTransform: params (versor xyz, t, scale); A = s·R."""
    theta = 0.8  # rotation about z
    versor = [0.0, 0.0, np.sin(theta / 2)]
    t = np.array([1.0, 2.0, 3.0])
    c = np.array([10.0, 0.0, -5.0])
    s = 1.25
    f = tmp_path / "TransformParameters.0.txt"
    f.write_text(
        '(Transform "SimilarityTransform")\n'
        "(NumberOfParameters 7)\n"
        f"(TransformParameters {versor[0]} {versor[1]} {versor[2]} "
        f"{t[0]} {t[1]} {t[2]} {s})\n"
        f"(CenterOfRotationPoint {c[0]} {c[1]} {c[2]})\n"
    )
    params = read_transform_parameters(str(f))
    pts = np.random.default_rng(7).uniform(-20, 20, (25, 3))
    R = _rot("z", theta)
    np.testing.assert_allclose(
        apply_transform(pts, params), (pts - c) @ (s * R).T + c + t,
        atol=1e-9,
    )


def test_transform_chain_applies_initial_first(tmp_path):
    A1 = np.diag([2.0, 2.0, 2.0])
    f0 = tmp_path / "TransformParameters.0.txt"
    _write_affine(f0, A1, [0, 0, 0], [0, 0, 0])
    A2 = np.eye(3)
    f1 = tmp_path / "TransformParameters.1.txt"
    _write_affine(f1, A2, [5, 5, 5], [0, 0, 0], initial=str(f0))
    pts = np.array([[1.0, 2.0, 3.0]])
    got = apply_transform_chain(pts, str(f1))
    np.testing.assert_allclose(got, [[7.0, 9.0, 11.0]])


def test_transformix_io_roundtrip(tmp_path):
    pts_in = np.random.default_rng(3).uniform(0, 100, (7, 3))
    pts_out = pts_in + 1.5
    p = tmp_path / "pts.txt"
    write_transformix_points(str(p), pts_in)
    lines = p.read_text().splitlines()
    assert lines[0] == "point" and lines[1] == "7"
    op = tmp_path / "outputpoints.txt"
    write_transformix_output(str(op), pts_in, pts_out)
    # the reference's parser (column offsets 22 / 30) must read it back
    np.testing.assert_allclose(
        parse_transformix_output(str(op), indices=False), pts_out, atol=1e-5
    )
    np.testing.assert_allclose(
        parse_transformix_output(str(op), indices=True),
        np.rint(pts_out),
        atol=0,
    )


def test_transform_points_native_pipeline(tmp_path):
    A = np.diag([1.5, 1.0, 0.5])
    f0 = tmp_path / "TransformParameters.0.txt"
    _write_affine(f0, A, [1, 2, 3], [0, 0, 0])
    cells = np.random.default_rng(4).uniform(0, 50, (12, 3))
    cf = tmp_path / "cells.npy"
    np.save(cf, cells)
    out = transform_points_native(str(cf), [str(f0)])
    np.testing.assert_allclose(out, cells @ A.T + [1, 2, 3], atol=1e-9)
    assert os.path.exists(tmp_path / "Aligned_CCF3" / "outputpoints.txt")


def test_render_screenshot_scene_spec(tmp_path):
    from delivr_cfos_tpu.analysis.brainrender_export import render_screenshot

    cells = np.random.default_rng(5).uniform(0, 1000, (20, 3))
    spec_file = render_screenshot(
        str(tmp_path / "shots"), cells, "m1", region_to_extract="HIP"
    )
    assert spec_file.endswith("_scene.json")
    with open(spec_file) as f:
        spec = json.load(f)
    assert spec["regions"][0]["acronym"] == "HIP"
    assert spec["camera"]["focalPoint"] == [6888, 3571, -5717]
    pts = np.load(os.path.join(os.path.dirname(spec_file), spec["points_file"]))
    np.testing.assert_allclose(pts, cells)
