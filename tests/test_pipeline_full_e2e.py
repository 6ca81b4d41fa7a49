"""THE full-pipeline test: all six stages in ONE ``run_pipeline`` call with
REAL template-driven intensity registration (VERDICT r3 item 1 — the only
production branch no test had ever executed was stage 4's template path,
stage04_atlas_align.py resolve_registration intensity arm + _load_template).

Construction (see scripts/proto_full_e2e.py for the measured prototype):
- a synthetic 50 µm "Allen-like" template (228, 160, 264) with an
  ellipsoidal brain, multi-axis texture and strong mirror asymmetry
  (the multistart flip race needs a unique winner), written as .nrrd;
- a ground-truth affine A_gt mapping downsampled-brain coords → template
  coords; the raw brain stack IS the template pulled back through A_gt
  (evaluated analytically — zero resampling error), scaled to 16-bit with
  noise, plus bright blobs at known ground-truth template positions;
- a synthetic CCF3 annotation (456, 528, 320) split into two z-bands, so
  each blob's expected atlas region follows from its ground-truth template
  z (registration error budget: prototype mean 3.3 / max 7.9 template
  voxels; band margins ≥ 12).

The same run is repeated DISTRIBUTED (blob_detection.spatial_shards=4,
dcn_slices=2 — the BASELINE config-5 shape) on the virtual 8-device mesh,
and stage outputs must be bit-equal.

Reference anchors: __main__.py:90-221 (the six-stage loop this reproduces),
automate_mBrainaligner.py:21-72 (the registration stage being replaced).
"""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig
from delivr_cfos_tpu.models.convert import save_params_npz
from delivr_cfos_tpu.pipeline.runner import run_pipeline
from delivr_cfos_tpu.utils.io.nrrd import write_nrrd
from delivr_cfos_tpu.utils.io.tiff import write_tiff, write_tiff_stack

pytestmark = pytest.mark.slow  # all six stages end-to-end

TINY = (4, 4, 8, 16, 32, 4)
RAW_SHAPE = (24, 96, 96)  # (z, y, x); ratios (1, 4, 4)
DS_SHAPE = (23, 24, 24)  # stage-1 z-chunk quirk: ceil(24/1) − 1
DS_F = (RAW_SHAPE[0] / DS_SHAPE[0], 4.0, 4.0)  # stage-4 sampling factors
TEMPLATE_SHAPE = (228, 160, 264)  # mBrainAligner 50 µm (z, y, x)

ONTOLOGY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<response>
<structure>
  <id>997</id>
  <name>root</name>
  <acronym>root</acronym>
  <color-hex-triplet>FFFFFF</color-hex-triplet>
  <graph-order>0</graph-order>
  <parent-structure-id>-1</parent-structure-id>
  <st-level>0</st-level>
</structure>
<structure>
  <id>315</id>
  <name>Isocortex</name>
  <acronym>Isocortex</acronym>
  <color-hex-triplet>70FF71</color-hex-triplet>
  <graph-order>1</graph-order>
  <parent-structure-id>997</parent-structure-id>
  <st-level>1</st-level>
</structure>
<structure>
  <id>382</id>
  <name>Field CA1</name>
  <acronym>CA1</acronym>
  <color-hex-triplet>7ED04B</color-hex-triplet>
  <graph-order>2</graph-order>
  <parent-structure-id>997</parent-structure-id>
  <st-level>2</st-level>
</structure>
</response>
"""

# annotation z-bands (CCF 25 µm index = 2 × template z):
# template z < 80  → ann value 2 ("front" region)
# template z ≥ 80 → ann value 1 ("back" region)
ANN_SPLIT_CCF_Z = 160

# blob ground truth in DOWNSAMPLED-brain (fixed) coords (z, y, x).
# Through A_gt: fixed z {3..7} → template z 43-60 (front band, margin ≥ 12
# vs the prototype's ≤ 8-voxel registration error); fixed z {16, 18, 19} →
# template z 99-113 (back band). The fixed-z-19 blob has the largest raster
# order and is the one the reference's range(1, N) quirk drops.
BLOBS_FRONT = [(3, 6, 8), (4, 12, 14), (5, 17, 7), (6, 9, 17), (7, 14, 10)]
BLOBS_BACK = [(16, 8, 9), (18, 13, 15), (19, 16, 8)]


def template_fn(z, y, x):
    """Analytic template (see module docstring). Broadcastable float
    coords in template voxel space."""
    c = (80.0, 80.0, 130.0)
    r = (58.0, 60.0, 108.0)
    q = (
        ((z - c[0]) / r[0]) ** 2
        + ((y - c[1]) / r[1]) ** 2
        + ((x - c[2]) / r[2]) ** 2
    )
    inside = (q <= 1.0).astype(np.float32)
    tex = (
        150.0
        + 60.0 * np.sin(2 * np.pi * z / 50.0)
        + 45.0 * np.cos(2 * np.pi * y / 40.0)
        + 35.0 * np.sin(2 * np.pi * x / 60.0)
        - 70.0 * q
        + 0.45 * z
        + 0.5 * y
        + 0.25 * x
        + 90.0 * np.exp(
            -((z - 55.0) ** 2 + (y - 55.0) ** 2 + (x - 85.0) ** 2)
            / (2 * 22.0**2)
        )
    )
    return inside * np.clip(tex, 10.0, None)


def gt_affine():
    """Ground truth fixed (23, 24, 24) → template: anisotropic scale into
    a sub-box of the template + small in-plane rotation + translation."""
    s = np.array([100.0 / DS_SHAPE[0], 120.0 / DS_SHAPE[1], 200.0 / DS_SHAPE[2]])
    th = np.deg2rad(4.0)
    R = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]]
    )
    A = np.diag(s) @ R
    t = np.array([30.0, 20.0, 30.0])
    return np.concatenate([A, t[:, None]], axis=1).astype(np.float32)


def _blob_gt():
    """(fixed_coords, template_coords, raw_cube_start) per blob, plus the
    expected annotation value per blob."""
    A = gt_affine()
    rows = []
    for fz, fy, fx in BLOBS_FRONT + BLOBS_BACK:
        t = A[:, :3] @ np.array([fz, fy, fx], np.float64) + A[:, 3]
        raw = np.rint(np.array([fz, fy, fx]) * np.array(DS_F)).astype(int)
        ann_val = 2 if 2 * t[0] < ANN_SPLIT_CCF_Z else 1
        rows.append(((fz, fy, fx), t, raw, ann_val))
    return rows


def _build_raw_brain(raw_dir, seed=0):
    """Raw 16-bit z-plane TIFFs: the template pulled back through A_gt at
    the pipeline's own sampling convention (raw → downsampled coords =
    divide by DS_F, matching stage-4 compute_sampling_factors semantics),
    plus bright blobs at the ground-truth positions."""
    A = gt_affine()
    Z, Y, X = RAW_SHAPE
    zz, yy, xx = np.meshgrid(
        np.arange(Z, dtype=np.float64) / DS_F[0],
        np.arange(Y, dtype=np.float64) / DS_F[1],
        np.arange(X, dtype=np.float64) / DS_F[2],
        indexing="ij",
    )
    pts = np.stack([zz, yy, xx], -1).reshape(-1, 3)
    tpts = pts @ A[:, :3].T + A[:, 3]
    raw = template_fn(tpts[:, 0], tpts[:, 1], tpts[:, 2]).reshape(RAW_SHAPE)
    rng = np.random.default_rng(seed)
    # ×30 keeps texture ≤ ~12k — a 5× margin to the 60000 blobs so the
    # tiny trained model separates them decisively (no speck detections)
    raw16 = np.clip(raw * 30.0 + rng.normal(0, 25, RAW_SHAPE), 0, 65535).astype(
        np.uint16
    )
    # inside-brain floor clears the stage-1 threshold (250 on the
    # downsampled block means) so the mask is exactly the brain
    raw16 = np.where(raw > 1.0, np.maximum(raw16, 400), raw16)
    for _, _, (bz, by, bx), _ in _blob_gt():
        raw16[bz - 1 : bz + 1, by - 3 : by + 3, bx - 3 : bx + 3] = 60000
    os.makedirs(raw_dir, exist_ok=True)
    for z in range(Z):
        write_tiff(os.path.join(raw_dir, f"Z{z:04d}.tif"), raw16[z])
    return raw16


def _train_tiny_model(raw16, weights_path, seed=11):
    """Train the tiny UNet to segment the bright blobs (decisive logits, as
    test_fast_parity does) and save the checkpoint."""
    from delivr_cfos_tpu.training import TrainConfig, make_train_step

    tc = TrainConfig(model=BasicUNetConfig(features=TINY), learning_rate=1e-2)
    init_state, step = make_train_step(tc)
    params, opt_state = init_state()
    blobs = [r[2] for r in _blob_gt()]
    win_rng = np.random.default_rng(seed)
    for _ in range(250):
        xs, ys = [], []
        for k in range(4):
            if k % 2 == 0:
                c = blobs[win_rng.integers(len(blobs))]
                z0 = int(np.clip(c[0] - 8, 0, RAW_SHAPE[0] - 16))
                y0 = int(np.clip(c[1] - 8, 0, RAW_SHAPE[1] - 16))
                x0 = int(np.clip(c[2] - 8, 0, RAW_SHAPE[2] - 16))
            else:
                hi = np.array(RAW_SHAPE) - 16
                z0, y0, x0 = win_rng.integers((0, 0, 0), hi, endpoint=True)
            patch = raw16[z0 : z0 + 16, y0 : y0 + 16, x0 : x0 + 16]
            xs.append(patch.astype(np.float32))
            ys.append((patch > 30000).astype(np.float32))
        x = np.stack(xs)[..., None]
        y = np.stack(ys)[..., None]
        params, opt_state, _ = step(
            params, opt_state, jax.numpy.asarray(x), jax.numpy.asarray(y)
        )
    save_params_npz(str(weights_path), params)


def _write_assets(tmp):
    """Template (.nrrd — exercises _load_template's NRRD arm), annotation
    volume, ontology XML."""
    Z, Y, X = TEMPLATE_SHAPE
    z, y, x = np.meshgrid(
        np.arange(Z, dtype=np.float32),
        np.arange(Y, dtype=np.float32),
        np.arange(X, dtype=np.float32),
        indexing="ij",
    )
    template = template_fn(z, y, x).astype(np.float32)
    template_path = tmp / "average_template_50.nrrd"
    write_nrrd(str(template_path), template)

    ann = np.ones((456, 528, 320), np.uint16)
    ann[:ANN_SPLIT_CCF_Z] = 2
    ann_path = tmp / "CCF3_annotation.tif"
    write_tiff_stack(str(ann_path), ann, compress=True)

    ontology_path = tmp / "ontology.xml"
    ontology_path.write_text(ONTOLOGY_XML)
    return template_path, ann_path, ontology_path


def _make_cfg(tmp, raw, out_name, weights, template_path, ann_path,
              ontology_path, spatial_shards=1, dcn_slices=1):
    return PipelineConfig.from_dict(
        {
            "raw_location": str(raw),
            "output_location": str(tmp / out_name),
            "mask_detection": {
                "output_location": "01_mask_detection/output/",
                "downsample_steps": {
                    "original_um_x": 6.25,
                    "original_um_y": 6.25,
                    "original_um_z": 25.0,
                    "downsample_um_x": 25.0,
                    "downsample_um_y": 25.0,
                    "downsample_um_z": 25.0,
                },
                "mask_with_Ilastik": False,
                "simple_threshold_value": 250,
            },
            "blob_detection": {
                "input_location": "01_mask_detection/output/",
                "model_location": str(weights),
                "output_location": "02_blob_detection/output/",
                "window_dimensions": {
                    "window_dim_0": 16,
                    "window_dim_1": 16,
                    "window_dim_2": 16,
                },
                "erosion_iters": 1,
                "spatial_shards": spatial_shards,
                "dcn_slices": dcn_slices,
            },
            "postprocessing": {
                "input_location": "02_blob_detection/output/",
                "output_location": "03_postprocessing/output/",
            },
            "atlas_alignment": {
                "input_location": "03_postprocessing/output/",
                "output_location": "04_atlas_alignment/output/",
                "collection_folder": "04_atlas_alignment/collection/",
                "template_file": str(template_path),
                "similarity": "ncc",
                "use_ffd": True,
                "multistart": True,
            },
            "region_assignment": {
                "input_location": "04_atlas_alignment/collection/",
                "CCF3_atlasfile": str(ann_path),
                "CCF3_ontology": str(ontology_path),
                "output_location": "05_region_assignment/",
            },
            "visualization": {
                "input_csv_location": "05_region_assignment/",
                "input_size_location": "03_postprocessing/output/",
                "input_prediction_location": "02_blob_detection/output/",
                "cache_location": str(tmp / out_name / "06_visualization/cache"),
                "output_location": "06_visualization/output/",
                "region_id_rgb": True,
            },
            "FLAGS": {"TEST_TIME_AUGMENTATION": False},
        }
    )


@pytest.fixture(scope="module")
def full_run(tmp_path_factory, capsys_module=None):
    tmp = tmp_path_factory.mktemp("full_e2e")
    raw = tmp / "raw"
    raw16 = _build_raw_brain(str(raw / "mouseF"))
    weights = tmp / "weights.npz"
    _train_tiny_model(raw16, weights)
    template_path, ann_path, ontology_path = _write_assets(tmp)

    cfg = _make_cfg(
        tmp, raw, "out", weights, template_path, ann_path, ontology_path
    )
    run_pipeline(cfg)
    return cfg, tmp, (raw, weights, template_path, ann_path, ontology_path)


def _expected_region_counts():
    """acronym → expected cell count, after the reference's dropped-last-blob
    quirk (the max-raster blob is the fixed-z-19 back-band one)."""
    rows = _blob_gt()
    # drop the blob whose raw cube start is raster-largest (stage-3 quirk)
    starts = [tuple(r[2] - np.array([1, 3, 3])) for r in rows]
    drop = starts.index(max(starts))
    counts = {}
    for i, (_, _, _, ann_val) in enumerate(rows):
        if i == drop:
            continue
        counts[ann_val] = counts.get(ann_val, 0) + 1
    return counts  # {2: 5, 1: 2}


def test_all_six_stages_ran(full_run):
    cfg, tmp, _ = full_run
    # every stage left its contract artifact
    base1 = os.path.join(cfg.mask_detection.output_location, "mouseF")
    assert os.path.exists(os.path.join(base1, "stack_masked_downsampled.v3draw"))
    assert os.path.exists(
        os.path.join(
            cfg.blob_detection.output_location,
            "mouseF",
            "binary_segmentations",
            "binaries.npy",
        )
    )
    csvs = [
        f
        for f in os.listdir(cfg.postprocessing.output_location)
        if f.endswith(".csv")
    ]
    assert csvs == [f"{RAW_SHAPE}_mouseF.csv"]
    assert os.path.exists(
        os.path.join(
            cfg.atlas_alignment.output_location, "mouseF", "transform.npz"
        )
    )
    assert os.path.exists(
        os.path.join(cfg.region_assignment.output_location, "cells_mouseF.csv")
    )
    assert os.path.isdir(
        os.path.join(cfg.visualization.output_location, "mouseF_rgb_tiffs")
    )


def test_stage2_found_all_blobs(full_run):
    cfg, _, _ = full_run
    df = pd.read_csv(
        os.path.join(
            cfg.postprocessing.output_location, f"{RAW_SHAPE}_mouseF.csv"
        )
    )
    # 8 blobs seeded; the reference quirk drops the last → 7 rows
    assert len(df) == len(BLOBS_FRONT) + len(BLOBS_BACK) - 1


def test_registration_is_intensity_ncc_and_accurate(full_run):
    cfg, _, _ = full_run
    tr = np.load(
        os.path.join(
            cfg.atlas_alignment.output_location, "mouseF", "transform.npz"
        )
    )
    assert bytes(tr["mode"]).decode() == "intensity-ncc"
    # the estimated affine must be close to ground truth over the blob sites
    A_est = tr["affine"]
    A_true = gt_affine()
    pts = np.array([r[0] for r in _blob_gt()], np.float64)
    est = pts @ A_est[:, :3].T + A_est[:, 3]
    true = pts @ A_true[:, :3].T + A_true[:, 3]
    err = np.linalg.norm(est - true, axis=1)
    # measured on this fixture: mean ≈ 7.9, max ≈ 13.2 (the saturated blob
    # dots present in the acquisition but absent from the template perturb
    # NCC a little vs the blob-free prototype's 3.3/7.9). Band margins in
    # the annotation are ≥ 19.6 template voxels, so region assignment holds.
    assert err.mean() < 11.0, err
    assert err.max() < 16.0, err
    # the scale-honest frame (VERDICT r4 item 5): this fixture's GT affine
    # blows (23, 24, 24) up by ~(4.3, 5.0, 8.3)× into the template, so
    # template-vox errors overstate registration slack ~6×. Pulled back to
    # fixed voxels the same displacement must sit in the envelope the
    # Allen-scale probe (1.11) and mosaic phantom (1.27) establish —
    # scripts/probe_affine_e2e_gap.py measured CPU 0.62 / TPU 0.56 mean on
    # the blob-free pair (TPU ≤ CPU: no backend precision sensitivity).
    scale = np.array(
        [100.0 / DS_SHAPE[0], 120.0 / DS_SHAPE[1], 200.0 / DS_SHAPE[2]]
    )
    err_fixed = np.linalg.norm((est - true) / scale, axis=1)
    assert err_fixed.mean() < 2.0, err_fixed
    assert err_fixed.max() < 3.2, err_fixed
    # collection CSV self-identifies the same mode
    coll = os.path.join(
        cfg.atlas_alignment.collection_folder,
        "mouseF_local_registered_with_original_size.csv",
    )
    with open(coll) as f:
        assert f.readline().strip() == "# registration_mode: intensity-ncc"


def test_region_tables_match_ground_truth(full_run):
    """The science-level contract: per-region cell counts equal the known
    blob placement, through REAL intensity registration."""
    from delivr_cfos_tpu.analysis.ontology import parse_ontology_xml

    cfg, _, assets = full_run
    ontology_df = parse_ontology_xml(str(assets[4]))
    cells = pd.read_csv(
        os.path.join(cfg.region_assignment.output_location, "cells_mouseF.csv"),
        index_col=0,
    )
    expected = _expected_region_counts()
    assert len(cells) == sum(expected.values())
    # ann value v → stage-5 region row iloc v+1 (background offset quirk)
    for ann_val, n_expected in expected.items():
        acronym = ontology_df.iloc[ann_val + 1]["acronym"]
        assert (cells["acronym"] == acronym).sum() == n_expected, (
            ann_val,
            acronym,
            cells["acronym"].value_counts().to_dict(),
        )
    overview = pd.read_csv(
        os.path.join(
            cfg.region_assignment.output_location, "cells_overview_mouseF.csv"
        ),
        index_col=0,
    )
    assert overview["number"].sum() == sum(expected.values())


def test_hook_protocol_all_six(full_run, capsys):
    """Re-run on the finished tree: HOOK lines advertise 6 stages (the
    Fiji-driver contract) and stages 1-2 skip idempotently."""
    cfg, _, _ = full_run
    run_pipeline(cfg)
    out = capsys.readouterr().out
    assert "HOOK:OVERALL:6" in out
    assert "already processed, skipping..." in out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_run_bit_equal(full_run):
    """BASELINE config-5 shape: the same six-stage run with
    spatial_shards=4 + dcn_slices=2 must be BIT-equal in its science
    outputs (binaries, blob CSV, cells table) to the undistributed run."""
    cfg, tmp, (raw, weights, template_path, ann_path, ontology_path) = full_run
    cfg_d = _make_cfg(
        tmp, raw, "out_dist", weights, template_path, ann_path, ontology_path,
        spatial_shards=4, dcn_slices=2,
    )
    run_pipeline(cfg_d)

    a = np.load(
        os.path.join(
            cfg.blob_detection.output_location,
            "mouseF", "binary_segmentations", "binaries.npy",
        )
    )
    b = np.load(
        os.path.join(
            cfg_d.blob_detection.output_location,
            "mouseF", "binary_segmentations", "binaries.npy",
        )
    )
    np.testing.assert_array_equal(a, b)

    for rel in (
        os.path.join("03_postprocessing", "output", f"{RAW_SHAPE}_mouseF.csv"),
        os.path.join("05_region_assignment", "cells_mouseF.csv"),
    ):
        fa = os.path.join(tmp, "out", rel)
        fb = os.path.join(tmp, "out_dist", rel)
        with open(fa) as f:
            ca = f.read()
        with open(fb) as f:
            cb = f.read()
        assert ca == cb, rel
