"""Out-of-core connected components (VERDICT r1 item 4).

The out-of-core labeler must produce labels and statistics identical to the
whole-volume engines (reference contract: cc3d out_file= disk labeling,
count_blobs.py:59-64), and stage 3 under LOAD_ALL_RAM=False must emit the
same CSV/caches as the in-RAM path without materializing the volume.
"""

import os
import pickle

import numpy as np
import pytest

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.ops.connected_components import (
    component_statistics,
    component_statistics_streaming,
    label_out_of_core,
    label_volume_host,
)


def _blobby_volume(shape=(70, 40, 40), n_seeds=60, seed=0):
    """Random blobs, several spanning slab boundaries."""
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.uint8)
    for _ in range(n_seeds):
        z, y, x = (rng.integers(0, s) for s in shape)
        dz, dy, dx = rng.integers(1, 6, 3)
        vol[z : z + dz, y : y + dy, x : x + dx] = 1
    # one long rod crossing many z-slabs
    vol[:, 20, 20] = 1
    return vol


@pytest.mark.parametrize("slab_planes", [7, 16, 64, 200])
def test_label_out_of_core_matches_host(slab_planes):
    vol = _blobby_volume()
    ref_labels, ref_n = label_volume_host(vol)
    ref_stats = component_statistics(ref_labels, ref_n)

    labels_out = np.zeros(vol.shape, np.int32)
    n, stats = label_out_of_core(
        vol, labels_out, slab_planes=slab_planes, label_fn=label_volume_host
    )
    assert n == ref_n
    np.testing.assert_array_equal(labels_out, ref_labels)
    np.testing.assert_array_equal(stats["voxel_counts"], ref_stats["voxel_counts"])
    np.testing.assert_allclose(stats["centroids"], ref_stats["centroids"])
    np.testing.assert_array_equal(
        stats["bounding_boxes"], ref_stats["bounding_boxes"]
    )


def test_label_out_of_core_parallel_bit_identical():
    """workers>1 fans the per-slab labeling over a thread pool; base
    assignment / face unions / stats merging stay ordered on the caller's
    thread, so labels AND stats must be bit-identical to the serial path."""
    vol = _blobby_volume(shape=(90, 40, 40), n_seeds=120, seed=8)
    ser = np.zeros(vol.shape, np.int32)
    n_ser, st_ser = label_out_of_core(vol, ser, slab_planes=7, workers=1)
    par = np.zeros(vol.shape, np.int32)
    n_par, st_par = label_out_of_core(vol, par, slab_planes=7, workers=4)
    assert n_par == n_ser
    np.testing.assert_array_equal(par, ser)
    np.testing.assert_array_equal(
        st_par["voxel_counts"], st_ser["voxel_counts"]
    )
    np.testing.assert_array_equal(st_par["centroids"], st_ser["centroids"])
    np.testing.assert_array_equal(
        st_par["bounding_boxes"], st_ser["bounding_boxes"]
    )


def test_label_out_of_core_worker_error_propagates():
    """A label_fn failure on a worker thread must surface on the caller."""

    def boom(vol):
        raise RuntimeError("label_fn failed")

    vol = _blobby_volume(shape=(40, 24, 24), seed=9)
    with pytest.raises(RuntimeError, match="label_fn failed"):
        label_out_of_core(
            vol, np.zeros(vol.shape, np.int32), slab_planes=8,
            label_fn=boom, workers=3,
        )


def test_label_out_of_core_empty_volume():
    vol = np.zeros((20, 10, 10), np.uint8)
    labels_out = np.zeros(vol.shape, np.int32)
    n, stats = label_out_of_core(vol, labels_out, slab_planes=8)
    assert n == 0
    assert labels_out.max() == 0
    assert stats["voxel_counts"][0] == vol.size


def test_component_statistics_streaming_matches():
    vol = _blobby_volume(seed=3)
    labels, n = label_volume_host(vol)
    ref = component_statistics(labels, n)
    st = component_statistics_streaming(labels, n, slab_planes=9)
    np.testing.assert_array_equal(st["voxel_counts"], ref["voxel_counts"])
    np.testing.assert_allclose(st["centroids"], ref["centroids"])
    np.testing.assert_array_equal(st["bounding_boxes"], ref["bounding_boxes"])


def test_stage03_out_of_core_matches_in_ram(tmp_path):
    from delivr_cfos_tpu.pipeline.stage03_count_blobs import count_blobs

    vol = _blobby_volume(shape=(60, 32, 32), seed=5)

    def run(load_all_ram, root, cc_workers=0):
        blob_root = str(root / "blob")
        post_root = str(root / "post") + os.sep
        seg_dir = os.path.join(blob_root, "mouse", "binary_segmentations")
        os.makedirs(seg_dir, exist_ok=True)
        mm = np.lib.format.open_memmap(
            os.path.join(seg_dir, "binaries.npy"),
            mode="w+",
            dtype=np.uint8,
            shape=vol.shape,
        )
        mm[:] = vol
        mm.flush()
        del mm
        cfg = PipelineConfig.from_dict(
            {
                "postprocessing": {
                    "output_location": post_root,
                    "cc_workers": cc_workers,
                },
                "FLAGS": {"ABSPATHS": True, "LOAD_ALL_RAM": load_all_ram},
            }
        )
        csv_path = count_blobs(
            cfg, blob_root, 0, "mouse", (1, 1, *vol.shape)
        )
        with open(csv_path) as f:
            csv_text = f.read()
        stats_pickle = os.path.join(post_root, "mouse-stats.pickle")
        with open(stats_pickle, "rb") as f:
            stats = pickle.load(f)
        label_files = [
            f for f in os.listdir(post_root) if f.endswith("-cc3d.npy")
        ]
        assert len(label_files) == 1
        labels = np.load(os.path.join(post_root, label_files[0]))
        return csv_text, stats, labels, label_files[0]

    csv_ram, stats_ram, labels_ram, name_ram = run(True, tmp_path / "ram")
    csv_ooc, stats_ooc, labels_ooc, name_ooc = run(False, tmp_path / "ooc")
    # in-RAM + cc_workers>1 routes through the slab-parallel labeler; the
    # whole contract (CSV text, cache name, labels, stats) must not move
    csv_par, stats_par, labels_par, name_par = run(
        True, tmp_path / "par", cc_workers=3
    )

    assert csv_ooc == csv_ram
    assert name_ooc == name_ram
    np.testing.assert_array_equal(labels_ooc, labels_ram)
    np.testing.assert_array_equal(
        stats_ooc["voxel_counts"], stats_ram["voxel_counts"]
    )
    np.testing.assert_allclose(stats_ooc["centroids"], stats_ram["centroids"])

    assert csv_par == csv_ram
    assert name_par == name_ram
    np.testing.assert_array_equal(labels_par, labels_ram)
    np.testing.assert_array_equal(
        stats_par["voxel_counts"], stats_ram["voxel_counts"]
    )
    np.testing.assert_allclose(stats_par["centroids"], stats_ram["centroids"])
