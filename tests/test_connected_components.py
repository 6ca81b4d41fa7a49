import numpy as np
import pytest
from scipy import ndimage

from delivr_cfos_tpu.ops.connected_components import (
    apply_remap,
    component_statistics,
    label_slabs_streaming,
    label_volume_device,
    label_volume_host,
)


def _random_blobs(shape=(40, 40, 40), density=0.08, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.uint8)
    n_seeds = int(np.prod(shape) * density / 30)
    for _ in range(max(n_seeds, 5)):
        c = rng.integers(3, np.array(shape) - 3)
        r = rng.integers(1, 4)
        zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
        ball = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 <= r**2
        vol[ball] = 1
    return vol


def test_host_labeling_is_26_connected():
    vol = np.zeros((4, 4, 4), np.uint8)
    vol[0, 0, 0] = 1
    vol[1, 1, 1] = 1  # diagonal touch = connected under 26-connectivity
    labels, n = label_volume_host(vol)
    assert n == 1
    vol[3, 3, 3] = 1  # isolated
    labels, n = label_volume_host(vol)
    assert n == 2


def test_device_matches_host_labeling():
    vol = _random_blobs(seed=1)
    lh, nh = label_volume_host(vol)
    ld, nd = label_volume_device(vol)
    assert nd == nh
    np.testing.assert_array_equal(ld, lh)


def test_device_matches_host_labeling_dense():
    """Dense noise → many touching components, exercises propagation depth."""
    rng = np.random.default_rng(2)
    vol = (rng.random((24, 24, 24)) > 0.6).astype(np.uint8)
    lh, nh = label_volume_host(vol)
    ld, nd = label_volume_device(vol)
    assert nd == nh
    np.testing.assert_array_equal(ld, lh)


def test_statistics_match_manual():
    vol = np.zeros((10, 10, 10), np.uint8)
    vol[1:3, 1:3, 1:3] = 1  # 8 voxels, centroid (1.5, 1.5, 1.5)
    vol[7, 7, 7] = 1  # 1 voxel
    labels, n = label_volume_host(vol)
    stats = component_statistics(labels, n)
    assert n == 2
    assert stats["voxel_counts"][1] == 8
    assert stats["voxel_counts"][2] == 1
    np.testing.assert_allclose(stats["centroids"][1], [1.5, 1.5, 1.5])
    np.testing.assert_allclose(stats["centroids"][2], [7, 7, 7])
    np.testing.assert_array_equal(stats["bounding_boxes"][1], [1, 2, 1, 2, 1, 2])


def test_statistics_match_scipy_reference():
    vol = _random_blobs(seed=3)
    labels, n = label_volume_host(vol)
    stats = component_statistics(labels, n)
    # cross-check against scipy's own measurements
    idx = np.arange(1, n + 1)
    counts_ref = ndimage.sum_labels(np.ones_like(labels), labels, idx)
    np.testing.assert_array_equal(stats["voxel_counts"][1:], counts_ref)
    cent_ref = np.array(ndimage.center_of_mass(vol, labels, idx))
    np.testing.assert_allclose(stats["centroids"][1:], cent_ref)


@pytest.mark.parametrize("slab_z", [5, 8, 13])
def test_slab_streaming_equals_global(slab_z):
    vol = _random_blobs(shape=(37, 30, 30), seed=4)
    gl, gn = label_volume_host(vol)

    def slabs():
        for z0 in range(0, vol.shape[0], slab_z):
            yield z0, vol[z0 : z0 + slab_z]

    slab_list, remap, n = label_slabs_streaming(slabs())
    assert n == gn
    merged = np.concatenate(
        [apply_remap(glob, remap) for _, glob in slab_list], axis=0
    )
    # same partition: sizes per label must match, and voxel-wise equal after
    # canonical numbering (both raster-first ordered)
    np.testing.assert_array_equal(merged, gl)


def test_empty_volume():
    vol = np.zeros((8, 8, 8), np.uint8)
    labels, n = label_volume_host(vol)
    assert n == 0
    stats = component_statistics(labels, n)
    assert stats["voxel_counts"].shape == (1,)
    ld, nd = label_volume_device(vol)
    assert nd == 0


# --------------------------------------------------------------------------
# multi-chip CC (parallel/sharded_cc.py)
# --------------------------------------------------------------------------


def _blobs_and_rod(shape=(70, 24, 24), seed=11):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.uint8)
    for _ in range(40):
        z, y, x = (rng.integers(0, s) for s in shape)
        dz, dy, dx = rng.integers(1, 5, 3)
        vol[z : z + dz, y : y + dy, x : x + dx] = 1
    vol[:, 12, 12] = 1  # rod crossing every shard boundary
    return vol


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_sharded_cc_matches_host(n_sp):
    import jax
    from delivr_cfos_tpu.parallel.mesh import make_mesh
    from delivr_cfos_tpu.parallel.sharded_cc import label_volume_sharded

    if len(jax.devices()) < n_sp:
        pytest.skip("not enough devices")
    vol = _blobs_and_rod()
    ref_labels, ref_n = label_volume_host(vol)
    mesh = make_mesh({"sp": n_sp})
    got_labels, got_n = label_volume_sharded(mesh, vol)
    assert got_n == ref_n
    np.testing.assert_array_equal(got_labels, ref_labels)


def test_sharded_cc_empty_and_full():
    import jax
    from delivr_cfos_tpu.parallel.mesh import make_mesh
    from delivr_cfos_tpu.parallel.sharded_cc import label_volume_sharded

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = make_mesh({"sp": 4})
    empty = np.zeros((17, 8, 8), np.uint8)  # non-divisible z
    labels, n = label_volume_sharded(mesh, empty)
    assert n == 0 and labels.max() == 0
    full = np.ones((17, 8, 8), np.uint8)
    labels, n = label_volume_sharded(mesh, full)
    assert n == 1 and (labels == 1).all()


def test_device_labeler_rejects_int32_overflow_volumes():
    """Device labels are int32 linear voxel indices; a >=2^31-voxel volume
    must be rejected loudly, before any device transfer."""
    from delivr_cfos_tpu.ops.connected_components import label_volume_device

    huge = np.broadcast_to(np.zeros((1, 1, 1), np.uint8), (2048, 1024, 1024))
    with pytest.raises(ValueError, match="int32 label space"):
        label_volume_device(huge)
