import numpy as np
import pytest

from delivr_cfos_tpu.native import (
    cc_label_native,
    cc_statistics_native,
    native_available,
)
from delivr_cfos_tpu.ops.connected_components import (
    component_statistics,
    label_volume_host,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def test_native_labeling_matches_scipy():
    rng = np.random.default_rng(0)
    vol = (rng.random((30, 40, 25)) > 0.55).astype(np.uint8)
    ln, nn = cc_label_native(vol)
    lh, nh = label_volume_host(vol)
    assert nn == nh
    np.testing.assert_array_equal(ln, lh)


def test_native_labeling_sparse_blobs():
    rng = np.random.default_rng(1)
    vol = (rng.random((50, 50, 50)) > 0.97).astype(np.uint8)
    ln, nn = cc_label_native(vol)
    lh, nh = label_volume_host(vol)
    assert nn == nh
    np.testing.assert_array_equal(ln, lh)


def test_native_statistics_match_numpy():
    rng = np.random.default_rng(2)
    vol = (rng.random((20, 20, 20)) > 0.6).astype(np.uint8)
    labels, n = cc_label_native(vol)
    ours = cc_statistics_native(labels, n)
    ref = component_statistics(labels, n)
    np.testing.assert_array_equal(ours["voxel_counts"], ref["voxel_counts"])
    np.testing.assert_allclose(
        ours["centroids"][1:], ref["centroids"][1:], rtol=1e-12
    )
    np.testing.assert_array_equal(
        ours["bounding_boxes"][1:], ref["bounding_boxes"][1:]
    )


def test_native_empty():
    vol = np.zeros((5, 5, 5), np.uint8)
    labels, n = cc_label_native(vol)
    assert n == 0
    assert labels.max() == 0
