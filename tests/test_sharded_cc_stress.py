"""Sharded device CC under stress (VERDICT r2 item 7): components spanning
many shard boundaries, pointer-jumping worst cases, and a randomized
equivalence run against the out-of-core host engine on a 256-plane volume.

The sharded labeler's pointer jumping resolves only shard-local references
(parallel/sharded_cc.py:54-61); information crossing k boundaries needs ≥ k
halo rounds. These tests construct exactly those shapes.
"""

import numpy as np
import pytest

import jax

from delivr_cfos_tpu.ops.connected_components import (
    component_statistics,
    label_out_of_core,
    label_volume_host,
)
from delivr_cfos_tpu.parallel.mesh import make_mesh
from delivr_cfos_tpu.parallel.sharded_cc import label_volume_sharded

pytestmark = [
    pytest.mark.slow,  # 8-device sharded CC stress shapes
    pytest.mark.skipif(
        jax.device_count() < 8, reason="needs 8 virtual devices"
    ),
]


def _assert_matches_host(vol, n_sp=8):
    mesh = make_mesh({"sp": n_sp})
    want_labels, want_n = label_volume_host(vol)
    got_labels, got_n = label_volume_sharded(mesh, vol)
    assert got_n == want_n
    np.testing.assert_array_equal(got_labels, want_labels)


def test_rod_spans_all_eight_shards():
    """One component crossing 7 shard boundaries (a full-z rod), plus a
    second rod crossing at an oblique 26-connected diagonal."""
    vol = np.zeros((64, 16, 16), np.uint8)  # 8 planes per shard on sp=8
    vol[:, 4, 4] = 1  # straight rod through every shard
    # diagonal staircase rod: moves one voxel in y and x per z step —
    # 26-connectivity keeps it one component across every boundary
    z = np.arange(64)
    vol[z, (2 + z) % 16, (1 + 2 * z) % 16] = 1
    _assert_matches_host(vol)


def test_snake_forces_many_halo_rounds():
    """Worst case for shard-local pointer jumping: a serpentine component
    that climbs through all shards in one column, crosses over, and comes
    back down in another — the global minimum label must propagate up and
    back down (≥ 2×7 boundary crossings)."""
    vol = np.zeros((64, 8, 12), np.uint8)
    vol[:, 4, 2] = 1  # up through all shards
    vol[63, 4, 2:10] = 1  # crossover at the far end
    vol[:, 4, 9] = 1  # back down through all shards
    # the raster-minimum voxel is at z=0 on the UP column; the DOWN column's
    # z=0 voxel learns it only after information travels 0→63→0
    _assert_matches_host(vol)


def test_comb_many_components_crossing_boundaries():
    """Many distinct components each crossing ≥ 3 boundaries — exercises
    label collisions in the halo min-exchange."""
    vol = np.zeros((64, 12, 32), np.uint8)
    for i, x in enumerate(range(0, 32, 2)):
        z0 = (i % 3) * 8
        vol[z0 : z0 + 40, 6, x] = 1  # 40-plane rods at staggered offsets
    _assert_matches_host(vol)


def test_randomized_equivalence_256_planes_vs_out_of_core(tmp_path):
    """Randomized dense-ish volume, 256 z-planes on an 8-way mesh, checked
    bit-identically against BOTH the host labeler and the two-pass
    out-of-core slab engine (slab cuts at 64 ≠ shard cuts at 32 — the two
    decompositions must agree exactly)."""
    rng = np.random.default_rng(42)
    vol = (rng.random((256, 24, 20)) > 0.72).astype(np.uint8)
    # add long-range structure: a few full-z rods stitching shards together
    for x in range(0, 20, 7):
        vol[:, 11, x] = 1

    mesh = make_mesh({"sp": 8})
    got_labels, got_n = label_volume_sharded(mesh, vol)

    want_labels, want_n = label_volume_host(vol)
    assert got_n == want_n
    np.testing.assert_array_equal(got_labels, want_labels)

    ooc_labels = np.lib.format.open_memmap(
        str(tmp_path / "labels.npy"), mode="w+", dtype=np.int32,
        shape=vol.shape,
    )
    ooc_n, ooc_stats = label_out_of_core(vol, ooc_labels, slab_planes=64)
    assert ooc_n == want_n
    np.testing.assert_array_equal(np.asarray(ooc_labels), want_labels)

    # statistics row-compatibility between engines
    stats = component_statistics(got_labels, got_n)
    np.testing.assert_array_equal(
        stats["voxel_counts"], ooc_stats["voxel_counts"]
    )
    np.testing.assert_allclose(
        stats["centroids"][1:], ooc_stats["centroids"][1:], atol=1e-6
    )


def test_sharded_labeler_rejects_int32_overflow_volumes():
    """Global labels are int32 linear voxel indices; a >=2^31-voxel volume
    must be rejected loudly, before any device transfer (sharded_cc.py)."""
    mesh = make_mesh({"sp": 8})
    huge = np.broadcast_to(np.zeros((1, 1, 1), np.uint8), (2048, 1024, 1024))
    with pytest.raises(ValueError, match="int32 global label space"):
        label_volume_sharded(mesh, huge)
