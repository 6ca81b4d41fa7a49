"""Out-of-core labeling at production scale: past the int32 voxel-index space.

VERDICT r4 item 6: ``label_volume_device`` refuses volumes with >= 2**31
voxels (its labels ARE int32 linear indices) and points at
``label_out_of_core`` — which is therefore THE production stage-3 path for a
real hemisphere (reference handles this via cc3d's ``out_file=`` disk
labeling, count_blobs.py:59-64). This test proves that path actually works
past the guard: a (1300, 1300, 1300) = 2.197e9-voxel (> 2**31) mostly-zero
disk memmap with a few hundred seeded 3x3x3 blobs — some deliberately
straddling every slab boundary — is labeled out-of-core and checked against
the seeded ground truth (count, per-blob voxel counts, exact centroids,
canonical raster ordering), with peak RSS bounded far below the 11 GB the
volume + label field would need in RAM.

The heavy lifting runs in a fresh subprocess so ``ru_maxrss`` measures THIS
workload, not the pytest session.
"""

import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~2.2 GVox through the labeler, minutes-scale

_CHILD = r"""
import json, sys, threading, time
import numpy as np

from delivr_cfos_tpu.ops.connected_components import (
    component_statistics_streaming,
    label_out_of_core,
)

# peak ANONYMOUS memory, sampled from /proc/self/status. ru_maxrss is the
# wrong metric here: resident FILE-BACKED memmap pages count toward it, and
# on a big-RAM host with no memory pressure the kernel happily keeps all
# ~11 GB of binary+labels pages resident (measured 11.6 GB maxrss while the
# algorithm's own allocations stayed ~2 GB). File pages are reclaimable
# under pressure by definition; the out-of-core contract is about the
# anonymous working set.
_peak_anon = [0.0]


def _watch_anon():
    while True:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("RssAnon:"):
                    _peak_anon[0] = max(
                        _peak_anon[0], int(line.split()[1]) / 1024.0
                    )
                    break
        time.sleep(0.05)


threading.Thread(target=_watch_anon, daemon=True).start()

tmp = sys.argv[1]
SHAPE = (1300, 1300, 1300)          # 2.197e9 voxels > 2**31 = 2.147e9
SLAB = 64
assert np.prod(SHAPE) >= 2**31 + 1

# --- seeded ground truth: 3x3x3 blobs, pairwise 26-disconnected ------------
# disconnect criterion for two size-3 boxes: some axis with |d(corner)| >= 4
rng = np.random.default_rng(42)
corners = []
def ok(c):
    for p in corners:
        if not any(abs(int(c[a]) - int(p[a])) >= 4 for a in range(3)):
            return False
    return True

# blobs straddling EVERY slab boundary (z0 = 64k-1 spans planes 64k-1..64k+1)
for k in range(1, SHAPE[0] // SLAB):
    while True:
        c = (SLAB * k - 1, int(rng.integers(0, SHAPE[1] - 3)),
             int(rng.integers(0, SHAPE[2] - 3)))
        if ok(c):
            corners.append(c)
            break
# plus random blobs anywhere
while len(corners) < 300:
    c = tuple(int(v) for v in rng.integers((0, 0, 0), np.array(SHAPE) - 3))
    if ok(c):
        corners.append(c)

binary = np.memmap(tmp + "/binary.u8", np.uint8, "w+", shape=SHAPE)
for (z, y, x) in corners:
    binary[z:z+3, y:y+3, x:x+3] = 1
binary.flush()

labels = np.memmap(tmp + "/labels.i32", np.int32, "w+", shape=SHAPE)
n, stats = label_out_of_core(binary, labels, slab_planes=SLAB, workers=2)
labels.flush()

# canonical numbering = first raster appearance = corner raster order
order = sorted(corners)
counts = np.asarray(stats["voxel_counts"])
cents = np.asarray(stats["centroids"])
checks = {
    "n": n,
    "n_expected": len(corners),
    "counts_all_27": bool((counts[1:] == 27).all()),
    "bg_count_ok": bool(
        int(counts[0]) == int(np.prod(SHAPE)) - 27 * len(corners)
    ),
    "centroids_exact": bool(
        np.array_equal(
            cents[1:], np.asarray(order, np.float64) + 1.0
        )
    ),
}

# an independent streaming stats pass over the on-disk label field must agree
s2 = component_statistics_streaming(labels, n, slab_planes=SLAB)
checks["streaming_stats_agree"] = bool(
    np.array_equal(np.asarray(s2["voxel_counts"]), counts)
    and np.allclose(np.asarray(s2["centroids"])[1:], cents[1:])
)

# spot-check the label field itself at a few straddling blobs
for (z, y, x) in corners[:5]:
    blk = np.asarray(labels[z:z+3, y:y+3, x:x+3])
    checks.setdefault("straddlers_single_label", True)
    if not (blk > 0).all() or np.unique(blk).size != 1:
        checks["straddlers_single_label"] = False

checks["peak_anon_mb"] = _peak_anon[0]
print(json.dumps(checks))
"""


def test_label_out_of_core_past_int32_guard(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    checks = json.loads(proc.stdout.strip().splitlines()[-1])
    assert checks["n"] == checks["n_expected"] == 300
    assert checks["counts_all_27"]
    assert checks["bg_count_ok"]
    assert checks["centroids_exact"]
    assert checks["streaming_stats_agree"]
    assert checks["straddlers_single_label"]
    # the whole point of out-of-core: 2.2 GB volume + 8.8 GB labels never
    # co-resident — bound the peak ANONYMOUS working set well below the
    # 11 GB in-RAM footprint (slab look-ahead with workers=2 keeps <= 3
    # slabs in flight; file-backed memmap pages are excluded — the kernel
    # keeps them resident on a big-RAM host but reclaims them under
    # pressure, see the child's RssAnon rationale)
    assert checks["peak_anon_mb"] < 4500, (
        f"peak anon {checks['peak_anon_mb']:.0f} MB"
    )
