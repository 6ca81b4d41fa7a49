"""Stage 3 — connected-component blob extraction → per-cell CSV.

Rebuild of ``count_blobs`` (reference: count_blobs.py:36-118) with the cc3d
C++ dependency replaced by the in-framework engines (native C++ union-find
when available, scipy fallback; see ops/connected_components.py and
native/cc_label.cpp).

Output contract (bit-compatible with the reference):

    {post_output}/{brain}-{N}-cc3d.npy      cached labels
    {post_output}/{brain}-stats.pickle      cached statistics dict
    {post_output}/(Z, Y, X)_{brain}.csv     per-blob table

CSV quirks reproduced exactly:
- the filename embeds ``str(bin_img.shape)`` of the real (z, y, x) stack;
- columns are index,Blob,Coords,Size where Coords is the Python repr of the
  centroid [z, y, x] list and the pandas index is 0 on every row (the
  reference row-appends single-row frames, count_blobs.py:104-110);
- the loop runs ``range(1, N)`` — the last component N is dropped
  (reference bug, count_blobs.py:104); kept for table parity.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.native.cc import cc_label_native, cc_statistics_native
from delivr_cfos_tpu.ops.connected_components import (
    component_statistics,
    label_volume_host,
)
from delivr_cfos_tpu.utils.io.npy import memmap_raw
from delivr_cfos_tpu.utils.logging import log


def _load_cached_labels(path_out: str, brain: str):
    for item in (x for x in os.listdir(path_out) if x.endswith(".npy")):
        if brain in item and "-cc3d" in item:
            n = int(item.split("-")[-2]) if item.count("-") >= 2 else None
            try:
                n = int(item.rsplit("-", 2)[-2])
            except ValueError:
                continue
            return np.load(os.path.join(path_out, item)), n
    return None


def _load_cached_stats(path_out: str, brain: str):
    for item in (x for x in os.listdir(path_out) if x.endswith(".pickle")):
        if brain in item:
            with open(os.path.join(path_out, item), "rb") as f:
                return pickle.load(f)
    return None


def count_blobs(
    cfg: PipelineConfig,
    path_in: str,
    brain_i: int,
    brain: str,
    stack_shape: tuple,
    min_size: int = -1,
    max_size: int = -1,
) -> str:
    path_out = cfg.postprocessing.output_location
    os.makedirs(path_out, exist_ok=True)

    brain_path = os.path.join(path_in, brain, "binary_segmentations", "binaries.npy")
    bin_img = memmap_raw(brain_path, shape=stack_shape[2:], dtype=np.uint8)

    cached = _load_cached_labels(path_out, brain)
    if cached is None:
        log("Labeling connected components", brain)
        vol = np.asarray(bin_img)
        native = cc_label_native(vol)
        if native is not None:
            labels, n = native
        else:
            labels, n = label_volume_host(vol)
        np.save(os.path.join(path_out, f"{brain}-{n}-cc3d.npy"), labels)
    else:
        labels, n = cached
        log("Cached labels found", brain, n)

    stats = _load_cached_stats(path_out, brain)
    if stats is None:
        stats = cc_statistics_native(labels, n) or component_statistics(labels, n)
        with open(os.path.join(path_out, f"{brain}-stats.pickle"), "wb") as f:
            pickle.dump(stats, f, protocol=pickle.HIGHEST_PROTOCOL)

    # vectorized table build (the reference's per-row pd.concat is O(N²),
    # count_blobs.py:104-110); same rows, same dropped-last-blob quirk
    idx = np.arange(1, n) if n > 0 else np.array([], np.int64)
    # .tolist() → plain Python floats, so str(list) reprs match the reference
    coords = [np.asarray(stats["centroids"][i]).tolist() for i in idx]
    df = pd.DataFrame(
        {
            "Blob": idx,
            "Coords": coords,
            "Size": stats["voxel_counts"][idx] if n > 0 else [],
        },
        index=np.zeros(len(idx), np.int64),
    )
    output_name = f"{tuple(bin_img.shape)}_{brain.replace('.nii.gz', '')}.csv"
    out_path = path_out + output_name
    df.to_csv(out_path)
    log("Blob counting done", brain, f"{max(n - 1, 0)} blobs written")
    return out_path
