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
    component_statistics_streaming,
    label_out_of_core,
    label_volume_host,
)
from delivr_cfos_tpu.utils.io.npy import memmap_raw, open_memmap
from delivr_cfos_tpu.utils.logging import log


def _load_cached_labels(path_out: str, brain: str):
    for item in (x for x in os.listdir(path_out) if x.endswith(".npy")):
        if brain in item and "-cc3d" in item:
            try:
                n = int(item.rsplit("-", 2)[-2])
            except ValueError:
                continue
            # memmapped: stage 3 only needs the stats; stage 6 streams planes
            return np.load(os.path.join(path_out, item), mmap_mode="r"), n
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

    load_all_ram = cfg.FLAGS.LOAD_ALL_RAM
    stats = None
    cached = _load_cached_labels(path_out, brain)
    if cached is None:
        log("Labeling connected components", brain)
        cc_workers = cfg.postprocessing.cc_workers
        if load_all_ram and cc_workers <= 1:
            # in-RAM path (reference default: cc3d without out_file,
            # count_blobs.py:59-62)
            vol = np.asarray(bin_img)
            native = cc_label_native(vol)
            if native is not None:
                labels, n = native
            else:
                labels, n = label_volume_host(vol)
            np.save(os.path.join(path_out, f"{brain}-{n}-cc3d.npy"), labels)
        elif load_all_ram:
            # in-RAM + cc_workers>1: slab-parallel labeling into an in-RAM
            # label array — bit-identical to the whole-volume engines
            # (canonical first-raster order), but the per-slab native sweeps
            # fan out across host cores
            vol = np.asarray(bin_img)
            labels = np.empty(vol.shape, np.int32)
            n, stats = label_out_of_core(vol, labels, workers=cc_workers)
            np.save(os.path.join(path_out, f"{brain}-{n}-cc3d.npy"), labels)
        else:
            # out-of-core path (reference: cc3d out_file= disk labeling for
            # RAM < 2× dataset, count_blobs.py:63-64): slab-streamed labeling
            # straight into the cache memmap; N is only known at the end, so
            # label into a temp name and rename into the cache contract
            tmp_path = os.path.join(path_out, f"{brain}-inprogress-cc3d.npy")
            labels_mm = open_memmap(tmp_path, shape=bin_img.shape, dtype=np.int32)
            n, stats = label_out_of_core(bin_img, labels_mm, workers=cc_workers)
            labels_mm.flush()
            del labels_mm
            final_path = os.path.join(path_out, f"{brain}-{n}-cc3d.npy")
            os.replace(tmp_path, final_path)
            labels = np.load(final_path, mmap_mode="r")
    else:
        labels, n = cached
        log("Cached labels found", brain, n)

    if stats is None:
        stats = _load_cached_stats(path_out, brain)
    if stats is None:
        if load_all_ram:
            lab_arr = np.asarray(labels)
            stats = cc_statistics_native(lab_arr, n) or component_statistics(
                lab_arr, n
            )
        else:
            stats = component_statistics_streaming(labels, n)
    stats_path = os.path.join(path_out, f"{brain}-stats.pickle")
    if not os.path.exists(stats_path):
        with open(stats_path, "wb") as f:
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
