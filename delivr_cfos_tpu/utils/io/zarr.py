"""Minimal zarr v2 directory-store codec (from scratch — the zarr package
is not a dependency).

The rebuild's I/O contract includes chunked zarr volumes (BASELINE config 2:
"blockwise inference ... over a multi-chunk zarr volume"): light-sheet
acquisitions are increasingly written as zarr chunk trees rather than TIFF
stacks. This implements the v2 spec subset those stores use:

- ``.zarray`` JSON metadata (shape, chunks, dtype, order 'C', fill_value);
- chunk files named ``i.j.k`` (``dimension_separator`` '.' or '/');
- compressors: none, zlib, gzip, blosc-wrapped-zlib is NOT supported
  (documented; numcodecs is unavailable in this environment).

``ZarrVolume`` exposes the arraylike protocol the streaming engine uses
(``shape``, ``dtype``, ``__getitem__`` with slices), reading only the
chunks a slice touches — so a z-slab read stays O(slab), never O(volume).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np

_SUPPORTED_COMPRESSORS = (None, "zlib", "gzip")


def _decode_dtype(s):
    return np.dtype(s)


def _compressor_id(comp: dict | None):
    if comp is None:
        return None
    cid = comp.get("id")
    if cid not in ("zlib", "gzip"):
        raise NotImplementedError(
            f"zarr compressor {cid!r} not supported (only none/zlib/gzip)"
        )
    return cid


class ZarrVolume:
    """Read-only arraylike over a zarr v2 array directory."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, ".zarray")) as f:
            meta = json.load(f)
        if meta.get("zarr_format") != 2:
            raise ValueError("only zarr v2 arrays are supported")
        if meta.get("order", "C") != "C":
            raise NotImplementedError("only C-order zarr arrays")
        if meta.get("filters"):
            raise NotImplementedError("zarr filters not supported")
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"])
        self.dtype = _decode_dtype(meta["dtype"])
        self.fill_value = meta.get("fill_value", 0)
        self._comp = _compressor_id(meta.get("compressor"))
        self._sep = meta.get("dimension_separator", ".")
        self.ndim = len(self.shape)

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * self.dtype.itemsize

    def _chunk_path(self, idx) -> str:
        name = self._sep.join(str(i) for i in idx)
        return os.path.join(self.path, name)

    def _read_chunk(self, idx) -> np.ndarray:
        p = self._chunk_path(idx)
        shape = self.chunks
        if not os.path.exists(p):
            fill = 0 if self.fill_value is None else self.fill_value
            return np.full(shape, fill, self.dtype)
        with open(p, "rb") as f:
            raw = f.read()
        if self._comp in ("zlib", "gzip"):
            raw = zlib.decompress(raw, zlib.MAX_WBITS | 32 if self._comp == "gzip" else zlib.MAX_WBITS)
        return np.frombuffer(raw, self.dtype).reshape(shape)

    def __getitem__(self, key) -> np.ndarray:
        if not isinstance(key, tuple):
            key = (key,)
        key = key + (slice(None),) * (self.ndim - len(key))
        bounds = []
        squeeze = []
        for ax, k in enumerate(key):
            n = self.shape[ax]
            if isinstance(k, slice):
                start, stop, step = k.indices(n)
                if step != 1:
                    raise NotImplementedError("strided zarr reads")
                bounds.append((start, stop))
            else:
                i = int(k)
                if i < 0:
                    i += n
                bounds.append((i, i + 1))
                squeeze.append(ax)
        out_shape = tuple(hi - lo for lo, hi in bounds)
        out = np.empty(out_shape, self.dtype)
        ranges = [
            range(lo // c, -(-hi // c) if hi > lo else lo // c)
            for (lo, hi), c in zip(bounds, self.chunks)
        ]

        def rec(ax, idx):
            if ax == self.ndim:
                chunk = self._read_chunk(idx)
                src = []
                dst = []
                for a, (ci, (lo, hi), c) in enumerate(
                    zip(idx, bounds, self.chunks)
                ):
                    c0 = ci * c
                    s_lo = max(lo, c0) - c0
                    s_hi = min(hi, c0 + c) - c0
                    src.append(slice(s_lo, s_hi))
                    dst.append(slice(c0 + s_lo - lo, c0 + s_hi - lo))
                out[tuple(dst)] = chunk[tuple(src)]
                return
            for ci in ranges[ax]:
                rec(ax + 1, idx + (ci,))

        rec(0, ())
        if squeeze:
            out = out.reshape(
                tuple(
                    s
                    for ax, s in enumerate(out_shape)
                    if ax not in squeeze
                )
            )
        return out

    def __array__(self, dtype=None):
        full = self[tuple(slice(0, s) for s in self.shape)]
        return full.astype(dtype) if dtype is not None else full


def write_zarr(
    path: str,
    array: np.ndarray,
    chunks: tuple | None = None,
    compressor: str | None = "zlib",
    dimension_separator: str = ".",
) -> str:
    """Write an ndarray as a zarr v2 directory store."""
    if compressor not in _SUPPORTED_COMPRESSORS:
        raise NotImplementedError(f"compressor {compressor!r}")
    array = np.ascontiguousarray(array)
    if chunks is None:
        chunks = tuple(min(s, 64) for s in array.shape)
    os.makedirs(path, exist_ok=True)
    comp_meta = {"id": compressor, "level": 1} if compressor else None
    meta = {
        "zarr_format": 2,
        "shape": list(array.shape),
        "chunks": list(chunks),
        "dtype": array.dtype.str,
        "compressor": comp_meta,
        "fill_value": 0,
        "order": "C",
        "filters": None,
        "dimension_separator": dimension_separator,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    grid = [range(-(-s // c)) for s, c in zip(array.shape, chunks)]

    def rec(ax, idx):
        if ax == array.ndim:
            sel = tuple(
                slice(ci * c, min((ci + 1) * c, s))
                for ci, c, s in zip(idx, chunks, array.shape)
            )
            block = array[sel]
            if block.shape != tuple(chunks):
                pad = [(0, c - bs) for c, bs in zip(chunks, block.shape)]
                block = np.pad(block, pad)
            raw = block.tobytes()
            if compressor == "gzip":
                # true gzip framing so external numcodecs GZip readers can
                # decode the chunks (zlib framing under a 'gzip' id would
                # break interop; our own reader auto-detects either)
                co = zlib.compressobj(1, zlib.DEFLATED, zlib.MAX_WBITS | 16)
                raw = co.compress(raw) + co.flush()
            elif compressor:
                raw = zlib.compress(raw, 1)
            name = dimension_separator.join(str(i) for i in idx)
            chunk_path = os.path.join(path, name)
            if dimension_separator == "/":
                os.makedirs(os.path.dirname(chunk_path), exist_ok=True)
            with open(chunk_path, "wb") as f:
                f.write(raw)
            return
        for ci in grid[ax]:
            rec(ax + 1, idx + (ci,))

    rec(0, ())
    return path
