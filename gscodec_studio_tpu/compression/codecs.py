"""Per-attribute codec functions shared by the PNG / ANS / HEVC pipelines
(the pluggable registry pattern of the reference,
entropy_coding_compression.py:53-99 + png_compression.py per-attr fns).

Every codec is a pair ``compress(dir, name, grid_array, meta_kw) -> meta`` /
``decompress(dir, name, meta) -> grid_array`` operating on [side, side, C]
float arrays (the PLAS-sorted grid layout).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from gscodec_studio_tpu.compression_sim.ops import (
    log_transform,
    inverse_log_transform,
)


def _imwrite(path: str, arr: np.ndarray):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def _split_channels(arr: np.ndarray):
    """Split [H, W, C] into PNG-codable chunks of <= 4 channels
    (1/3/4 channels map to L/RGB/RGBA)."""
    C = arr.shape[-1]
    chunks, i = [], 0
    while i < C:
        take = 4 if C - i == 4 else min(3, C - i) if C - i != 2 else 1
        chunks.append(arr[..., i : i + take])
        i += take
    return chunks


def compress_png(compress_dir, name, grid, n_bits=8) -> Dict:
    """k-bit min/max-normalized PNG (png_compression.py:237-278)."""
    grid = np.asarray(grid, np.float32)
    mins = grid.reshape(-1, grid.shape[-1]).min(0)
    maxs = grid.reshape(-1, grid.shape[-1]).max(0)
    scale = np.where(maxs > mins, maxs - mins, 1.0)
    norm = (grid - mins) / scale
    q = np.round(norm * (2**n_bits - 1)).astype(
        np.uint8 if n_bits <= 8 else np.uint16
    )
    files = []
    for i, chunk in enumerate(_split_channels(q)):
        fn = f"{name}_{i}.png"
        _imwrite(os.path.join(compress_dir, fn), np.squeeze(chunk, -1) if chunk.shape[-1] == 1 else chunk)
        files.append(fn)
    return {
        "kind": "png", "files": files, "shape": list(grid.shape),
        "mins": mins.tolist(), "maxs": maxs.tolist(), "n_bits": n_bits,
    }


def decompress_png(compress_dir, name, meta) -> np.ndarray:
    parts = []
    for fn in meta["files"]:
        a = _imread(os.path.join(compress_dir, fn))
        if a.ndim == 2:
            a = a[..., None]
        parts.append(a)
    q = np.concatenate(parts, axis=-1).astype(np.float32)
    norm = q / (2 ** meta["n_bits"] - 1)
    mins = np.asarray(meta["mins"], np.float32)
    maxs = np.asarray(meta["maxs"], np.float32)
    scale = np.where(maxs > mins, maxs - mins, 1.0)
    return (norm * scale + mins).reshape(meta["shape"])


def compress_png_16bit(compress_dir, name, grid, log_space=True) -> Dict:
    """16-bit split into upper/lower 8-bit PNGs, optionally in
    sign-log space — the means codec (png_compression.py:312-357)."""
    grid = np.asarray(grid, np.float32)
    if log_space:
        grid = np.asarray(log_transform(grid))
    mins = grid.reshape(-1, grid.shape[-1]).min(0)
    maxs = grid.reshape(-1, grid.shape[-1]).max(0)
    scale = np.where(maxs > mins, maxs - mins, 1.0)
    q = np.round((grid - mins) / scale * 65535.0).astype(np.uint16)
    upper = (q >> 8).astype(np.uint8)
    lower = (q & 0xFF).astype(np.uint8)
    files = []
    for tag, img in (("u", upper), ("l", lower)):
        for i, chunk in enumerate(_split_channels(img)):
            fn = f"{name}_{tag}{i}.png"
            _imwrite(os.path.join(compress_dir, fn),
                     np.squeeze(chunk, -1) if chunk.shape[-1] == 1 else chunk)
            files.append(fn)
    return {
        "kind": "png16", "files": files, "shape": list(grid.shape),
        "mins": mins.tolist(), "maxs": maxs.tolist(), "log_space": log_space,
    }


def decompress_png_16bit(compress_dir, name, meta) -> np.ndarray:
    n = len(meta["files"]) // 2
    ups, los = [], []
    for fn in meta["files"][:n]:
        a = _imread(os.path.join(compress_dir, fn))
        ups.append(a[..., None] if a.ndim == 2 else a)
    for fn in meta["files"][n:]:
        a = _imread(os.path.join(compress_dir, fn))
        los.append(a[..., None] if a.ndim == 2 else a)
    upper = np.concatenate(ups, -1).astype(np.uint16)
    lower = np.concatenate(los, -1).astype(np.uint16)
    q = ((upper << 8) | lower).astype(np.float32) / 65535.0
    mins = np.asarray(meta["mins"], np.float32)
    maxs = np.asarray(meta["maxs"], np.float32)
    scale = np.where(maxs > mins, maxs - mins, 1.0)
    out = (q * scale + mins).reshape(meta["shape"])
    if meta.get("log_space"):
        out = np.asarray(inverse_log_transform(out))
    return out.astype(np.float32)


def compress_kmeans(compress_dir, name, grid, n_clusters=32768, q_bits=8,
                    iters=10) -> Dict:
    """Masked K-means VQ — the shN codec (png_compression.py:521-601):
    all-zero rows are bitpacked out, the rest indexed into 8-bit-quantized
    centroids."""
    from gscodec_studio_tpu.compression.kmeans import kmeans

    grid = np.asarray(grid, np.float32)
    side = grid.shape[0]
    flat = grid.reshape(side * side, -1)
    mask = np.any(flat != 0, axis=1)
    used = flat[mask]
    meta = {
        "kind": "kmeans", "shape": list(grid.shape), "n_points": int(mask.sum()),
    }
    np.save(os.path.join(compress_dir, f"{name}_mask.npy"), np.packbits(mask))
    if used.shape[0] == 0:
        meta["empty"] = True
        return meta
    k = int(min(n_clusters, used.shape[0]))
    centroids, labels = kmeans(used, k, iters=iters)
    mins, maxs = centroids.min(), centroids.max()
    scale = (maxs - mins) or 1.0
    cq = np.round((centroids - mins) / scale * (2**q_bits - 1)).astype(np.uint8)
    np.savez_compressed(
        os.path.join(compress_dir, f"{name}_vq.npz"),
        centroids=cq,
        labels=labels.astype(np.uint16 if k <= 65536 else np.uint32),
    )
    meta.update(mins=float(mins), maxs=float(maxs), q_bits=q_bits, k=k)
    return meta


def decompress_kmeans(compress_dir, name, meta) -> np.ndarray:
    shape = meta["shape"]
    flat = np.zeros((shape[0] * shape[1], int(np.prod(shape[2:]))), np.float32)
    mask = np.unpackbits(
        np.load(os.path.join(compress_dir, f"{name}_mask.npy")),
        count=shape[0] * shape[1],
    ).astype(bool)
    if not meta.get("empty"):
        z = np.load(os.path.join(compress_dir, f"{name}_vq.npz"))
        scale = meta["maxs"] - meta["mins"] or 1.0
        centroids = (
            z["centroids"].astype(np.float32) / (2 ** meta["q_bits"] - 1) * scale
            + meta["mins"]
        )
        flat[mask] = centroids[z["labels"].astype(np.int64)]
    return flat.reshape(shape)


def compress_npz(compress_dir, name, grid) -> Dict:
    """Lossless fallback (png_compression.py:395-407)."""
    np.savez_compressed(
        os.path.join(compress_dir, f"{name}.npz"), arr=np.asarray(grid)
    )
    return {"kind": "npz", "shape": list(np.asarray(grid).shape)}


def decompress_npz(compress_dir, name, meta) -> np.ndarray:
    return np.load(os.path.join(compress_dir, f"{name}.npz"))["arr"]
