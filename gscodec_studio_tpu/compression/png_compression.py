"""PNG-grid test-time codec (the reference's headline compression pipeline,
/root/reference/gsplat/compression/png_compression.py:79-684):

  opacity filter -> normalize quats -> crop-to-square -> PLAS sort ->
  per-attribute codecs: means 16-bit dual-PNG (sign-log space), scales/quats/
  sh0/opacities 8-bit PNG, shN masked K-means VQ, anything else npz ->
  meta.json.

Sizes on disk are the rate measurement the benchmarks sum up.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, Optional

import numpy as np

from gscodec_studio_tpu.compression import codecs
from gscodec_studio_tpu.compression.outlier_filter import filter_splats
from gscodec_studio_tpu.compression.sort import sort_splats


@dataclasses.dataclass
class PngCompression:
    """compress(dir, splats) / decompress(dir) -> splats
    (png_compression.py:79 API)."""

    use_sort: bool = True
    verbose: bool = False
    shn_clusters: int = 32768
    kmeans_iters: int = 10

    def _codec_for(self, name: str):
        if name == "means":
            return (
                lambda d, n, g: codecs.compress_png_16bit(d, n, g, log_space=True),
                codecs.decompress_png_16bit,
            )
        if name in ("scales", "quats", "opacities", "sh0"):
            return (
                lambda d, n, g: codecs.compress_png(d, n, g, n_bits=8),
                codecs.decompress_png,
            )
        if name == "shN":
            return (
                lambda d, n, g: codecs.compress_kmeans(
                    d, n, g, self.shn_clusters, iters=self.kmeans_iters
                ),
                codecs.decompress_kmeans,
            )
        return (codecs.compress_npz, codecs.decompress_npz)

    def compress(self, compress_dir: str, splats: Dict) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        splats = {k: np.asarray(v) for k, v in splats.items()}
        splats, _ = filter_splats(splats)
        # Normalize quats (sign-canonical) before quantization
        # (png_compression.py:100-101).
        q = splats["quats"]
        q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        splats["quats"] = np.where(q[:, :1] >= 0, q, -q)

        if self.use_sort:
            splats, side = sort_splats(splats, self.verbose)
        else:
            n = len(splats["means"])
            side = int(np.floor(np.sqrt(n)))
            keep = np.argsort(splats["opacities"])[::-1][: side * side]
            splats = {k: v[np.sort(keep)] for k, v in splats.items()}

        meta = {"side": side, "attrs": {}}
        for name, v in splats.items():
            grid = v.reshape(side, side, *v.shape[1:])
            if grid.ndim == 2:
                grid = grid[..., None]
            if name == "shN":
                pass  # kmeans codec keeps trailing dims
            elif grid.ndim > 3:
                grid = grid.reshape(side, side, -1)
            comp, _ = self._codec_for(name)
            meta["attrs"][name] = comp(compress_dir, name, grid)
        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        side = meta["side"]
        out = {}
        for name, m in meta["attrs"].items():
            _, dec = self._codec_for(name)
            grid = dec(compress_dir, name, m)
            arr = np.asarray(grid, np.float32)
            shp = m["shape"]
            arr = arr.reshape(shp)
            n = side * side
            if name == "opacities":
                out[name] = arr.reshape(n)
            elif name == "sh0":
                out[name] = arr.reshape(n, 1, 3)
            elif name == "shN":
                out[name] = arr.reshape(n, -1, 3)
            else:
                out[name] = arr.reshape(n, -1)
        return out


def compressed_size(compress_dir: str) -> int:
    """Total bytes on disk (the benchmarks' rate measure,
    benchmarks/compression/summarize_stats.py)."""
    total = 0
    for root, _, files in os.walk(compress_dir):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total
