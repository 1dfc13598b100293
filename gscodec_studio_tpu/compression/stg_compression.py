"""PNG codec for the SpacetimeGaussian (dynamic) attribute set.

Behavioral spec: /root/reference/gsplat/compression/stg_compression.py
(STGPngCompression:16-709): the PNG pipeline over the STG params — the
9-channel motion tensor splits into three 3-channel PNGs (:225-305),
trbf/omega/feature channels get 8-bit grids, means 16-bit dual-PNG.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict

import numpy as np

from gscodec_studio_tpu.compression import codecs
from gscodec_studio_tpu.compression.outlier_filter import filter_splats
from gscodec_studio_tpu.compression.sort import sort_splats


@dataclasses.dataclass
class STGPngCompression:
    use_sort: bool = True

    def compress(self, compress_dir: str, splats: Dict) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        splats = {k: np.asarray(v) for k, v in splats.items()}
        splats, _ = filter_splats(splats)
        q = splats["quats"]
        q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        splats["quats"] = np.where(q[:, :1] >= 0, q, -q)
        if self.use_sort:
            splats, side = sort_splats(
                splats,
                sort_keys=[k for k in splats if k not in ("motion", "omega")],
            )
        else:
            n = len(splats["means"])
            side = int(np.floor(np.sqrt(n)))
            splats = {k: v[: side * side] for k, v in splats.items()}

        meta = {"side": side, "attrs": {}}
        for name, v in splats.items():
            grid = v.reshape(side, side, -1)
            if name == "means":
                meta["attrs"][name] = codecs.compress_png_16bit(
                    compress_dir, name, grid, log_space=True
                )
            elif name == "motion":
                # 9 channels -> 3x RGB PNGs (stg_compression.py:225-305)
                m = {"kind": "multi_png", "parts": [], "shape": list(grid.shape)}
                for i in range(3):
                    m["parts"].append(
                        codecs.compress_png(
                            compress_dir, f"{name}_p{i}",
                            grid[..., 3 * i : 3 * i + 3], n_bits=8,
                        )
                    )
                meta["attrs"][name] = m
            else:
                meta["attrs"][name] = codecs.compress_png(
                    compress_dir, name, grid, n_bits=8
                )
        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        side = meta["side"]
        n = side * side
        out = {}
        for name, m in meta["attrs"].items():
            if m["kind"] == "png16":
                arr = codecs.decompress_png_16bit(compress_dir, name, m)
            elif m["kind"] == "multi_png":
                parts = [
                    codecs.decompress_png(compress_dir, f"{name}_p{i}", pm)
                    for i, pm in enumerate(m["parts"])
                ]
                arr = np.concatenate(parts, axis=-1)
            else:
                arr = codecs.decompress_png(compress_dir, name, m)
            D = int(np.prod(np.asarray(arr.shape[2:])))
            out[name] = np.asarray(arr, np.float32).reshape(n, D).squeeze()
            if out[name].ndim == 1 and D > 1:
                out[name] = out[name].reshape(n, D)
        return out
