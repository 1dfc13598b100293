"""PNG codec for the SpacetimeGaussian (dynamic) attribute set.

Behavioral spec: /root/reference/gsplat/compression/stg_compression.py
(STGPngCompression:16-144): a per-attribute codec map over the STG
params — means 16-bit dual-PNG (:381-461), scales/quats k-bit PNGs with a
configurable ``quantization`` bit depth (:306-379), the 9-channel motion
tensor split into three 3-channel PNGs (:225-305), trbf/omega/feature
channels 8-bit grids (:154-223), optional K-means VQ for the view/time
feature banks (:488-601), and a lossless npz fallback for any attribute
outside the map (:464-486).
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

# Attributes carrying rotation-like periodic content stay out of the PLAS
# sort keys (they alias under 2-D locality sorting), matching the
# reference's sorting over appearance/geometry params.
_NON_SORT_KEYS = ("motion", "omega")


@dataclasses.dataclass
class STGPngCompression:
    """Per-attribute quantize-to-PNG codec for dynamic (STG) splats.

    ``quantization`` is the bit depth for scales/quats (the reference's
    ``quantization`` arg, stg_compression.py:306-349: round to 2^k-1 then
    shift into the top PNG bits; here the k-bit code is stored directly —
    identical rate behavior after PNG's entropy stage, same reconstruction
    levels). ``use_kmeans`` routes the view/time feature banks through the
    masked K-means VQ codec instead of dense 8-bit grids.
    """

    use_sort: bool = True
    quantization: int = 8
    use_kmeans: bool = False

    def _plan(self, name: str, n_channels: int):
        """(kind, kwargs) per attribute — the reference's codec map
        (stg_compression.py:47-83)."""
        if name == "means":
            return "png16", {"log_space": True}
        if name == "motion":
            return "multi_png", {}
        if name in ("scales", "quats"):
            return "png", {"n_bits": self.quantization}
        if name in ("features_dir", "features_time") and self.use_kmeans:
            return "kmeans", {"n_clusters": 4096}
        if name in (
            "opacities", "trbf_center", "trbf_scale", "omega", "colors",
            "features_dir", "features_time",
        ):
            return "png", {"n_bits": 8}
        # anything else (e.g. extra model heads): lossless fallback
        return "npz", {}

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
                sort_keys=[k for k in splats if k not in _NON_SORT_KEYS],
            )
        else:
            n = len(splats["means"])
            side = int(np.floor(np.sqrt(n)))
            splats = {k: v[: side * side] for k, v in splats.items()}

        meta = {"side": side, "attrs": {}}
        for name, v in splats.items():
            grid = v.reshape(side, side, -1)
            kind, kw = self._plan(name, grid.shape[-1])
            if kind == "png16":
                m = codecs.compress_png_16bit(compress_dir, name, grid, **kw)
            elif kind == "multi_png":
                # 9 channels -> 3x RGB PNGs (stg_compression.py:225-305)
                m = {"kind": "multi_png", "parts": [],
                     "shape": list(grid.shape)}
                for i in range(3):
                    m["parts"].append(
                        codecs.compress_png(
                            compress_dir, f"{name}_p{i}",
                            grid[..., 3 * i: 3 * i + 3], n_bits=8,
                        )
                    )
            elif kind == "kmeans":
                m = codecs.compress_kmeans(compress_dir, name, grid, **kw)
            elif kind == "npz":
                m = codecs.compress_npz(compress_dir, name, grid)
            else:
                m = codecs.compress_png(compress_dir, name, grid, **kw)
            meta["attrs"][name] = m
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
            elif m["kind"] == "kmeans":
                arr = codecs.decompress_kmeans(compress_dir, name, m)
            elif m["kind"] == "npz":
                arr = codecs.decompress_npz(compress_dir, name, m)
            else:
                arr = codecs.decompress_png(compress_dir, name, m)
            D = int(np.prod(np.asarray(arr.shape[2:])))
            out[name] = np.asarray(arr, np.float32).reshape(n, D).squeeze()
            if out[name].ndim == 1 and D > 1:
                out[name] = out[name].reshape(n, D)
        return out
