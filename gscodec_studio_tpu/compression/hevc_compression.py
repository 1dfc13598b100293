"""Single-frame HEVC-grid codec + hybrid codec.

Behavioral spec: /root/reference/gsplat/compression/hevc_compression.py
(:19-843): the PNG pipeline but 8-bit attribute grids are encoded as
single-frame x265 videos (qp-controlled rate); means stay 16-bit PNG, shN
stays VQ. hybrid_compression.py mixes PNG and ANS per attribute.

ffmpeg is optional here: ``backend="auto"`` uses x265 when present, else
falls back to PNG files (identical pipeline structure; rate differs).
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
from gscodec_studio_tpu.compression.seq_codec import (
    _write_video,
    _read_video,
    have_ffmpeg,
)


@dataclasses.dataclass
class HevcCompression:
    qp: int = 20
    backend: str = "auto"
    shn_clusters: int = 32768
    kmeans_iters: int = 10

    def _backend(self):
        if self.backend != "auto":
            return self.backend
        return "hevc" if have_ffmpeg() else "pngseq"

    def compress(self, compress_dir: str, splats: Dict) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        backend = self._backend()
        splats = {k: np.asarray(v) for k, v in splats.items()}
        splats, _ = filter_splats(splats)
        q = splats["quats"]
        q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        splats["quats"] = np.where(q[:, :1] >= 0, q, -q)
        splats, side = sort_splats(splats)

        meta = {"side": side, "backend": backend, "attrs": {}}
        for name, v in splats.items():
            if name == "means":
                grid = v.reshape(side, side, -1)
                meta["attrs"][name] = codecs.compress_png_16bit(
                    compress_dir, name, grid, log_space=True
                )
            elif name == "shN":
                grid = v.reshape(side, side, *v.shape[1:])
                meta["attrs"][name] = codecs.compress_kmeans(
                    compress_dir, name, grid, self.shn_clusters,
                    iters=self.kmeans_iters,
                )
            else:
                grid = v.reshape(side, side, -1)
                D = grid.shape[-1]
                mins = grid.reshape(-1, D).min(0)
                maxs = grid.reshape(-1, D).max(0)
                scale = np.where(maxs > mins, maxs - mins, 1)
                q8 = np.round((grid - mins) / scale * 255).astype(np.uint8)
                files = []
                for d in range(D):
                    files.append(
                        _write_video(
                            os.path.join(compress_dir, f"{name}_{d}"),
                            q8[None, ..., d], backend, self.qp,
                        )
                    )
                meta["attrs"][name] = {
                    "kind": "hevc", "files": files, "shape": list(grid.shape),
                    "mins": mins.tolist(), "maxs": maxs.tolist(),
                }
        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        side = meta["side"]
        backend = meta["backend"]
        n = side * side
        out = {}
        for name, m in meta["attrs"].items():
            if m["kind"] == "png16":
                arr = codecs.decompress_png_16bit(compress_dir, name, m)
            elif m["kind"] == "kmeans":
                arr = codecs.decompress_kmeans(compress_dir, name, m)
            else:
                D = m["shape"][-1]
                mins = np.asarray(m["mins"], np.float32)
                maxs = np.asarray(m["maxs"], np.float32)
                scale = np.where(maxs > mins, maxs - mins, 1)
                chans = [
                    _read_video(compress_dir, m["files"][d], backend,
                                (1, side, side))[0].astype(np.float32) / 255.0
                    for d in range(D)
                ]
                arr = np.stack(chans, -1) * scale + mins
            arr = np.asarray(arr, np.float32)
            if name == "opacities":
                out[name] = arr.reshape(n)
            elif name == "sh0":
                out[name] = arr.reshape(n, 1, 3)
            elif name == "shN":
                out[name] = arr.reshape(n, -1, 3)
            else:
                out[name] = arr.reshape(n, -1)
        return out


@dataclasses.dataclass
class HybridCompression:
    """PNG + ANS mix per attribute (hybrid_compression.py): ANS for the
    low-entropy quantized attributes, PNG grids for the rest."""

    ans_attrs: tuple = ("scales", "quats")
    shn_clusters: int = 32768
    kmeans_iters: int = 10

    def compress(self, compress_dir: str, splats: Dict,
                 entropy_models=None) -> None:
        from gscodec_studio_tpu.compression.entropy_coding import (
            EntropyCodingCompression,
        )

        EntropyCodingCompression(
            ans_attrs=self.ans_attrs, shn_clusters=self.shn_clusters,
            kmeans_iters=self.kmeans_iters,
        ).compress(compress_dir, splats, entropy_models)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        from gscodec_studio_tpu.compression.entropy_coding import (
            EntropyCodingCompression,
        )

        return EntropyCodingCompression().decompress(compress_dir)
