"""Temporal sequence codec for tracked splat sequences.

Behavioral spec: /root/reference/gsplat/compression/seq_hevc_compression.py
(SeqHevcCompression:22-691): a list of per-frame splat dicts (same splat
count/correspondence) is reorganized into per-attribute videos
[T, side, side, D] (``reorganize`` :236-275), with the PLAS sort computed on
frame 0 and applied to every frame (random-access mode) or per-frame
(all-intra, :178-258); means get a 16-bit upper/lower split (:392-487);
videos are encoded with x265 via ffmpeg (:306-460).

This environment has no ffmpeg binary: the video backend is pluggable —
``hevc`` shells out to ffmpeg when present, ``pngseq`` writes per-frame PNGs
(lossless 8-bit, still profits from the grid sorting). The organization/
16-bit/meta logic is identical either way.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import subprocess
from typing import Dict, List, Optional

import numpy as np

from gscodec_studio_tpu.compression.outlier_filter import filter_splats
from gscodec_studio_tpu.compression import native
from gscodec_studio_tpu.compression_sim.ops import (
    log_transform,
    inverse_log_transform,
)


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def _write_video(path_base: str, frames_u8: np.ndarray, backend: str, qp: int):
    """frames_u8: [T, H, W] or [T, H, W, 3] uint8."""
    if backend == "hevc":
        import imageio.v2 as imageio

        tmp = path_base + "_frames"
        os.makedirs(tmp, exist_ok=True)
        for i, fr in enumerate(frames_u8):
            imageio.imwrite(os.path.join(tmp, f"{i:05d}.png"), fr)
        out = path_base + ".mp4"
        fmt = "gray" if frames_u8.ndim == 3 else "yuv444p"
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-i",
             os.path.join(tmp, "%05d.png"), "-c:v", "libx265",
             "-x265-params", f"qp={qp}:lossless=0", "-pix_fmt", fmt, out],
            check=True,
        )
        shutil.rmtree(tmp)
        return [os.path.basename(out)]
    elif backend == "pngseq":
        import imageio.v2 as imageio

        files = []
        for i, fr in enumerate(frames_u8):
            fn = f"{os.path.basename(path_base)}_{i:05d}.png"
            imageio.imwrite(
                os.path.join(os.path.dirname(path_base), fn), fr
            )
            files.append(fn)
        return files
    raise ValueError(backend)


def _read_video(dirname: str, files: List[str], backend: str, shape):
    import imageio.v2 as imageio

    if backend == "hevc":
        reader = imageio.get_reader(os.path.join(dirname, files[0]))
        frames = np.stack([np.asarray(fr) for fr in reader])
        if frames.ndim == 4 and len(shape) == 3:
            frames = frames[..., 0]
        return frames[: shape[0]]
    frames = [imageio.imread(os.path.join(dirname, f)) for f in files]
    return np.stack(frames)


@dataclasses.dataclass
class SeqCodec:
    """compress(dir, frames: List[splats]) / decompress(dir) -> List[splats]."""

    backend: str = "auto"  # hevc | pngseq | auto
    qp: int = 20
    all_intra: bool = False  # per-frame sort (vs frame-0 sort for all)
    sweeps_per_level: int = 2

    def _backend(self):
        if self.backend != "auto":
            return self.backend
        return "hevc" if have_ffmpeg() else "pngseq"

    def compress(self, compress_dir: str, frames: List[Dict]) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        backend = self._backend()
        T = len(frames)
        n = min(len(f["means"]) for f in frames)
        side = int(np.floor(np.sqrt(n)))
        keep_n = side * side

        # Sort indices from frame 0 (random-access mode) — the tracked
        # correspondence makes one permutation valid for all frames
        # (seq_hevc_compression.py:178-199).
        def sort_perm(splats):
            feats = []
            for k in ("means", "scales", "opacities"):
                v = np.asarray(splats[k], np.float32).reshape(len(splats[k]), -1)
                v = v[:keep_n]
                std = v.std(0)
                std[std == 0] = 1
                feats.append((v - v.mean(0)) / std)
            data = np.concatenate(feats, 1)
            return native.plas_sort(
                data, side, sweeps_per_level=self.sweeps_per_level
            )

        perms = (
            [sort_perm(f) for f in frames]
            if self.all_intra
            else [sort_perm(frames[0])] * T
        )

        attrs = sorted(frames[0].keys())
        meta = {"side": side, "T": T, "backend": backend,
                "all_intra": self.all_intra, "attrs": {}}
        for name in attrs:
            if np.asarray(frames[0][name]).size == 0:
                # zero-width attribute (e.g. shN with 0 bands): record the
                # trailing shape so decode restores the empty array
                meta["attrs"][name] = {
                    "empty_shape": list(np.asarray(frames[0][name]).shape[1:])
                }
                continue
            vids = []
            for f, perm in zip(frames, perms):
                v = np.asarray(f[name], np.float32)[:keep_n][perm]
                vids.append(v.reshape(side, side, -1))
            video = np.stack(vids)  # [T, side, side, D]
            D = video.shape[-1]
            if name == "means":
                video = np.asarray(log_transform(video))
            mins = video.reshape(-1, D).min(0)
            maxs = video.reshape(-1, D).max(0)
            scale = np.where(maxs > mins, maxs - mins, 1)
            norm = (video - mins) / scale
            m = {"shape": list(video.shape), "mins": mins.tolist(),
                 "maxs": maxs.tolist(), "files": [], "bits": 8}
            if name == "means":
                q = np.round(norm * 65535).astype(np.uint16)
                m["bits"] = 16
                for tag, img in (("u", (q >> 8).astype(np.uint8)),
                                 ("l", (q & 0xFF).astype(np.uint8))):
                    for d in range(D):
                        m["files"].append(
                            _write_video(
                                os.path.join(compress_dir, f"{name}_{tag}{d}"),
                                img[..., d], backend, max(self.qp - 10, 0),
                            )
                        )
            else:
                # Under hevc, qp is the real rate knob (x265). Under the
                # pngseq fallback (no ffmpeg in this image) PNG is
                # lossless, so qp would be a NO-OP and every "rate point"
                # would decode identically (observed: rp0/rp2 PSNR equal
                # to 1e-6) — map qp onto the attribute bit depth instead
                # so the ladder actually trades rate for quality:
                # qp 30/25/20/15 -> 4/5/6/8 bits.
                bits = 8
                if backend == "pngseq":
                    bits = int(np.clip(round((42 - self.qp) / 3.4), 4, 8))
                m["bits"] = bits
                q = np.round(norm * (2 ** bits - 1)).astype(np.uint8)
                for d in range(D):
                    m["files"].append(
                        _write_video(
                            os.path.join(compress_dir, f"{name}_{d}"),
                            q[..., d], backend, self.qp,
                        )
                    )
            meta["attrs"][name] = m
        with open(os.path.join(compress_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)

    def decompress(self, compress_dir: str) -> List[Dict]:
        with open(os.path.join(compress_dir, "meta.json")) as fh:
            meta = json.load(fh)
        backend = meta["backend"]
        side, T = meta["side"], meta["T"]
        n = side * side
        frames = [dict() for _ in range(T)]
        for name, m in meta["attrs"].items():
            if "empty_shape" in m:
                for t in range(T):
                    frames[t][name] = np.zeros(
                        [n] + m["empty_shape"], np.float32
                    )
                continue
            Tt, s1, s2, D = m["shape"]
            mins = np.asarray(m["mins"], np.float32)
            maxs = np.asarray(m["maxs"], np.float32)
            scale = np.where(maxs > mins, maxs - mins, 1)
            chans = []
            if m["bits"] == 16:
                half = len(m["files"]) // 2
                for d in range(D):
                    up = _read_video(compress_dir, m["files"][d], backend,
                                     (T, s1, s2)).astype(np.uint16)
                    lo = _read_video(compress_dir, m["files"][half + d],
                                     backend, (T, s1, s2)).astype(np.uint16)
                    chans.append(((up << 8) | lo).astype(np.float32) / 65535.0)
            else:
                denom = float(2 ** m["bits"] - 1)
                for d in range(D):
                    v = _read_video(compress_dir, m["files"][d], backend,
                                    (T, s1, s2))
                    chans.append(v.astype(np.float32) / denom)
            video = np.stack(chans, -1) * scale + mins
            if name == "means":
                video = np.asarray(inverse_log_transform(video))
            for t in range(T):
                frames[t][name] = video[t].reshape(n, D)
        return frames
