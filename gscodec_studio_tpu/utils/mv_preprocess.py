"""MPEG GSC multiview-video preprocessing
(reference mpeg_gsc_utils/multiview_video_preprocess/: video_preprocess.py
YUV/mp4 conversion + run_per_frame_colmap.py per-frame COLMAP with shared
poses).

The GSC test-material flow: per-view YUV videos -> per-frame PNG dirs ->
one COLMAP reconstruction per frame that REUSES the calibrated frame-0
camera poses (only triangulating points), so every frame's model shares
the camera rig. COLMAP itself is an external binary — the orchestration
here is dry-runnable and gated on its presence (like the ffmpeg-gated
HEVC codecs).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

# BT.709 limited-range YCbCr -> RGB (the GSC test material convention,
# matching utils/gsc_metrics.py's forward transform)
_YUV2RGB = np.array(
    [[1.16438, 0.0, 1.79274],
     [1.16438, -0.21325, -0.53291],
     [1.16438, 2.11240, 0.0]], np.float32
)


def yuv420_to_rgb_frames(
    path: str, width: int, height: int, max_frames: Optional[int] = None
) -> List[np.ndarray]:
    """Decode a raw planar YUV 4:2:0 (8-bit) file into float RGB frames in
    [0, 1] (video_preprocess.py's yuv reading, pure numpy)."""
    ysz = width * height
    csz = ysz // 4
    frame_bytes = ysz + 2 * csz
    frames = []
    with open(path, "rb") as f:
        while max_frames is None or len(frames) < max_frames:
            buf = f.read(frame_bytes)
            if len(buf) < frame_bytes:
                break
            raw = np.frombuffer(buf, np.uint8)
            y = raw[:ysz].reshape(height, width).astype(np.float32)
            u = raw[ysz:ysz + csz].reshape(height // 2, width // 2)
            v = raw[ysz + csz:].reshape(height // 2, width // 2)
            u = u.repeat(2, 0).repeat(2, 1).astype(np.float32)
            v = v.repeat(2, 0).repeat(2, 1).astype(np.float32)
            ycc = np.stack(
                [(y - 16.0), (u - 128.0), (v - 128.0)], axis=-1
            ) / 255.0
            rgb = ycc @ _YUV2RGB.T
            frames.append(np.clip(rgb, 0.0, 1.0))
    return frames


def yuv_to_png_dirs(
    yuv_paths: Sequence[str],
    width: int,
    height: int,
    out_root: str,
    view_names: Optional[Sequence[str]] = None,
) -> List[str]:
    """Per-view YUV videos -> per-FRAME png dirs (frame_XXXX/<view>.png),
    the layout run_per_frame_colmap expects."""
    import imageio.v2 as imageio

    names = view_names or [
        os.path.splitext(os.path.basename(p))[0] for p in yuv_paths
    ]
    all_frames = [
        yuv420_to_rgb_frames(p, width, height) for p in yuv_paths
    ]
    T = min(len(f) for f in all_frames)
    dirs = []
    for t in range(T):
        d = os.path.join(out_root, f"frame_{t:04d}", "images")
        os.makedirs(d, exist_ok=True)
        for name, frames in zip(names, all_frames):
            imageio.imwrite(
                os.path.join(d, f"{name}.png"),
                (frames[t] * 255).astype(np.uint8),
            )
        dirs.append(os.path.dirname(d))
    return dirs


def have_colmap() -> bool:
    return shutil.which("colmap") is not None


def per_frame_colmap_commands(
    frame_dir: str, shared_sparse_dir: str
) -> List[List[str]]:
    """The COLMAP invocation sequence for ONE frame dir, reusing the shared
    (frame-0) calibration: feature extraction, matching against the fixed
    camera set, and point triangulation with poses held constant
    (run_per_frame_colmap.py's flow)."""
    db = os.path.join(frame_dir, "database.db")
    images = os.path.join(frame_dir, "images")
    out = os.path.join(frame_dir, "sparse")
    return [
        ["colmap", "feature_extractor", "--database_path", db,
         "--image_path", images],
        ["colmap", "exhaustive_matcher", "--database_path", db],
        ["colmap", "point_triangulator", "--database_path", db,
         "--image_path", images, "--input_path", shared_sparse_dir,
         "--output_path", out],
    ]


def run_per_frame_colmap(
    frame_dirs: Sequence[str],
    shared_sparse_dir: str,
    dry_run: bool = False,
) -> Dict[str, List[List[str]]]:
    """Run (or list, with dry_run) the per-frame COLMAP pipeline. Raises a
    clear error when the colmap binary is unavailable (this image ships
    none)."""
    plans = {
        d: per_frame_colmap_commands(d, shared_sparse_dir)
        for d in frame_dirs
    }
    if dry_run:
        return plans
    if not have_colmap():
        raise RuntimeError(
            "colmap binary not found on PATH — install COLMAP or use "
            "dry_run=True to inspect the per-frame command plan."
        )
    for d, cmds in plans.items():
        os.makedirs(os.path.join(d, "sparse"), exist_ok=True)
        for cmd in cmds:
            subprocess.run(cmd, check=True)
    return plans
