"""Multiview-video preprocessing (mpeg_gsc_utils equivalent): YUV decode,
per-frame layout, and the gated per-frame COLMAP plan."""

import os

import numpy as np
import pytest

from gscodec_studio_tpu.utils.gsc_metrics import rgb_to_ycbcr
from gscodec_studio_tpu.utils.mv_preprocess import (
    have_colmap,
    per_frame_colmap_commands,
    run_per_frame_colmap,
    yuv420_to_rgb_frames,
    yuv_to_png_dirs,
)


def _rgb_to_yuv420_bytes(rgb):
    """Inverse of the module's decode path (BT.709 LIMITED range: the GSC
    test-material convention the decoder assumes)."""
    ycc = rgb_to_ycbcr(rgb)  # full-range y/cb/cr in [0, 1]
    h, w = rgb.shape[:2]
    y = np.clip(16.0 + 219.0 * ycc[..., 0], 0, 255)
    u = np.clip(128.0 + 224.0 * (ycc[..., 1] - 0.5), 0, 255)
    v = np.clip(128.0 + 224.0 * (ycc[..., 2] - 0.5), 0, 255)
    u2 = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    v2 = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    return (
        np.round(y).astype(np.uint8).tobytes()
        + np.round(u2).astype(np.uint8).tobytes()
        + np.round(v2).astype(np.uint8).tobytes()
    )


def test_yuv420_roundtrip(rng, tmp_path):
    # smooth content: 4:2:0 chroma subsampling is lossy on per-pixel noise
    h, w, T = 32, 48, 3
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = [
        np.stack(
            [0.5 + 0.4 * np.sin(xx / 7.0 + t),
             0.5 + 0.4 * np.cos(yy / 9.0 - t),
             0.5 + 0.3 * np.sin((xx + yy) / 11.0)], axis=-1
        ).astype(np.float32)
        for t in range(T)
    ]
    path = str(tmp_path / "v.yuv")
    with open(path, "wb") as f:
        for fr in frames:
            f.write(_rgb_to_yuv420_bytes(fr))
    dec = yuv420_to_rgb_frames(path, w, h)
    assert len(dec) == T
    for a, b in zip(frames, dec):
        # chroma subsampling + 8-bit quantization: loose tolerance
        assert np.abs(a - b).mean() < 0.05


def test_yuv_to_png_dirs_layout(rng, tmp_path):
    h, w = 16, 16
    paths = []
    for vi in range(2):
        p = str(tmp_path / f"view{vi}.yuv")
        with open(p, "wb") as f:
            for _ in range(2):
                f.write(
                    _rgb_to_yuv420_bytes(
                        rng.random((h, w, 3)).astype(np.float32)
                    )
                )
        paths.append(p)
    dirs = yuv_to_png_dirs(paths, w, h, str(tmp_path / "out"))
    assert len(dirs) == 2
    assert os.path.exists(os.path.join(dirs[0], "images", "view0.png"))
    assert os.path.exists(os.path.join(dirs[1], "images", "view1.png"))


def test_per_frame_colmap_plan(tmp_path):
    plans = run_per_frame_colmap(
        [str(tmp_path / "frame_0000")], "/shared/sparse", dry_run=True
    )
    cmds = list(plans.values())[0]
    assert cmds[0][0:2] == ["colmap", "feature_extractor"]
    assert cmds[2][0:2] == ["colmap", "point_triangulator"]
    assert "--input_path" in cmds[2]
    if not have_colmap():
        with pytest.raises(RuntimeError):
            run_per_frame_colmap([str(tmp_path / "f")], "/s")
