"""INVR dataset + dyn trainer CLI end to end on a fabricated tiny
multiview-video dataset (Blender-json convention)."""

import json
import os
import subprocess
import sys

import numpy as np


def _make_invr(root, rng, n_views=2, n_frames=3, w=32, h=24):
    import imageio.v2 as imageio

    os.makedirs(root, exist_ok=True)
    frames = []
    for vi in range(n_views):
        for fi in range(n_frames):
            name = f"v{vi}_f{fi}.png"
            imageio.imwrite(
                os.path.join(root, name),
                (rng.random((h, w, 3)) * 255).astype(np.uint8),
            )
            c2w = np.eye(4)
            c2w[:3, 3] = [0.3 * vi, 0.0, -3.0]
            frames.append({
                "file_path": name,
                "transform_matrix": c2w.tolist(),
                "time": fi / max(n_frames - 1, 1),
            })
    meta = {"camera_angle_x": 0.9, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)


def test_invr_parser_and_cli(rng, tmp_path):
    data = str(tmp_path / "invr")
    _make_invr(data, rng)

    from gscodec_studio_tpu.datasets.invr import INVRDataset, INVRParser

    parser = INVRParser(data, "train")
    ds = INVRDataset(parser)
    d = ds[0]
    assert d["image"].shape == (24, 32, 3)
    assert 0.0 <= d["timestamp"] <= 1.0

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "examples/dyn_trainer_cli.py",
         "--data-dir", data, "--result-dir", str(tmp_path / "res"),
         "--max-steps", "8", "--cap-max", "64", "--init-points", "48",
         "--rasterizer", "pallas", "--color-mode", "linear",
         "--isect-capacity", "8192",
         "--steps-per-dispatch", "4",
         "--export-frames", "2", "--eval-video",
         "--eval-video-frames", "3"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "res" / "stats.json"))
    assert os.path.exists(str(tmp_path / "res" / "ply_seq" /
                              "frame_0000.ply"))
