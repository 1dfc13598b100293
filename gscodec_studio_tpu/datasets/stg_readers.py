"""SpacetimeGaussian dataset readers: Neural3D (N3D) and Technicolor.

Clean-room equivalents of the reference's STG loaders
(/root/reference/examples/helper/STG/dataset_readers.py:81-250,759-958):
both formats store a multiview video as per-frame COLMAP workspaces

    scene/
      poses_bounds.npy            (N3D only: LLFF poses + depth bounds)
      colmap_<t>/
        sparse/0/{cameras,images,points3D}.{bin|txt}   (t = start frame)
        images/cam00.png ... camNN.png

with camera poses shared across frames (only ``colmap_<start>`` carries a
sparse model) and frame t's images under ``colmap_<t>/images/``.
Differences mirrored from the reference:

  * N3D (``readColmapCameras``): the global intrinsics come from
    ``poses_bounds.npy`` (H, W, focal in the last column of the first
    pose; near/far from the bounds, :85-106), one shared K for all views;
    the test split is a fixed view id list (``test_view_id=[0]``, :759).
  * Technicolor (``readColmapCamerasTechnicolor``): per-camera PINHOLE
    intrinsics including the principal point (:220-228); the test split
    is every ``llffhold``-th camera (:874+).

Timestamps are normalized to [0, 1): (t - start) / duration (:155,216).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from gscodec_studio_tpu.datasets.colmap_io import (
    qvec_to_rotmat,
    read_model,
)


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


class STGParser:
    """Parses an N3D/Technicolor-style per-frame-COLMAP video scene into
    a flat (camera x frame) view list + SfM init points."""

    def __init__(
        self,
        data_dir: str,
        dataset_type: str = "n3d",  # "n3d" | "technicolor"
        start: int = 0,
        duration: int = 50,
        split: str = "train",
        llffhold: int = 8,
        test_view_ids: Sequence[int] = (0,),
        factor: int = 1,
    ):
        assert dataset_type in ("n3d", "technicolor"), dataset_type
        self.data_dir = data_dir
        self.dataset_type = dataset_type
        self.factor = factor

        base = os.path.join(data_dir, f"colmap_{start}")
        cams, imgs, pts = read_model(os.path.join(base, "sparse", "0"))
        self.points, self.points_rgb, self.points_err = (
            pts[0].astype(np.float32), pts[1], pts[2],
        )

        # global LLFF intrinsics for N3D (dataset_readers.py:85-106)
        K_global = None
        self.near, self.far = 0.01, 100.0
        pb_path = os.path.join(data_dir, "poses_bounds.npy")
        if dataset_type == "n3d":
            pb = np.load(pb_path)
            poses = pb[:, :15].reshape(-1, 3, 5)
            bounds = pb[:, -2:]
            self.near = float(bounds.min() * 0.95)
            self.far = float(bounds.max() * 1.05)
            H, W, focal = poses[0, :, -1]
            K_global = np.array(
                [
                    [focal / factor, 0.0, W / 2.0 / factor],
                    [0.0, focal / factor, H / 2.0 / factor],
                    [0.0, 0.0, 1.0],
                ],
                np.float32,
            )

        # strictly name-sorted camera order (the reference natsorts so
        # cam2 < cam10, :113-118)
        by_name = sorted(imgs.values(), key=lambda im: _natural_key(im.name))
        test_set = set()
        for ci, im in enumerate(by_name):
            if dataset_type == "technicolor":
                if ci % llffhold == 0:
                    test_set.add(im.name)
            else:
                if ci in test_view_ids:
                    test_set.add(im.name)

        self.views: List[Dict] = []
        for im in by_name:
            is_test = im.name in test_set
            if (split == "train") == is_test:
                continue
            cam = cams[im.camera_id]
            R = qvec_to_rotmat(np.asarray(im.qvec))
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, :3] = R
            w2c[:3, 3] = np.asarray(im.tvec, np.float32)
            c2w = np.linalg.inv(w2c).astype(np.float32)

            if K_global is not None:
                K = K_global
                width = int(cam.width) // factor
                height = int(cam.height) // factor
            else:
                # PINHOLE/SIMPLE_PINHOLE params with the real principal
                # point (Technicolor, :220-228)
                p = np.asarray(cam.params, np.float64)
                if cam.model in ("SIMPLE_PINHOLE",):
                    fx = fy = p[0]
                    cx, cy = p[1], p[2]
                else:
                    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
                K = np.array(
                    [
                        [fx / factor, 0.0, cx / factor],
                        [0.0, fy / factor, cy / factor],
                        [0.0, 0.0, 1.0],
                    ],
                    np.float32,
                )
                width = int(cam.width) // factor
                height = int(cam.height) // factor

            for t in range(start, start + duration):
                img_path = os.path.join(
                    data_dir, f"colmap_{t}", "images", os.path.basename(im.name)
                )
                self.views.append(
                    {
                        "camtoworld": c2w,
                        "K": K,
                        "image_path": img_path,
                        "timestamp": (t - start) / float(duration),
                        "width": width,
                        "height": height,
                        "cam_name": im.name,
                    }
                )

        # scene scale from camera spread (getNerfppNorm, :57-79)
        centers = np.stack(
            [v["camtoworld"][:3, 3] for v in self.views]
        ) if self.views else np.zeros((1, 3), np.float32)
        center = centers.mean(axis=0)
        self.scene_scale = float(
            np.linalg.norm(centers - center, axis=1).max() * 1.1 + 1e-6
        )


class STGDataset:
    """Lazy image-loading view over an STGParser (dyn-trainer protocol:
    items carry camtoworld / K / image / timestamp)."""

    def __init__(self, parser: STGParser):
        self.parser = parser

    def __len__(self):
        return len(self.parser.views)

    def __getitem__(self, i: int) -> Dict:
        import imageio.v2 as imageio

        v = self.parser.views[i]
        img = np.asarray(imageio.imread(v["image_path"]), np.float32) / 255.0
        f = self.parser.factor
        if f > 1:
            img = img[::f, ::f]
        return {
            "K": v["K"],
            "camtoworld": v["camtoworld"],
            "image": img[..., :3],
            "timestamp": np.float32(v["timestamp"]),
            "image_id": i,
        }
