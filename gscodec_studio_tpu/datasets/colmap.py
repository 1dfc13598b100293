"""COLMAP dataset: Parser (scene loading/normalization) + Dataset (indexable
view provider), mirroring /root/reference/examples/datasets/colmap.py
(Parser :29, Dataset :308, GSCDataset :393) without the pycolmap dependency
(clean-room reader in colmap_io.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from gscodec_studio_tpu.datasets import colmap_io
from gscodec_studio_tpu.datasets.normalize import (
    normalize_world,
    transform_cameras,
    transform_points,
)


class Parser:
    """Loads a COLMAP scene: camtoworlds [N,4,4], Ks_dict, image paths,
    3D points (+rgb), normalization, scene_scale."""

    def __init__(
        self,
        data_dir: str,
        factor: int = 1,
        normalize: bool = True,
        test_every: int = 8,
        load_points2d: bool = False,
    ):
        self.data_dir = data_dir
        self.factor = factor
        self.test_every = test_every

        sparse = os.path.join(data_dir, "sparse", "0")
        if not os.path.exists(sparse):
            sparse = os.path.join(data_dir, "sparse")
        cams, images, (points, points_rgb, points_err, point_ids) = (
            colmap_io.read_model(sparse, load_points2d=load_points2d)
        )

        # Sort by filename for a deterministic ordering (colmap.py:100).
        ordered = sorted(images.values(), key=lambda im: im.name)
        w2c = []
        camera_ids = []
        image_names = []
        for im in ordered:
            R = colmap_io.qvec_to_rotmat(im.qvec)
            mat = np.eye(4)
            mat[:3, :3] = R
            mat[:3, 3] = im.tvec
            w2c.append(mat)
            camera_ids.append(im.camera_id)
            image_names.append(im.name)
        w2c = np.stack(w2c)
        camtoworlds = np.linalg.inv(w2c)

        # Intrinsics (downscaled by factor); store distortion for undistortion.
        self.Ks_dict: Dict[int, np.ndarray] = {}
        self.imsize_dict: Dict[int, tuple] = {}
        self.dist_dict: Dict[int, np.ndarray] = {}
        self.model_dict: Dict[int, str] = {}
        for cam_id, cam in cams.items():
            fx, fy, cx, cy, dist = _intrinsics_from_colmap(cam)
            K = np.array(
                [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float64
            )
            K[:2] /= factor
            self.Ks_dict[cam_id] = K
            self.imsize_dict[cam_id] = (
                int(round(cam.width / factor)),
                int(round(cam.height / factor)),
            )
            self.dist_dict[cam_id] = dist
            self.model_dict[cam_id] = cam.model

        # Image dir with downscale suffix convention (colmap.py images_N dirs).
        image_dir = os.path.join(data_dir, "images")
        if factor > 1 and os.path.exists(image_dir + f"_{factor}"):
            image_dir = image_dir + f"_{factor}"
        self.image_dir = image_dir
        self.image_names = image_names
        self.image_paths = [os.path.join(image_dir, n) for n in image_names]
        self.camera_ids = camera_ids

        if normalize:
            camtoworlds, points, self.transform = normalize_world(
                camtoworlds, points
            )
        else:
            self.transform = np.eye(4)

        self.camtoworlds = camtoworlds.astype(np.float32)
        self.points = points.astype(np.float32)
        self.points_rgb = points_rgb
        self.points_err = points_err

        # image_name -> row indices into self.points (for SfM depth
        # supervision; reference colmap.py:175-216 point_indices)
        self.point_indices: Dict[str, np.ndarray] = {}
        if load_points2d:
            id_to_row = {int(pid): i for i, pid in enumerate(point_ids)}
            for im in ordered:
                if im.point3d_ids is None:
                    continue
                rows = [
                    id_to_row[int(pid)]
                    for pid in im.point3d_ids
                    if pid >= 0 and int(pid) in id_to_row
                ]
                self.point_indices[im.name] = np.asarray(rows, np.int64)

        # Scene scale: max camera distance from center * 1.1 (colmap.py:278-292).
        camera_locs = self.camtoworlds[:, :3, 3]
        scene_center = camera_locs.mean(axis=0)
        self.scene_scale = float(
            np.max(np.linalg.norm(camera_locs - scene_center, axis=1)) * 1.1
        )


def _intrinsics_from_colmap(cam: colmap_io.ColmapCamera):
    p = cam.params
    model = cam.model
    dist = np.zeros(4)
    if model == "SIMPLE_PINHOLE":
        fx = fy = p[0]
        cx, cy = p[1], p[2]
    elif model == "PINHOLE":
        fx, fy, cx, cy = p[:4]
    elif model == "SIMPLE_RADIAL":
        fx = fy = p[0]
        cx, cy = p[1], p[2]
        dist = np.array([p[3], 0, 0, 0])
    elif model == "RADIAL":
        fx = fy = p[0]
        cx, cy = p[1], p[2]
        dist = np.array([p[3], p[4], 0, 0])
    elif model in ("OPENCV", "OPENCV_FISHEYE"):
        fx, fy, cx, cy = p[:4]
        dist = p[4:8]
    else:
        raise ValueError(f"unsupported camera model {model}")
    return fx, fy, cx, cy, dist


class Dataset:
    """Indexable train/val view provider (colmap.py Dataset:308-390)."""

    def __init__(
        self,
        parser: Parser,
        split: str = "train",
        patch_size: Optional[int] = None,
        load_depths: bool = False,
    ):
        self.parser = parser
        self.split = split
        self.patch_size = patch_size
        self.load_depths = load_depths
        indices = np.arange(len(parser.image_paths))
        if split == "train":
            self.indices = indices[indices % parser.test_every != 0]
        else:
            self.indices = indices[indices % parser.test_every == 0]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, item: int) -> Dict:
        import imageio.v2 as imageio

        idx = int(self.indices[item])
        p = self.parser
        image = imageio.imread(p.image_paths[idx])[..., :3]
        cam_id = p.camera_ids[idx]
        K = p.Ks_dict[cam_id].copy()
        # K was divided by `factor`, but the image may have been loaded from
        # the full-resolution images/ dir (no images_{factor} available).
        # Silently proceeding would train full-res pixels against
        # quarter-scale intrinsics; resize to the expected size instead.
        exp_w, exp_h = p.imsize_dict[cam_id]
        if (image.shape[1], image.shape[0]) != (exp_w, exp_h):
            import cv2

            image = cv2.resize(
                image, (exp_w, exp_h), interpolation=cv2.INTER_AREA
            )
        dist = p.dist_dict[cam_id]
        if np.any(dist != 0):
            import cv2

            w, h = p.imsize_dict[cam_id]
            if p.model_dict[cam_id] == "OPENCV_FISHEYE":
                newK = K.copy()
                mapx, mapy = cv2.fisheye.initUndistortRectifyMap(
                    K, dist, np.eye(3), newK, (w, h), cv2.CV_32FC1
                )
            else:
                d5 = np.array([dist[0], dist[1], dist[2], dist[3], 0.0])
                newK, _ = cv2.getOptimalNewCameraMatrix(K, d5, (w, h), 0)
                mapx, mapy = cv2.initUndistortRectifyMap(
                    K, d5, None, newK, (w, h), cv2.CV_32FC1
                )
            image = cv2.remap(image, mapx, mapy, cv2.INTER_LINEAR)
            K = newK

        data = {
            "K": K.astype(np.float32),
            "camtoworld": p.camtoworlds[idx],
            "image": image.astype(np.float32) / 255.0,
            "image_id": idx,
        }
        if self.load_depths:
            # project this image's SfM tracks into the (undistorted,
            # factor-scaled) camera: pixel xy + metric depth
            # (reference colmap.py Dataset depth branch)
            name = p.image_names[idx]
            rows = p.point_indices.get(name, np.empty(0, np.int64))
            pts_world = p.points[rows]  # [M, 3]
            w2c = np.linalg.inv(p.camtoworlds[idx])
            cam = (pts_world @ w2c[:3, :3].T) + w2c[:3, 3]
            depths = cam[:, 2]
            uvw = cam @ K.T
            xy = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-8)
            h, w = data["image"].shape[:2]
            keep = (
                (depths > 0.0)
                & (xy[:, 0] >= 0) & (xy[:, 0] < w)
                & (xy[:, 1] >= 0) & (xy[:, 1] < h)
            )
            data["points"] = xy[keep].astype(np.float32)  # [M, 2]
            data["depths"] = depths[keep].astype(np.float32)  # [M]
        return data


class GSCDataset(Dataset):
    """Split by explicit test-view ids (colmap.py GSCDataset:393+), the MPEG
    GSC evaluation convention."""

    def __init__(self, parser: Parser, split: str = "train",
                 test_view_ids: Sequence[int] = (0,), **kw):
        super().__init__(parser, split="train", **kw)
        all_idx = np.arange(len(parser.image_paths))
        test = np.asarray(sorted(test_view_ids))
        if split == "train":
            self.indices = np.setdiff1d(all_idx, test)
        else:
            self.indices = test
