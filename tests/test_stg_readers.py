"""STG dataset readers (N3D / Technicolor per-frame-COLMAP video layouts)
against fabricated on-disk scenes."""

import os

import numpy as np
import pytest

from gscodec_studio_tpu.datasets.stg_readers import STGParser, STGDataset


def _write_scene(root, n_cams=3, duration=4, w=32, h=24, with_pb=True):
    import imageio.v2 as imageio

    sparse = os.path.join(root, "colmap_0", "sparse", "0")
    os.makedirs(sparse)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        for c in range(n_cams):
            # PINHOLE fx fy cx cy (off-center principal point for the
            # technicolor branch)
            f.write(f"{c + 1} PINHOLE {w} {h} 30.0 31.0 {w/2 + 1} {h/2 - 1}\n")
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        for c in range(n_cams):
            tx = 0.3 * c
            f.write(f"{c + 1} 1 0 0 0 {tx} 0.0 2.0 {c + 1} cam{c:02d}.png\n")
            f.write("1.0 1.0 -1\n")  # one dummy 2D point (reader skips blanks)
    pts = np.random.default_rng(0).random((10, 3))
    with open(os.path.join(sparse, "points3D.txt"), "w") as f:
        for i, p in enumerate(pts):
            f.write(f"{i} {p[0]} {p[1]} {p[2]} 10 20 30 0.5\n")
    for t in range(duration):
        d = os.path.join(root, f"colmap_{t}", "images")
        os.makedirs(d, exist_ok=True)
        for c in range(n_cams):
            img = np.full((h, w, 3), 10 * t + c, np.uint8)
            imageio.imwrite(os.path.join(d, f"cam{c:02d}.png"), img)
    if with_pb:
        poses = np.zeros((n_cams, 3, 5), np.float32)
        poses[:, 0, 4] = h
        poses[:, 1, 4] = w
        poses[:, 2, 4] = 29.0  # focal
        pb = np.concatenate(
            [poses.reshape(n_cams, 15),
             np.tile([2.0, 10.0], (n_cams, 1))], axis=1
        )
        np.save(os.path.join(root, "poses_bounds.npy"), pb)


@pytest.mark.parametrize("dtype_", ["n3d", "technicolor"])
def test_stg_reader_layout(tmp_path, dtype_):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _write_scene(root, n_cams=3, duration=4)
    tr = STGParser(root, dataset_type=dtype_, duration=4, split="train")
    te = STGParser(root, dataset_type=dtype_, duration=4, split="test")
    # n3d: test_view_ids=(0,) -> 1 test cam; technicolor: every 8th -> cam0
    assert len(tr.views) == 2 * 4
    assert len(te.views) == 1 * 4
    assert tr.points.shape == (10, 3)
    ts = sorted({v["timestamp"] for v in tr.views})
    assert ts == [0.0, 0.25, 0.5, 0.75]

    if dtype_ == "n3d":
        # LLFF intrinsics: focal from poses_bounds, near/far from bounds
        K = tr.views[0]["K"]
        assert np.isclose(K[0, 0], 29.0)
        assert np.isclose(tr.near, 2.0 * 0.95)
        assert np.isclose(tr.far, 10.0 * 1.05)
    else:
        K = tr.views[0]["K"]
        assert np.isclose(K[0, 0], 30.0) and np.isclose(K[1, 1], 31.0)
        assert np.isclose(K[0, 2], 32 / 2 + 1)  # real principal point

    ds = STGDataset(tr)
    item = ds[1]
    assert item["image"].shape == (24, 32, 3)
    assert item["K"].shape == (3, 3)
    assert item["camtoworld"].shape == (4, 4)
    # frame t's pixels encode t (fabricated): timestamp consistency
    t_idx = round(item["timestamp"] * 4)
    assert np.isclose(item["image"].max() * 255, 10 * t_idx + 2, atol=1.5)


def test_stg_reader_feeds_dyn_trainer(tmp_path):
    """The parsed views drive the dynamic trainer's dataset protocol."""
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _write_scene(root, n_cams=3, duration=2)
    tr = STGParser(root, dataset_type="n3d", duration=2, split="train")
    ds = STGDataset(tr)
    batch = ds[0]
    for k in ("camtoworld", "K", "image", "timestamp"):
        assert k in batch
    assert 0.0 <= float(batch["timestamp"]) < 1.0
