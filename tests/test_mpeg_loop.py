"""MPEG anchor loop closure: tracked sequence -> SeqCodec -> decode ->
render decoded vs source -> GSC metrics (reference
compress_ply_sequence.py + ply_loader_renderer.py)."""

import numpy as np

from gscodec_studio_tpu.compression.seq_codec import SeqCodec
from gscodec_studio_tpu.utils.ply_render import (
    orbit_cameras, render_splats, sequence_metrics,
)


def _make_frames(rng, n=220, T=3):
    base = {
        "means": (rng.standard_normal((n, 3)) * 0.6).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "scales": (np.log(0.05) + 0.3 * rng.standard_normal(
            (n, 3))).astype(np.float32),
        "opacities": (2.0 + rng.standard_normal(n)).astype(np.float32),
        "sh0": (0.3 * rng.standard_normal((n, 1, 3))).astype(np.float32),
        "shN": np.zeros((n, 0, 3), np.float32),
    }
    vel = (0.02 * rng.standard_normal((n, 3))).astype(np.float32)
    frames = []
    for t in range(T):
        fr = {k: v.copy() for k, v in base.items()}
        fr["means"] = base["means"] + vel * t
        frames.append(fr)
    return frames


def test_sequence_rate_distortion_loop(rng, tmp_path):
    frames = _make_frames(rng)
    codec = SeqCodec(qp=20)
    d = str(tmp_path / "seq")
    codec.compress(d, frames)
    decoded = codec.decompress(d)
    assert len(decoded) == len(frames)

    cams = orbit_cameras(frames[0]["means"], n_views=2, width=96, height=80)
    m = sequence_metrics(frames, decoded, cams, isect_capacity=16384)
    for k in ("psnr_rgb", "psnr_y", "psnr_cb", "psnr_cr", "ssim_y"):
        assert k in m and np.isfinite(m[k]), (k, m)
    # decoded renders must resemble the source renders
    assert m["psnr_rgb"] > 25.0, m


def test_render_splats_shapes(rng):
    frames = _make_frames(rng, n=100, T=1)
    cams = orbit_cameras(frames[0]["means"], n_views=2, width=64, height=48)
    imgs = render_splats(frames[0], cams, isect_capacity=8192)
    assert len(imgs) == 2 and imgs[0].shape == (48, 64, 3)
    assert np.isfinite(imgs[0]).all()
