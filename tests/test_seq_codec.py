"""Sequence codec round trip on a tracked synthetic sequence."""

import numpy as np

from gscodec_studio_tpu.compression.seq_codec import SeqCodec, have_ffmpeg


def make_frames(rng, T=4, n=1100):
    base = {
        "means": (rng.standard_normal((n, 3)) * 2).astype(np.float32),
        "scales": (-5 + rng.random((n, 3))).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": (3 * rng.random(n)).astype(np.float32),
        "sh0": rng.standard_normal((n, 1, 3)).astype(np.float32),
    }
    frames = []
    for t in range(T):
        f = {k: v.copy() for k, v in base.items()}
        f["means"] = f["means"] + np.array([0.1 * t, 0, 0], np.float32)
        frames.append(f)
    return frames


def test_seq_roundtrip(rng, tmp_path):
    frames = make_frames(rng)
    codec = SeqCodec(backend="pngseq")
    d = str(tmp_path / "seq")
    codec.compress(d, frames)
    out = codec.decompress(d)
    assert len(out) == len(frames)
    side = int(np.floor(np.sqrt(1100)))
    n = side * side
    assert out[0]["means"].shape == (n, 3)
    # Tracked correspondence: frame deltas survive coding.
    d01 = out[1]["means"][:, 0] - out[0]["means"][:, 0]
    assert abs(np.median(d01) - 0.1) < 0.02
    # distribution-level reconstruction for scales
    s_in = np.sort(frames[0]["scales"][:n].reshape(-1))
    s_out = np.sort(out[0]["scales"].reshape(-1))
    # compare matched quantiles (crop differs by opacity ordering)
    q_in = np.quantile(s_in, [0.1, 0.5, 0.9])
    q_out = np.quantile(s_out, [0.1, 0.5, 0.9])
    np.testing.assert_allclose(q_in, q_out, atol=0.06)


def test_stg_png_roundtrip(rng, tmp_path):
    from gscodec_studio_tpu.compression.stg_compression import STGPngCompression

    n = 1100
    splats = {
        "means": (rng.standard_normal((n, 3)) * 2).astype(np.float32),
        "scales": (-5 + rng.random((n, 3))).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": (3 * rng.random(n)).astype(np.float32),
        "trbf_center": rng.random(n).astype(np.float32),
        "trbf_scale": rng.random(n).astype(np.float32),
        "motion": (0.2 * rng.standard_normal((n, 9))).astype(np.float32),
        "omega": (0.1 * rng.standard_normal((n, 4))).astype(np.float32),
        "colors": rng.random((n, 3)).astype(np.float32),
        "features_dir": rng.random((n, 3)).astype(np.float32),
        "features_time": rng.random((n, 3)).astype(np.float32),
    }
    codec = STGPngCompression()
    d = str(tmp_path / "stg")
    codec.compress(d, splats)
    out = codec.decompress(d)
    side = int(np.floor(np.sqrt(n)))
    assert out["motion"].shape == (side * side, 9)
    assert out["means"].shape == (side * side, 3)
    q_in = np.quantile(np.sort(splats["motion"].reshape(-1)), [0.2, 0.8])
    q_out = np.quantile(np.sort(out["motion"].reshape(-1)), [0.2, 0.8])
    np.testing.assert_allclose(q_in, q_out, atol=0.02)


def test_stg_codec_map_kbit_kmeans_npz(rng, tmp_path):
    """The reference's per-attribute codec map (stg_compression.py:47-83):
    k-bit scales/quats, K-means feature banks, npz fallback for attrs
    outside the map."""
    from gscodec_studio_tpu.compression.stg_compression import (
        STGPngCompression,
    )

    n = 700
    splats = {
        "means": (rng.standard_normal((n, 3)) * 2).astype(np.float32),
        "scales": (-5 + rng.random((n, 3))).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": (3 * rng.random(n)).astype(np.float32),
        "motion": (0.2 * rng.standard_normal((n, 9))).astype(np.float32),
        "features_dir": rng.random((n, 3)).astype(np.float32),
        "extra_head": rng.random((n, 5)).astype(np.float32),  # unmapped
    }
    codec = STGPngCompression(quantization=6, use_kmeans=True)
    d = str(tmp_path / "stg_map")
    codec.compress(d, splats)
    import json as _json
    import os as _os

    meta = _json.load(open(_os.path.join(d, "meta.json")))
    assert meta["attrs"]["scales"]["n_bits"] == 6
    assert meta["attrs"]["features_dir"]["kind"] == "kmeans"
    assert meta["attrs"]["extra_head"]["kind"] == "npz"
    out = codec.decompress(d)
    side = meta["side"]
    assert out["extra_head"].shape == (side * side, 5)
    # npz fallback is lossless on the surviving (sorted) rows
    assert set(np.round(out["extra_head"][:, 0], 6)) <= set(
        np.round(splats["extra_head"][:, 0], 6))
    # 6-bit scales still reconstruct distribution-level
    q_in = np.quantile(splats["scales"].reshape(-1), [0.2, 0.8])
    q_out = np.quantile(out["scales"].reshape(-1), [0.2, 0.8])
    np.testing.assert_allclose(q_in, q_out, atol=0.08)
