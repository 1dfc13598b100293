"""PLY interchange + checkpoint + run_compression round trips."""

import numpy as np
import pytest

from gscodec_studio_tpu.utils.ply import save_ply, load_ply


def test_ply_roundtrip(rng, tmp_path):
    n = 100
    splats = {
        "means": rng.standard_normal((n, 3)).astype(np.float32),
        "scales": rng.standard_normal((n, 3)).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": rng.standard_normal(n).astype(np.float32),
        "sh0": rng.standard_normal((n, 1, 3)).astype(np.float32),
        "shN": rng.standard_normal((n, 15, 3)).astype(np.float32),
    }
    p = str(tmp_path / "test.ply")
    save_ply(p, splats)
    out = load_ply(p)
    for k in splats:
        np.testing.assert_allclose(out[k], splats[k], rtol=1e-6, err_msg=k)


def test_ply_reads_reference_layout(tmp_path):
    """The reference's export lists f_rest channel-major — ensure a ply we
    write is self-consistent with that convention by checking a known
    coefficient lands in the right slot."""
    n, k1 = 4, 15
    splats = {
        "means": np.zeros((n, 3), np.float32),
        "scales": np.zeros((n, 3), np.float32),
        "quats": np.zeros((n, 4), np.float32),
        "opacities": np.zeros(n, np.float32),
        "sh0": np.zeros((n, 1, 3), np.float32),
        "shN": np.zeros((n, k1, 3), np.float32),
    }
    splats["shN"][0, 2, 1] = 7.0  # coeff 2, channel G
    p = str(tmp_path / "conv.ply")
    save_ply(p, splats)
    # channel-major: f_rest index = channel * k1 + coeff = 1*15+2 = 17
    import re

    with open(p, "rb") as f:
        header = f.read(4096).decode("ascii", "ignore")
    props = re.findall(r"property float (\S+)", header)
    data = load_ply(p)
    assert data["shN"][0, 2, 1] == 7.0
    assert props.index("f_rest_17") > 0


def test_runner_checkpoint_and_compression(rng, tmp_path):
    """Full Runner round trip: train briefly -> ckpt save/load -> PNG codec
    compress/decompress/eval (simple_trainer.py run_compression:1368-1399)."""
    import jax.numpy as jnp
    from tests.test_trainer import FakeParser, FakeDataset
    from gscodec_studio_tpu.training.trainer import Config, Runner

    parser = FakeParser(rng, n_views=4, width=48, height=32, n_gt=100)
    cfg = Config(
        result_dir=str(tmp_path / "run"), max_steps=20, sh_degree=0,
        sh_degree_interval=1, capacity=128, isect_capacity=8192,
        steps_per_dispatch=10,
        rasterizer="pallas",  # v1 backend: fused is covered by test_raster_v2; interpret-mode v2 is slow in-suite
    )
    runner = Runner(cfg, parser=parser, trainset=FakeDataset(parser, "train"),
                    valset=FakeDataset(parser, "val"))
    object.__setattr__(runner.strategy, "refine_start_iter", 1 << 30)
    runner.train(log_every=0)

    runner.save_checkpoint(20)
    before = np.asarray(runner.splats["means"]).copy()
    runner.splats["means"] = jnp.zeros_like(runner.splats["means"])
    step = runner.load_checkpoint(str(tmp_path / "run/ckpts/ckpt_20.npz"))
    assert step == 20
    np.testing.assert_allclose(np.asarray(runner.splats["means"]), before)

    runner.save_ply(str(tmp_path / "run/out.ply"))
    metrics = runner.run_compression(20, method="png")
    assert metrics["size_bytes"] > 0
    assert np.isfinite(metrics["psnr"])
    # compressed render quality within a few dB of the uncompressed one
    base = runner.eval("base")
    assert metrics["psnr"] > base["psnr"] - 6.0, (metrics, base)
