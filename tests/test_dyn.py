"""Dynamic (temporal) splats: forward semantics + end-to-end training on a
synthetic moving scene (model: reference simple_trainer_dyngs.py behavior)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.temporal import (
    create_dyn_splats,
    slice_at_time,
    trbf,
    extract_frame,
)
from gscodec_studio_tpu.training.dyn_trainer import DynConfig, DynRunner


def test_slice_semantics(rng):
    pts = rng.random((50, 3)).astype(np.float32)
    splats = create_dyn_splats(pts, cap=50)
    splats["motion"] = splats["motion"].at[:, 0].set(1.0)  # vx = 1
    splats["trbf_center"] = jnp.full((50,), 0.5)

    out, tw = slice_at_time(splats, jnp.asarray(0.75))
    np.testing.assert_allclose(
        np.asarray(out["means"][:, 0]), pts[:, 0] + 0.25, atol=1e-5
    )
    # trbf peaks at the center
    _, tw_peak = slice_at_time(splats, jnp.asarray(0.5))
    assert float(tw_peak.min()) > 0.999
    assert float(tw.max()) < 1.0


def test_extract_frame(rng):
    pts = rng.random((64, 3)).astype(np.float32)
    splats = create_dyn_splats(pts, cap=64, init_opacity=0.5)
    frames = extract_frame(splats, 0.5)
    assert frames["means"].shape[1] == 3
    assert len(frames["means"]) > 0
    assert frames["sh0"].shape[1:] == (1, 3)


class _SyntheticVideo:
    """Moving blobs rendered by the (already-tested) static rasterizer."""

    def __init__(self, rng, n_views=4, n_frames=4, W=48, H=32):
        from gscodec_studio_tpu.models.splats import create_splats
        from gscodec_studio_tpu.models.splats import splat_activations
        from gscodec_studio_tpu.rendering import rasterization

        n = 80
        pts = (rng.random((n, 3), dtype=np.float32) - 0.5) * 2
        gt = create_splats(pts, rng.random((n, 3)).astype(np.float32),
                           cap=n, sh_degree=0, init_opacity=0.8, init_scale=2.5)
        f = 0.9 * W
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        self.samples = []
        vel = np.array([0.4, 0.0, 0.0], np.float32)
        for vi in range(n_views):
            ang = 0.2 * (vi / n_views - 0.5)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = np.array(
                [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                 [-np.sin(ang), 0, np.cos(ang)]], np.float32)
            c2w[:3, 3] = c2w[:3, :3] @ np.array([0, 0, -4.0], np.float32)
            for fi in range(n_frames):
                t = fi / max(n_frames - 1, 1)
                moved = dict(gt)
                moved["means"] = gt["means"] + jnp.asarray(vel) * t
                means, quats, scales, opac = splat_activations(moved)
                colors = jnp.concatenate([moved["sh0"], moved["shN"]], axis=1)
                img, _, _ = rasterization(
                    means, quats, scales, opac, colors,
                    jnp.asarray(np.linalg.inv(c2w))[None], jnp.asarray(K)[None],
                    W, H, sh_degree=0, isect_capacity=8192,
                )
                self.samples.append({
                    "camtoworld": c2w, "K": K, "timestamp": t,
                    "image": np.clip(np.asarray(img[0]), 0, 1),
                })
        self.points = np.asarray(gt["means"]) + 0.05 * rng.standard_normal(
            (n, 3)).astype(np.float32)
        self.rgbs = rng.random((n, 3)).astype(np.float32)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_dyn_training_descends(rng):
    ds = _SyntheticVideo(rng)
    cfg = DynConfig(
        result_dir="/tmp/gsc_dyn_test", max_steps=40, mcmc_cap_max=128,
        isect_capacity=8192, steps_per_dispatch=10,
        color_mode="linear",  # the sandwich default has its own test
        rasterizer="pallas",  # v1 backend: fused is covered by test_raster_v2; interpret-mode v2 is slow in-suite
    )
    runner = DynRunner(cfg, ds.points, ds.rgbs, ds, ds, scene_scale=1.0)
    object.__setattr__(runner.strategy, "refine_start_iter", 1 << 30)
    before = runner.eval()["psnr"]
    losses = runner.train(log_every=0)
    after = runner.eval()["psnr"]
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert after > before, (before, after)


def test_dyn_sandwich_decoder_with_stg_sim(rng):
    """STG path: 9-channel feature render + Sandwich CNN decoder with
    per-pixel rays (simple_trainer_STG.py:531,:580) under the STG
    compression simulation — trains, descends, and updates the decoder."""
    ds = _SyntheticVideo(rng)
    cfg = DynConfig(
        result_dir="/tmp/gsc_dyn_stg_test", max_steps=40, mcmc_cap_max=128,
        isect_capacity=8192, steps_per_dispatch=10,
        color_mode="sandwich", compression_sim=True, entropy_model_opt=True,
        rd_lambda=1e-3, rasterizer="pallas",
    )
    runner = DynRunner(cfg, ds.points, ds.rgbs, ds, ds, scene_scale=1.0)
    object.__setattr__(runner.strategy, "refine_start_iter", 1 << 30)
    w1_before = np.asarray(runner.decoder_params["w1"]).copy()
    losses = runner.train(log_every=0)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert not np.allclose(np.asarray(runner.decoder_params["w1"]), w1_before)
    m = runner.eval()
    assert np.isfinite(m["psnr"])


def test_dyn_stg_strategy(rng):
    """STG strategy drives the dynamic trainer: densify-count budget +
    post-refine omega/rotation gradient freezing (STG_Strategy.py)."""
    ds = _SyntheticVideo(rng)
    cfg = DynConfig(
        result_dir="/tmp/gsc_dyn_stgstrat_test", max_steps=30, capacity=160,
        isect_capacity=8192, steps_per_dispatch=10, strategy="stg",
        color_mode="linear", rasterizer="pallas",
    )
    runner = DynRunner(cfg, ds.points, ds.rgbs, ds, ds, scene_scale=1.0)
    from gscodec_studio_tpu.strategy.stg import STGStrategy

    assert isinstance(runner.strategy, STGStrategy)
    losses = runner.train(log_every=0)
    assert np.all(np.isfinite(losses))
    assert "densify_count" in runner.strategy_state


def test_dyn_render_view_video(rng, tmp_path):
    ds = _SyntheticVideo(rng)
    cfg = DynConfig(
        result_dir=str(tmp_path / "dyn"), max_steps=0, mcmc_cap_max=128,
        isect_capacity=8192, color_mode="linear", rasterizer="pallas",
    )
    runner = DynRunner(cfg, ds.points, ds.rgbs, ds, ds, scene_scale=1.0)
    d = ds[0]
    out = runner.render_view_video(
        d["camtoworld"], d["K"], 40, 32, [0.0, 0.5, 1.0],
        str(tmp_path / "v.mp4"),
    )
    import os

    assert os.path.exists(out)
