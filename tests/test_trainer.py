"""End-to-end training integration test: fit splats to views rendered from a
known ground-truth splat set (no external data needed). The CPU analog of
running simple_trainer on a scene — asserts optimization actually works
through the full jitted pipeline (projection -> binning -> Pallas rasterizer
-> loss -> backward -> Adam -> densification)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import create_splats, splat_activations
from gscodec_studio_tpu.rendering import rasterization
from gscodec_studio_tpu.training.trainer import Config, Runner
from gscodec_studio_tpu.training.losses import psnr


class FakeParser:
    """Synthetic scene: GT splats rendered from a ring of cameras."""

    def __init__(self, rng, n_views=6, width=64, height=48, n_gt=120):
        self.width, self.height = width, height
        gt_pts = (rng.random((n_gt, 3), dtype=np.float32) - 0.5) * 2
        gt_rgb = rng.random((n_gt, 3)).astype(np.float32)
        gt = create_splats(gt_pts, gt_rgb, cap=n_gt, sh_degree=0,
                           init_opacity=0.8, init_scale=2.0)
        self.points = gt_pts + 0.05 * rng.standard_normal((n_gt, 3)).astype(
            np.float32
        )
        self.points_rgb = (gt_rgb * 255).astype(np.uint8)
        self.points_err = np.zeros(n_gt)
        self.scene_scale = 1.5

        f = 0.9 * width
        K = np.array(
            [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32
        )
        self.camtoworlds = []
        self.Ks = []
        self.images = []
        means, quats, scales, opac = splat_activations(gt)
        colors = jnp.concatenate([gt["sh0"], gt["shN"]], axis=1)
        for i in range(n_views):
            ang = 0.25 * (i / n_views - 0.5)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = np.array(
                [
                    [np.cos(ang), 0, np.sin(ang)],
                    [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)],
                ],
                np.float32,
            )
            c2w[:3, 3] = c2w[:3, :3] @ np.array([0, 0, -4.0], np.float32)
            viewmat = jnp.asarray(np.linalg.inv(c2w))[None]
            img, _, _ = rasterization(
                means, quats, scales, opac, colors, viewmat,
                jnp.asarray(K)[None], width, height, sh_degree=0,
                isect_capacity=8192,
            )
            self.camtoworlds.append(c2w)
            self.Ks.append(K)
            self.images.append(np.clip(np.asarray(img[0]), 0, 1))
        self.camtoworlds = np.stack(self.camtoworlds)


class FakeDataset:
    def __init__(self, parser, split="train"):
        self.parser = parser
        n = len(parser.images)
        idx = np.arange(n)
        self.indices = idx[: n - 1] if split == "train" else idx[n - 1 :]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        idx = int(self.indices[i])
        p = self.parser
        return {
            "K": p.Ks[idx],
            "camtoworld": p.camtoworlds[idx],
            "image": p.images[idx],
            "image_id": idx,
        }


@pytest.mark.parametrize("strategy", ["default", "mcmc"])
def test_training_improves_psnr(rng, strategy):
    parser = FakeParser(rng)
    cfg = Config(
        result_dir="/tmp/gsc_test_run",
        max_steps=60,
        sh_degree=0,
        sh_degree_interval=1,
        strategy=strategy,
        mcmc_cap_max=256,
        capacity=256,
        isect_capacity=8192,
        rasterizer="pallas",  # v1 backend: fused is covered by test_raster_v2; interpret-mode v2 is slow in-suite
    )
    runner = Runner(
        cfg,
        parser=parser,
        trainset=FakeDataset(parser, "train"),
        valset=FakeDataset(parser, "val"),
    )
    # Force a couple of refine rounds within the short run.
    object.__setattr__(runner.strategy, "refine_start_iter", 10)
    object.__setattr__(runner.strategy, "refine_every", 20)

    before = runner.eval("before")["psnr"]
    losses = runner.train(log_every=0)
    after = runner.eval("after")["psnr"]
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert after > before + 1.0, (before, after)


def test_training_mesh_sharded(rng):
    """8-device CPU-mesh training: gaussian-sharded shard_map step on the
    fused v2 backend with the bucketed visibility exchange. Asserts the
    loss optimizes and params stay finite across refine boundaries."""
    parser = FakeParser(rng, n_views=9, width=64, height=48)
    cfg = Config(
        result_dir="/tmp/gsc_test_mesh",
        max_steps=40,
        batch_size=8,
        sh_degree=0,
        sh_degree_interval=1,
        strategy="mcmc",
        mcmc_cap_max=256,
        isect_capacity=8192,
        steps_per_dispatch=10,
        mesh_devices=8,
        exchange_cap=64,
        cutoff_mode="exact",
    )
    runner = Runner(
        cfg,
        parser=parser,
        trainset=FakeDataset(parser, "train"),
        valset=FakeDataset(parser, "val"),
    )
    assert runner.splats["means"].shape[0] % 8 == 0
    losses = runner.train(log_every=0)
    assert np.all(np.isfinite(np.asarray(losses)))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    after = runner.eval("mesh_after")["psnr"]
    assert np.isfinite(after)


def test_training_mesh_aux_modules(rng):
    """Mesh mode trains the replicated aux modules (pose deltas, appearance
    MLP, bilateral grid, depth supervision) like the reference trains them
    under DDP (simple_trainer.py:651-652): aux grads are psum'd so every
    device applies the identical full-batch update, and per-image
    quantities (bilagrid idx, depth tracks, targets) are sliced to the
    device's cameras."""
    parser = FakeParser(rng, n_views=9, width=64, height=48)
    cfg = Config(
        result_dir="/tmp/gsc_test_mesh_aux",
        max_steps=20,
        batch_size=8,
        sh_degree=0,
        sh_degree_interval=1,
        strategy="mcmc",
        mcmc_cap_max=256,
        isect_capacity=8192,
        steps_per_dispatch=10,
        mesh_devices=8,
        exchange_cap=64,
        cutoff_mode="exact",
        pose_opt=True,
        app_opt=True,
        use_bilateral_grid=True,
        bilagrid_shape=(4, 4, 4),
        depth_loss=True,  # no tracks in the fake data -> masked-out term,
        # but the mesh RGB+ED render + per-device slicing is exercised
    )
    runner = Runner(
        cfg,
        parser=parser,
        trainset=FakeDataset(parser, "train"),
        valset=FakeDataset(parser, "val"),
    )
    losses = runner.train(log_every=0)
    assert np.all(np.isfinite(np.asarray(losses)))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    for k in ("pose", "app_embeds", "app_mlp", "bilagrid"):
        assert k in runner.aux_params, k
        for leaf in jax.tree_util.tree_leaves(runner.aux_params[k]):
            assert np.all(np.isfinite(np.asarray(leaf))), k
    # pose deltas actually moved (psum'd grads reached the replicated tree)
    assert float(jnp.abs(runner.aux_params["pose"]).max()) > 0.0


def test_nonfinite_steps_rejected(rng):
    """The finite-step gate: steps whose loss/grads are non-finite are
    rejected wholesale (state carried unchanged, counted in
    _skipped_steps) instead of poisoning the model."""
    parser = FakeParser(rng)
    # poison one training view with NaNs
    parser.images[1] = np.full_like(parser.images[1], np.nan)
    cfg = Config(
        result_dir="/tmp/gsc_test_gate",
        max_steps=40,
        sh_degree=0,
        sh_degree_interval=1,
        strategy="mcmc",
        mcmc_cap_max=256,
        capacity=256,
        isect_capacity=8192,
        steps_per_dispatch=10,
        rasterizer="pallas",
    )
    runner = Runner(
        cfg,
        parser=parser,
        trainset=FakeDataset(parser, "train"),
        valset=FakeDataset(parser, "val"),
    )
    losses = np.asarray(runner.train(log_every=0))
    assert getattr(runner, "_skipped_steps", 0) > 0
    # every poisoned step shows as NaN loss but the model stays finite
    assert np.isnan(losses).any()
    for k, v in runner.splats.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # the clean steps still optimized
    clean = losses[~np.isnan(losses)]
    assert np.mean(clean[-5:]) < np.mean(clean[:5])
