"""End-to-end training benchmark on a synthetic multiview scene.

Builds a ground-truth splat scene, renders target views with the (tested)
rasterizer, trains a fresh model from jittered points through the full
pipeline (densification, scan-batched dispatches), then evals PSNR/SSIM and
runs the PNG codec. Prints one JSON line per phase. This is the standalone
stand-in for real-scene benchmarks while the environment has no dataset
access (see ROADMAP.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scene(rng, n_gauss, n_views, width, height, gt_scale=1.2):
    import jax

    # The container sitecustomize force-registers the axon TPU plugin and
    # can override JAX_PLATFORMS; honor the env explicitly so CPU runs
    # don't touch (or hang on) the TPU relay.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from gscodec_studio_tpu.models.splats import (
        create_splats, splat_activations, rgb_to_sh,
    )
    from gscodec_studio_tpu.rendering import rasterization

    # Structured GT: textured ground plane + clustered blobs.
    n_ground = n_gauss // 2
    gx = rng.random(n_ground, dtype=np.float32) * 8 - 4
    gz = rng.random(n_ground, dtype=np.float32) * 8 - 4
    ground = np.stack([gx, 0.8 + 0.02 * np.sin(3 * gx) * np.cos(3 * gz), gz], 1)
    n_blob = n_gauss - n_ground
    centers = (rng.random((8, 3), np.float32) - 0.5) * np.array([5, 1.2, 5])
    blob = (
        centers[rng.integers(0, 8, n_blob)]
        + 0.35 * rng.standard_normal((n_blob, 3)).astype(np.float32)
    )
    pts = np.concatenate([ground, blob]).astype(np.float32)
    rgb = np.clip(
        0.5 + 0.5 * np.sin(pts * np.array([2.1, 5.3, 3.7]) + np.arange(3)), 0, 1
    ).astype(np.float32)
    gt = create_splats(pts, rgb, cap=n_gauss, sh_degree=1, init_opacity=0.85,
                       init_scale=gt_scale)

    f = 0.85 * width
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    views = []
    means, quats, scales, opac = splat_activations(gt)
    colors = jnp.concatenate([gt["sh0"], gt["shN"]], axis=1)
    # scene arrays as jit ARGUMENTS (relay re-stages captured constants)
    render = jax.jit(
        lambda vm, means, quats, scales, opac, colors, Kd: rasterization(
            means, quats, scales, opac, colors, vm[None],
            Kd[None], width, height, sh_degree=1,
            isect_capacity=1 << 21,
        )[0]
    )
    Kd = jnp.asarray(K)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        c2w[:3, 3] = c2w[:3, :3] @ np.array([0, -0.8, -7.5], np.float32)
        img = render(jnp.asarray(np.linalg.inv(c2w)), means, quats,
                     scales, opac, colors, Kd)
        views.append({
            "camtoworld": c2w, "K": K,
            "image": np.clip(np.asarray(img[0]), 0, 1),
        })
    return pts, rgb, views


class ListDataset:
    def __init__(self, views):
        self.views = views

    def __len__(self):
        return len(self.views)

    def __getitem__(self, i):
        d = dict(self.views[i])
        d["image_id"] = i
        return d


class SceneParser:
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_gauss", type=int, default=50_000)
    p.add_argument("--n_views", type=int, default=48)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--strategy", default="mcmc")
    p.add_argument("--cap", type=int, default=100_000)
    p.add_argument("--result_dir", default="/tmp/synth_bench")
    p.add_argument("--overfit", action="store_true",
                   help="eval on the training views (fit capacity test)")
    p.add_argument("--no_refine", action="store_true")
    p.add_argument("--sh_degree", type=int, default=1)
    p.add_argument("--rasterizer", default="fused")
    p.add_argument("--gt_scale", type=float, default=1.2)
    p.add_argument("--ssim_lambda", type=float, default=0.2)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from gscodec_studio_tpu.training.trainer import Config, Runner

    rng = np.random.default_rng(0)
    t0 = time.time()
    pts, rgb, views = build_scene(
        rng, args.n_gauss, args.n_views, args.width, args.height,
        gt_scale=args.gt_scale,
    )
    print(json.dumps({"phase": "scene", "views": len(views),
                      "secs": round(time.time() - t0, 1)}), flush=True)

    parser = SceneParser()
    parser.points = pts + 0.03 * rng.standard_normal(pts.shape).astype(np.float32)
    parser.points_rgb = (rgb * 255).astype(np.uint8)
    parser.points_err = np.zeros(len(pts))
    parser.scene_scale = 6.0

    # Interleaved split (every 8th view held out, mip-360 convention) — a
    # contiguous held-out arc would measure extrapolation, not fit.
    train_views = ListDataset(
        [v for i, v in enumerate(views) if i % 8 != 0]
    )
    val_views = ListDataset([v for i, v in enumerate(views) if i % 8 == 0])
    if args.overfit:
        val_views = train_views
    cfg = Config(
        result_dir=args.result_dir, max_steps=args.steps,
        sh_degree=args.sh_degree,
        sh_degree_interval=500, strategy=args.strategy,
        mcmc_cap_max=args.cap, capacity=args.cap,
        isect_capacity=1 << 21, steps_per_dispatch=25,
        opacity_reg=0.01 if args.strategy == "mcmc" else 0.0,
        scale_reg=0.01 if args.strategy == "mcmc" else 0.0,
        rasterizer=args.rasterizer,
        ssim_lambda=args.ssim_lambda,
    )
    runner = Runner(cfg, parser=parser, trainset=train_views, valset=val_views)
    if args.no_refine:
        object.__setattr__(runner.strategy, "refine_start_iter", 1 << 30)

    init_metrics = runner.eval("init")
    print(json.dumps({"phase": "init",
                      **{k: round(v, 3) for k, v in init_metrics.items()}}),
          flush=True)

    t0 = time.time()
    losses = runner.train(log_every=500)
    train_secs = time.time() - t0
    metrics = runner.eval("synth")
    print(json.dumps({
        "phase": "train", "steps": args.steps,
        "secs": round(train_secs, 1),
        "steps_per_sec": round(args.steps / train_secs, 2),
        "final_loss": round(float(np.mean(losses[-50:])), 4),
        **{k: round(v, 3) for k, v in metrics.items()},
    }), flush=True)

    t0 = time.time()
    comp = runner.run_compression(args.steps, method="png")
    print(json.dumps({
        "phase": "compression",
        "secs": round(time.time() - t0, 1),
        **{k: round(v, 3) if isinstance(v, float) else v
           for k, v in comp.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
