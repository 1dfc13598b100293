"""Self-consistency diagnostics for the garden stand-in quality ceiling.

The stand-in GT is *rendered from a known splat model* (139k Gaussians,
examples/garden_benchmark.build_garden_scene), so the training signal is
realizable by construction — any hard PSNR ceiling is a property of the
pipeline, not the data. This script isolates where the round-4 20.9 dB
plateau comes from, one leg at a time:

  oracle   Load the EXACT GT parameters into the trainer and eval without
           training. Measures the render-settings mismatch floor between
           the GT generator (rasterization() defaults: exact cutoff) and
           the trainer's production render path (cfg.cutoff_mode, packed
           dtypes). Must be ~inf (>=50 dB) or the eval path itself is
           biased.
  gttrain  Init at the exact GT parameters, then TRAIN (no strategy
           refinement, no compression sim). PSNR must stay high; a
           collapse implicates the train step itself (loss, regs, noise,
           optimizer) rather than densification.
  gtfit    Init at the GT means+colors (exact positions, default
           scales/opacity, zero shN) at cap = GT count; no refinement, no
           sim. The optimizer must recover the remaining per-splat
           parameters to >=30-35 dB (VERDICT r4 item 1 step A).
  sfm      SfM-style init (jittered subsample) with a chosen strategy and
           cap — the production recipe minus the knob under test
           (VERDICT r4 item 1 step B). Use --strategy/--opacity_reg/...
           to reintroduce knobs one at a time.

Each leg prints one JSON line and appends it to --out.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from examples.garden_benchmark import build_garden_scene
from examples.synthetic_benchmark import ListDataset, SceneParser


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--leg", required=True,
                   choices=["oracle", "gttrain", "gtfit", "sfm"])
    p.add_argument("--n_views", type=int, default=25)
    p.add_argument("--width", type=int, default=648)
    p.add_argument("--height", type=int, default=420)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--cap", type=int, default=360_000)  # sfm leg only
    p.add_argument("--init_pts", type=int, default=100_000)  # sfm leg only
    p.add_argument("--strategy", default="none",
                   choices=["none", "default", "mcmc"])
    p.add_argument("--opacity_reg", type=float, default=0.0)
    p.add_argument("--scale_reg", type=float, default=0.0)
    p.add_argument("--compression_sim", action="store_true")
    p.add_argument("--rd_lambda", type=float, default=0.01)
    p.add_argument("--cutoff_mode", default="soft",
                   choices=["soft", "exact"])
    p.add_argument("--steps_per_dispatch", type=int, default=25)
    p.add_argument("--isect_capacity", type=int, default=6 << 20)
    p.add_argument("--result_dir", default="results/self_fit")
    p.add_argument("--out", default="results/self_fit/legs.jsonl")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tag", default="")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gscodec_studio_tpu.training.trainer import Config, Runner

    t0 = time.time()
    pts, rgb, views, (W, H), gt = build_garden_scene(
        args.n_views, args.width, args.height, return_gt=True)
    n_gt = len(pts)
    print(json.dumps({"phase": "scene", "views": len(views),
                      "res": [W, H], "gt_points": n_gt,
                      "secs": round(time.time() - t0, 1)}), flush=True)

    rng = np.random.default_rng(0)
    parser = SceneParser()
    scene_scale = float(np.linalg.norm(
        pts - np.median(pts, 0), axis=1).mean() * 3)
    parser.scene_scale = scene_scale

    gt_legs = args.leg in ("oracle", "gttrain", "gtfit")
    if gt_legs:
        parser.points = pts.astype(np.float32)  # exact GT positions
        parser.points_rgb = (rgb * 255).astype(np.uint8)
        cap = n_gt
        sh_degree = 2  # the GT model's degree
        strategy = "default"
    else:
        sel = rng.choice(len(pts), min(args.init_pts, len(pts)),
                         replace=False)
        parser.points = (pts[sel] + 0.02 * rng.standard_normal(
            (len(sel), 3)).astype(np.float32))
        parser.points_rgb = (rgb[sel] * 255).astype(np.uint8)
        cap = args.cap
        sh_degree = 3
        strategy = args.strategy if args.strategy != "none" else "default"
    parser.points_err = np.zeros(len(parser.points))

    train_views = ListDataset(
        [v for i, v in enumerate(views) if i % 8 != 0])
    val_views = ListDataset([v for i, v in enumerate(views) if i % 8 == 0])
    no_refine = args.leg != "sfm" or args.strategy == "none"
    cfg = Config(
        result_dir=args.result_dir, max_steps=args.steps,
        sh_degree=sh_degree,
        sh_degree_interval=1 if gt_legs else max(args.steps // 6, 1),
        strategy=strategy,
        mcmc_cap_max=cap, capacity=cap,
        refine_start_iter=(args.steps + 1) if no_refine else None,
        refine_stop_iter=None if no_refine
        else int(args.steps * 25 / 30),
        isect_capacity=args.isect_capacity,
        steps_per_dispatch=args.steps_per_dispatch,
        opacity_reg=args.opacity_reg, scale_reg=args.scale_reg,
        compression_sim=args.compression_sim,
        entropy_model_opt=args.compression_sim,
        shN_ada_mask_opt=args.compression_sim,
        rd_lambda=args.rd_lambda,
        cutoff_mode=args.cutoff_mode,
        seed=args.seed,
    )
    runner = Runner(cfg, parser=parser, trainset=train_views,
                    valset=val_views)

    if args.leg in ("oracle", "gttrain"):
        # overwrite the trainer state with the exact GT parameters
        assert all(
            runner.splats[k].shape == gt[k].shape for k in gt
        ), {k: (runner.splats[k].shape, gt[k].shape) for k in gt}
        runner.splats = {k: jnp.asarray(v) for k, v in gt.items()}

    row = {"leg": args.leg, "tag": args.tag, "strategy": args.strategy,
           "cap": cap, "steps": 0, "res": [W, H],
           "views": args.n_views,
           "opacity_reg": args.opacity_reg, "scale_reg": args.scale_reg,
           "compression_sim": bool(args.compression_sim),
           "cutoff_mode": args.cutoff_mode}

    init_metrics = runner.eval("init")
    row["init"] = {k: round(v, 3) for k, v in init_metrics.items()}
    print(json.dumps({"phase": "init", **row["init"]}), flush=True)

    if args.leg != "oracle":
        t0 = time.time()
        losses = runner.train(log_every=250)
        secs = time.time() - t0
        metrics = runner.eval(args.leg)
        row.update({
            "steps": args.steps, "secs": round(secs, 1),
            "steps_per_sec": round(args.steps / secs, 2),
            "final_loss": round(float(np.nanmean(losses[-50:])), 4),
            "skipped_steps": int(getattr(runner, "_skipped_steps", 0)),
            **{k: round(v, 3) for k, v in metrics.items()},
        })

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
