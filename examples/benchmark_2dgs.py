"""2DGS trainer quality point on the garden stand-in geometry.

The 2DGS analog of examples/garden_benchmark.py (reference context:
simple_trainer_2dgs.py + eval.rst:150-162): ground-truth views come from
the REAL garden SfM cloud rendered with the oracle-verified 3DGS
rasterizer; the 2DGS trainer (surfel splats, normal-consistency +
distortion losses, fused Pallas 2DGS kernels) then fits them from a
jittered SfM init. Reports PSNR/SSIM at >= 512x384.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_views", type=int, default=25)
    p.add_argument("--width", type=int, default=648)
    p.add_argument("--height", type=int, default=420)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--cap", type=int, default=150_000)
    p.add_argument("--init_pts", type=int, default=80_000)
    p.add_argument("--result_dir", default="results/garden_2dgs")
    p.add_argument("--isect_capacity", type=int, default=3 << 20)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from examples.garden_benchmark import build_garden_scene
    from examples.synthetic_benchmark import ListDataset, SceneParser
    from gscodec_studio_tpu.training.trainer_2dgs import Config2DGS, Runner2DGS

    t0 = time.time()
    pts, rgb, views, (W, H) = build_garden_scene(
        args.n_views, args.width, args.height)
    print(json.dumps({"phase": "scene", "views": len(views),
                      "res": [W, H],
                      "secs": round(time.time() - t0, 1)}), flush=True)

    rng = np.random.default_rng(0)
    sel = rng.choice(len(pts), min(args.init_pts, len(pts)), replace=False)
    parser = SceneParser()
    parser.points = (pts[sel] + 0.02 * rng.standard_normal(
        (len(sel), 3)).astype(np.float32))
    parser.points_rgb = (rgb[sel] * 255).astype(np.uint8)
    parser.points_err = np.zeros(len(sel))
    parser.scene_scale = float(np.linalg.norm(
        pts - np.median(pts, 0), axis=1).mean() * 3)

    train_views = ListDataset([v for i, v in enumerate(views) if i % 8 != 0])
    val_views = ListDataset([v for i, v in enumerate(views) if i % 8 == 0])
    cfg = Config2DGS(
        result_dir=args.result_dir, max_steps=args.steps,
        sh_degree=2, sh_degree_interval=max(args.steps // 4, 1),
        strategy="mcmc", mcmc_cap_max=args.cap,
        refine_stop_iter=int(args.steps * 25 / 30),
        isect_capacity=args.isect_capacity,
        steps_per_dispatch=25,
        opacity_reg=0.01, scale_reg=0.01,
        # reference 2DGS loss schedule scaled to the shorter run
        normal_start_iter=args.steps * 7 // 30,
        dist_start_iter=args.steps // 10,
        eval_steps=(args.steps // 2,), save_steps=(),
    )
    runner = Runner2DGS(cfg, parser=parser, trainset=train_views,
                        valset=val_views)
    init_metrics = runner.eval("init")
    print(json.dumps({"phase": "init",
                      **{k: round(v, 3) for k, v in init_metrics.items()}}),
          flush=True)
    t0 = time.time()
    losses = runner.train(log_every=500)
    secs = time.time() - t0
    metrics = runner.eval("final_2dgs")
    result = {
        "phase": "train_2dgs", "steps": args.steps,
        "secs": round(secs, 1),
        "steps_per_sec": round(args.steps / secs, 2),
        "final_loss": round(float(np.nanmean(losses[-50:])), 4),
        "skipped_steps": int(getattr(runner, "_skipped_steps", 0)),
        **{k: round(v, 3) for k, v in metrics.items()},
    }
    print(json.dumps(result), flush=True)
    os.makedirs(args.result_dir, exist_ok=True)
    with open(os.path.join(args.result_dir, "stats.json"), "w") as f:
        json.dump({"train": result, "config": vars(args)}, f, indent=1)


if __name__ == "__main__":
    main()
