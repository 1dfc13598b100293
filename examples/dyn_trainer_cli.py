"""Dynamic-splat trainer CLI on INVR (Blender-json multiview video),
Neural3D and Technicolor (per-frame-COLMAP video) — the equivalent of the reference's simple_trainer_dyngs.py /
simple_trainer_STG.py entry points: trains temporal splats (optionally
with the Sandwich CNN decoder + STG strategy + STG compression
simulation), evaluates, exports per-frame .ply for the sequence codec,
and writes a per-view eval video."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--data-type", default="invr",
                   choices=["invr", "n3d", "technicolor"],
                   help="invr = Blender-json multiview video; n3d / "
                        "technicolor = per-frame-COLMAP STG layouts")
    p.add_argument("--start-frame", type=int, default=0)
    p.add_argument("--duration", type=int, default=50)
    p.add_argument("--result-dir", default="results/dyn")
    p.add_argument("--factor", type=int, default=2)
    p.add_argument("--max-steps", type=int, default=30_000)
    p.add_argument("--cap-max", type=int, default=200_000)
    p.add_argument("--strategy", default="mcmc",
                   choices=["mcmc", "default", "stg", "modified_stg"])
    p.add_argument("--color-mode", default="sandwich",
                   choices=["rgb", "linear", "sandwich"])
    p.add_argument("--compression-sim", action="store_true")
    p.add_argument("--entropy-model-opt", action="store_true")
    p.add_argument("--rd-lambda", type=float, default=1e-2)
    p.add_argument("--init-points", type=int, default=100_000)
    p.add_argument("--export-frames", type=int, default=0,
                   help="per-frame .ply count for the sequence codec")
    p.add_argument("--eval-video", action="store_true")
    p.add_argument("--eval-video-frames", type=int, default=60)
    p.add_argument("--rasterizer", default="fused",
                   choices=["fused", "pallas", "reference"])
    p.add_argument("--steps-per-dispatch", type=int, default=10)
    p.add_argument("--isect-capacity", type=int, default=None)
    args = p.parse_args()

    import jax

    # The container sitecustomize force-registers the axon TPU plugin and
    # can override JAX_PLATFORMS; honor the env explicitly so CPU runs
    # don't touch (or hang on) the TPU relay.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gscodec_studio_tpu.datasets.invr import INVRDataset, INVRParser
    from gscodec_studio_tpu.training.dyn_trainer import DynConfig, DynRunner
    from gscodec_studio_tpu.utils.ply import save_ply

    if args.data_type in ("n3d", "technicolor"):
        from gscodec_studio_tpu.datasets.stg_readers import (
            STGDataset, STGParser,
        )

        train_parser = STGParser(
            args.data_dir, dataset_type=args.data_type,
            start=args.start_frame, duration=args.duration,
            split="train", factor=args.factor,
        )
        val_parser = STGParser(
            args.data_dir, dataset_type=args.data_type,
            start=args.start_frame, duration=args.duration,
            split="test", factor=args.factor,
        )
        trainset = STGDataset(train_parser)
        valset = STGDataset(val_parser if val_parser.views else train_parser)
    else:
        train_parser = INVRParser(args.data_dir, "train", factor=args.factor)
        try:
            val_parser = INVRParser(args.data_dir, "val", factor=args.factor)
        except FileNotFoundError:
            val_parser = train_parser
        trainset = INVRDataset(train_parser)
        valset = INVRDataset(val_parser)

    if train_parser.points is not None:
        points = train_parser.points
        rgbs = train_parser.points_rgb / 255.0
    else:
        rng = np.random.default_rng(0)
        # random-in-view init when the dataset ships no sparse cloud
        frames = getattr(train_parser, "frames", None) or getattr(
            train_parser, "views"
        )
        centers = np.stack([f["camtoworld"][:3, 3] for f in frames])
        c0 = centers.mean(axis=0)
        r = max(np.linalg.norm(centers - c0, axis=1).mean() * 2.0, 1.0)
        points = (
            c0 + r * (rng.random((args.init_points, 3)) * 2 - 1)
        ).astype(np.float32)
        rgbs = rng.random((args.init_points, 3)).astype(np.float32)

    cfg = DynConfig(
        result_dir=args.result_dir, max_steps=args.max_steps,
        strategy=args.strategy, mcmc_cap_max=args.cap_max,
        capacity=args.cap_max, color_mode=args.color_mode,
        compression_sim=args.compression_sim,
        entropy_model_opt=args.entropy_model_opt,
        rd_lambda=args.rd_lambda,
        rasterizer=args.rasterizer,
        steps_per_dispatch=args.steps_per_dispatch,
        isect_capacity=args.isect_capacity,
    )
    runner = DynRunner(cfg, points, rgbs, trainset, valset,
                       scene_scale=1.0)
    t0 = time.time()
    losses = runner.train(log_every=500)
    metrics = runner.eval()
    out = {
        "steps": args.max_steps, "secs": round(time.time() - t0, 1),
        "final_loss": round(float(np.mean(losses[-50:])), 4),
        **{k: round(v, 3) for k, v in metrics.items()},
    }
    print(json.dumps(out), flush=True)
    os.makedirs(args.result_dir, exist_ok=True)
    with open(os.path.join(args.result_dir, "stats.json"), "w") as f:
        json.dump(out, f)

    if args.export_frames:
        ts = np.linspace(0.0, 1.0, args.export_frames)
        frames = runner.export_frames(ts)
        ply_dir = os.path.join(args.result_dir, "ply_seq")
        os.makedirs(ply_dir, exist_ok=True)
        for i, fr in enumerate(frames):
            save_ply(os.path.join(ply_dir, f"frame_{i:04d}.ply"), fr)
        print(f"exported {len(frames)} frames to {ply_dir}")

    if args.eval_video:
        d = valset[0]
        h, w = d["image"].shape[:2]
        out_path = runner.render_view_video(
            d["camtoworld"], d["K"], w, h,
            np.linspace(0, 1, args.eval_video_frames),
            os.path.join(args.result_dir, "eval_view0.mp4"),
        )
        print(f"eval video: {out_path}")


if __name__ == "__main__":
    main()
