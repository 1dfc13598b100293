"""Dynamic-splat stand-in quality/rate point (the video analog of
examples/garden_benchmark.py): a synthetic moving-splat scene built from
the REAL garden SfM geometry, rendered to multiview video, trained with
the dynamic (STG-style) trainer, per-frame extracted, and pushed through
the tracked-sequence codec's rate ladder — emitting the RD table the
reference's video-anchor benchmark produces
(examples/benchmarks/mpeg/video_anchor_bench.sh rp0-rp3).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_dyn_scene(n_views, n_frames, width, height, n_gt=40_000, seed=0):
    """GT = garden-geometry splats with rigid sinusoidal motion on a
    moving subset + slow rotation; views = a camera arc x timestamps."""
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from gscodec_studio_tpu.models.splats import (
        create_splats, splat_activations,
    )
    from gscodec_studio_tpu.rendering import rasterization

    d = np.load("/root/reference/assets/test_garden.npz")
    pts = d["means3d"].astype(np.float32)
    rgb = (d["colors"] / 255.0).astype(np.float32)
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(pts), min(n_gt, len(pts)), replace=False)
    pts, rgb = pts[sel], rgb[sel]
    N = len(pts)

    gt = create_splats(pts, rgb, cap=N, sh_degree=1, init_opacity=0.85,
                       init_scale=1.6, seed=seed)
    gt["scales"] = gt["scales"] + jnp.asarray(
        rng.normal(0.0, 0.3, (N, 3)).astype(np.float32))

    # motion: ~30% of splats translate sinusoidally along a random axis
    moving = rng.random(N) < 0.3
    axis = rng.standard_normal((N, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    amp = (0.15 * rng.random(N) * moving).astype(np.float32)

    vms = d["viewmats"].astype(np.float32)
    K0 = d["Ks"][0].astype(np.float32).copy()
    K0[0] *= width / float(d["width"])
    K0[1] *= height / float(d["height"])
    c2ws = np.linalg.inv(vms)
    centers = c2ws[:, :3, 3]
    target = np.median(pts, axis=0)
    rel = centers - target
    radius = np.linalg.norm(rel[:, [0, 2]], axis=1).mean()
    h = rel[:, 1].mean()

    means0, quats, scales, opac = splat_activations(gt)
    colors = jnp.concatenate([gt["sh0"], gt["shN"]], axis=1)
    render = jax.jit(
        lambda vm, means: rasterization(
            means, quats, scales, opac, colors, vm[None],
            jnp.asarray(K0)[None], width, height, sh_degree=1,
            isect_capacity=1 << 20,
        )[0]
    )
    views = []
    for vi in range(n_views):
        phi = -0.5 + 1.0 * vi / max(n_views - 1, 1)
        eye = target + np.array(
            [radius * np.cos(phi), h, radius * np.sin(phi)], np.float32)
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0, -1, 0], np.float32))
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, eye
        vm = jnp.asarray(np.linalg.inv(c2w))
        for fi in range(n_frames):
            t = fi / max(n_frames - 1, 1)
            disp = (amp * np.sin(2 * np.pi * t))[:, None] * axis
            means_t = means0 + jnp.asarray(disp)
            img = render(vm, means_t)
            views.append({
                "camtoworld": c2w, "K": K0,
                "image": np.clip(np.asarray(img[0]), 0, 1),
                "timestamp": np.float32(t),
                "image_id": len(views),
            })
    return pts, rgb, views


class _ListDS:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_views", type=int, default=10)
    p.add_argument("--n_frames", type=int, default=20)
    p.add_argument("--width", type=int, default=648)
    p.add_argument("--height", type=int, default=420)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--cap", type=int, default=120_000)
    p.add_argument("--color_mode", default="sandwich")
    p.add_argument("--strategy", default="modified_stg")
    p.add_argument("--rate_points", nargs="*", default=["rp0", "rp2", "rp3"])
    p.add_argument("--result_dir", default="results/dyn_stand_in")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gscodec_studio_tpu.training.dyn_trainer import DynConfig, DynRunner

    t0 = time.time()
    pts, rgb, views = build_dyn_scene(
        args.n_views, args.n_frames, args.width, args.height)
    print(json.dumps({"phase": "scene", "views": len(views),
                      "secs": round(time.time() - t0, 1)}), flush=True)

    rng = np.random.default_rng(0)
    hold = max(args.n_views // 5, 1)
    per_view = args.n_frames
    test_idx = set()
    for vi in range(0, args.n_views, 5):
        test_idx.update(range(vi * per_view, (vi + 1) * per_view))
    train_v = [v for i, v in enumerate(views) if i not in test_idx]
    val_v = [v for i, v in enumerate(views) if i in test_idx][::4]

    sel = rng.choice(len(pts), min(60_000, len(pts)), replace=False)
    init_pts = pts[sel] + 0.02 * rng.standard_normal(
        (len(sel), 3)).astype(np.float32)

    cfg = DynConfig(
        result_dir=args.result_dir, max_steps=args.steps,
        strategy=args.strategy, capacity=args.cap, mcmc_cap_max=args.cap,
        refine_stop_iter=int(args.steps * 25 / 30),
        color_mode=args.color_mode, compression_sim=True,
        entropy_model_opt=True, rd_lambda=0.01,
        steps_per_dispatch=10,
    )
    runner = DynRunner(cfg, init_pts, rgb[sel] / 1.0, _ListDS(train_v),
                       _ListDS(val_v), scene_scale=3.0)
    t0 = time.time()
    runner.train(log_every=500)
    train_secs = time.time() - t0
    metrics = runner.eval()
    result = {"phase": "train", "steps": args.steps,
              "secs": round(train_secs, 1),
              **{k: round(v, 3) for k, v in metrics.items()}}
    print(json.dumps(result), flush=True)
    os.makedirs(args.result_dir, exist_ok=True)

    # per-frame extraction -> tracked-sequence codec rate ladder
    from gscodec_studio_tpu.utils.ply import save_ply

    ply_dir = os.path.join(args.result_dir, "frames")
    os.makedirs(ply_dir, exist_ok=True)
    frames = runner.export_frames(np.linspace(0.0, 1.0, args.n_frames))
    for i, fr in enumerate(frames):
        n = len(fr["means"])
        save_ply(os.path.join(ply_dir, f"frame_{i:04d}.ply"), {
            "means": np.asarray(fr["means"]),
            "scales": np.asarray(fr["scales"]),
            "quats": np.asarray(fr["quats"]),
            "opacities": np.asarray(fr["opacities"]).reshape(-1),
            "sh0": np.asarray(fr.get("sh0", np.zeros((n, 1, 3)))).reshape(n, 1, 3),
            "shN": np.asarray(fr.get("shN", np.zeros((n, 0, 3)))).reshape(n, -1, 3),
        })
    print(f"exported {len(frames)} frame plys", flush=True)

    # Run the codec ladder IN-PROCESS: a subprocess would deadlock on
    # the single-tenant TPU relay (this process holds a live TPU
    # context while blocking on the child, the child blocks on the
    # chip). Observed live in round 4 — see benchmarks/r4_queue4.sh.
    from examples.compress_ply_sequence import main as codec_main

    argv, sys.argv = sys.argv, [
        "compress_ply_sequence.py",
        "--ply_dir", ply_dir,
        "--output_dir", os.path.join(args.result_dir, "seq_codec"),
        "--rate_points", *args.rate_points,
        "--eval_views", "3", "--eval_width", str(args.width // 2),
        "--eval_height", str(args.height // 2),
        "--eval_frame_stride", "4",
    ]
    try:
        # Tolerate codec failure (ADVICE r4): the rd_table assembly and
        # the already-computed train row must be written even if a rate
        # point dies (empty ply dir SystemExit, bad rate point, OOM).
        codec_main()
    except (Exception, SystemExit):
        import traceback

        traceback.print_exc()
    finally:
        sys.argv = argv

    rows = [result]
    for rp in args.rate_points:
        sp = os.path.join(args.result_dir, "seq_codec", rp, "stats.json")
        if os.path.exists(sp):
            rows.append(json.load(open(sp)))
    with open(os.path.join(args.result_dir, "rd_table.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows[-1]) if rows else "no codec rows", flush=True)


if __name__ == "__main__":
    main()
