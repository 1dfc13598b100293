"""Full-resolution quality benchmark on the real `garden` SfM geometry.

The environment has no image datasets (zero egress), so this is the
documented realistic stand-in for the MipNeRF360 quality runs
(BASELINE.md): the ground-truth model is built from the REAL garden
COLMAP point cloud + camera intrinsics shipped with the reference
(/root/reference/assets/test_garden.npz: 138k SfM points, 1297x840
cameras), with kNN-sized anisotropic splats, per-splat randomized
opacity/orientation and SH view dependence. Ground-truth views are
rendered with the (oracle-verified) rasterizer along an arc through the
real camera poses; training then starts from a jittered subsample of the
same SfM cloud, exactly like the reference's SfM init, and runs the full
production pipeline (MCMC densification to cap, optional compression
simulation with entropy models + adaptive SH mask, PNG codec round-trip).

Reported: PSNR/SSIM on held-out views + compressed size — the stand-in
analog of the reference's eval.rst / TanksAndTemples.csv numbers.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from examples.synthetic_benchmark import ListDataset, SceneParser


def _look_at(eye, target, up):
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, u, f, eye
    return c2w


def build_garden_scene(n_views, width=None, height=None, seed=0,
                       opacity=0.85, return_gt=False):
    import jax

    # The container sitecustomize force-registers the axon TPU plugin and
    # can override JAX_PLATFORMS; honor the env explicitly so CPU runs
    # don't touch (or hang on) the TPU relay.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from gscodec_studio_tpu.models.splats import (
        create_splats, splat_activations,
    )
    from gscodec_studio_tpu.rendering import rasterization

    d = np.load("/root/reference/assets/test_garden.npz")
    pts = d["means3d"].astype(np.float32)
    rgb = (d["colors"] / 255.0).astype(np.float32)
    vms = d["viewmats"].astype(np.float32)
    Ks0 = d["Ks"].astype(np.float32)
    W0, H0 = int(d["width"]), int(d["height"])
    width = width or W0
    height = height or H0
    K = Ks0[0].copy()
    K[0] *= width / W0
    K[1] *= height / H0

    rng = np.random.default_rng(seed)
    N = pts.shape[0]
    gt = create_splats(pts, rgb, cap=N, sh_degree=2, init_opacity=opacity,
                       init_scale=1.4, seed=seed)
    # realistic per-splat variation: opacity spread + mild view dependence
    gt["opacities"] = gt["opacities"] + jnp.asarray(
        rng.normal(0.0, 0.8, N).astype(np.float32))
    gt["shN"] = gt["shN"] + jnp.asarray(
        0.03 * rng.standard_normal(gt["shN"].shape).astype(np.float32))
    gt["scales"] = gt["scales"] + jnp.asarray(
        rng.normal(0.0, 0.35, (N, 3)).astype(np.float32))

    # camera arc through the real poses: orbit the cloud centroid at the
    # real cameras' mean radius/height
    c2ws = np.linalg.inv(vms)
    centers = c2ws[:, :3, 3]
    target = np.median(pts, axis=0)
    rel = centers - target
    radius = np.linalg.norm(rel[:, [0, 2]], axis=1).mean()
    h = rel[:, 1].mean()
    phis = np.arctan2(rel[:, 2], rel[:, 0])
    phi0, phi1 = phis.min(), phis.max()
    span = max(phi1 - phi0, np.pi * 0.8)
    mid = 0.5 * (phi0 + phi1)

    means, quats, scales, opac = splat_activations(gt)
    colors = jnp.concatenate([gt["sh0"], gt["shN"]], axis=1)
    # scene arrays as jit ARGUMENTS: captured constants are re-staged
    # through the relay on every dispatch (seconds/view of hidden upload)
    render = jax.jit(
        lambda vm, means, quats, scales, opac, colors, Kd: rasterization(
            means, quats, scales, opac, colors, vm[None],
            Kd[None], width, height, sh_degree=2,
            isect_capacity=6 << 20,
        )[0]
    )
    Kd = jnp.asarray(K)
    views = []
    for i in range(n_views):
        phi = mid - 0.6 * span + 1.2 * span * i / max(n_views - 1, 1)
        eye = target + np.array(
            [radius * np.cos(phi), h + 0.1 * np.sin(3 * phi),
             radius * np.sin(phi)], np.float32)
        c2w = _look_at(eye, target.astype(np.float32),
                       np.array([0, -1, 0], np.float32))
        img = render(jnp.asarray(np.linalg.inv(c2w)), means, quats,
                     scales, opac, colors, Kd)
        views.append({
            "camtoworld": c2w, "K": K.astype(np.float32),
            "image": np.clip(np.asarray(img[0]), 0, 1),
        })
    if return_gt:
        # the exact GT parameter pytree (for self-fit diagnostics:
        # oracle-eval and train-from-GT legs, examples/self_fit.py)
        return pts, rgb, views, (width, height), gt
    return pts, rgb, views, (width, height)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_views", type=int, default=49)
    p.add_argument("--width", type=int, default=1297)
    p.add_argument("--height", type=int, default=840)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--cap", type=int, default=1_000_000)
    p.add_argument("--init_pts", type=int, default=100_000)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--compression_sim", action="store_true")
    p.add_argument("--rd_lambda", type=float, default=0.01)
    p.add_argument("--result_dir", default="results/garden_stand_in")
    p.add_argument("--steps_per_dispatch", type=int, default=25)
    p.add_argument("--isect_capacity", type=int, default=6 << 20)
    p.add_argument("--eval_every", type=int, default=0)
    p.add_argument("--grad_dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--attr_dtype", default="f32", choices=["bf16", "f32"])
    p.add_argument("--log_composite", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gscodec_studio_tpu.training.trainer import Config, Runner

    rng = np.random.default_rng(0)
    t0 = time.time()
    pts, rgb, views, (W, H) = build_garden_scene(
        args.n_views, args.width, args.height)
    print(json.dumps({"phase": "scene", "views": len(views),
                      "res": [W, H], "gt_points": len(pts),
                      "secs": round(time.time() - t0, 1)}), flush=True)

    # SfM-style init: jittered subsample of the real cloud
    sel = rng.choice(len(pts), min(args.init_pts, len(pts)), replace=False)
    parser = SceneParser()
    parser.points = (pts[sel] + 0.02 * rng.standard_normal(
        (len(sel), 3)).astype(np.float32))
    parser.points_rgb = (rgb[sel] * 255).astype(np.uint8)
    parser.points_err = np.zeros(len(sel))
    scene_scale = float(np.linalg.norm(
        pts - np.median(pts, 0), axis=1).mean() * 3)
    parser.scene_scale = scene_scale

    train_views = ListDataset([v for i, v in enumerate(views) if i % 8 != 0])
    val_views = ListDataset([v for i, v in enumerate(views) if i % 8 == 0])
    cfg = Config(
        result_dir=args.result_dir, max_steps=args.steps,
        sh_degree=args.sh_degree, sh_degree_interval=max(args.steps // 6, 1),
        strategy="mcmc", mcmc_cap_max=args.cap,
        # scale the 30k-schedule refine window to this run's length
        # (reference adjust_steps): refinement must STOP well before the
        # end so the decayed-LR phase converges instead of chasing
        # relocation churn
        refine_stop_iter=int(args.steps * 25 / 30),
        isect_capacity=args.isect_capacity,
        steps_per_dispatch=args.steps_per_dispatch,
        opacity_reg=0.01, scale_reg=0.01,
        compression_sim=args.compression_sim,
        entropy_model_opt=args.compression_sim,
        shN_ada_mask_opt=args.compression_sim,
        rd_lambda=args.rd_lambda,
        grad_dtype=args.grad_dtype,
        attr_dtype=args.attr_dtype,
        log_composite=args.log_composite,
        seed=args.seed,
        # mid-run quality evidence + a restartable checkpoint
        eval_steps=(args.steps // 4, args.steps // 2, 3 * args.steps // 4),
        save_steps=(args.steps // 2,),
    )
    runner = Runner(cfg, parser=parser, trainset=train_views,
                    valset=val_views)

    init_metrics = runner.eval("init")
    print(json.dumps({"phase": "init",
                      **{k: round(v, 3) for k, v in init_metrics.items()}}),
          flush=True)

    t0 = time.time()
    losses = runner.train(log_every=500)
    train_secs = time.time() - t0
    metrics = runner.eval("garden")
    result = {
        "phase": "train", "steps": args.steps,
        "secs": round(train_secs, 1),
        "steps_per_sec": round(args.steps / train_secs, 2),
        "final_loss": round(float(np.nanmean(losses[-50:])), 4),
        "skipped_steps": int(getattr(runner, "_skipped_steps", 0)),
        **{k: round(v, 3) for k, v in metrics.items()},
    }
    print(json.dumps(result), flush=True)

    # final model state (full capacity) for later A/B and sweep tooling
    np.savez(
        os.path.join(args.result_dir, "splats_final.npz"),
        **{k: np.asarray(v) for k, v in runner.splats.items()},
    )

    t0 = time.time()
    comp = runner.run_compression(args.steps, method="png")
    comp_res = {
        "phase": "compression", "secs": round(time.time() - t0, 1),
        **{k: round(v, 3) if isinstance(v, float) else v
           for k, v in comp.items()},
    }
    print(json.dumps(comp_res), flush=True)
    os.makedirs(args.result_dir, exist_ok=True)
    with open(os.path.join(args.result_dir, "stats.json"), "w") as f:
        json.dump({"train": result, "compression": comp_res,
                   "config": vars(args)}, f, indent=1)


if __name__ == "__main__":
    main()
