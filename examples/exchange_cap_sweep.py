"""Measured operating curve for the bucketed-exchange drop policy.

The distributed visibility exchange (parallel/distributed.py
_exchange_bucketed) ships, per destination shard, at most ``exchange_cap``
Gaussians from each source shard; visible Gaussians beyond the cap are
DROPPED (radii zeroed — no render contribution, no gradient). This script
measures what that policy costs on a realistic scene: it loads a trained
garden stand-in model (examples/garden_benchmark.py output), simulates the
per-(source-shard, dest-shard) top-cap keep rule single-chip, and reports
render PSNR vs the uncapped render across a cap sweep, together with the
exchange-volume ratio sent_rows/dense_rows and the dropped-visible count
(SURVEY §7 "drop-or-spill policy affects gradient correctness; must
measure").

Usage (after a garden_benchmark run):
  python examples/exchange_cap_sweep.py \
      --splats results/garden_ladder_r4/cap_360000/splats_final.npz \
      --caps 8192 16384 32768 65536 --mesh 8
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
    p.add_argument("--splats", required=True,
                   help="splats_final.npz from garden_benchmark.py")
    p.add_argument("--caps", type=int, nargs="*",
                   default=[8192, 16384, 32768, 65536])
    p.add_argument("--mesh", type=int, default=8, help="simulated G shards")
    p.add_argument("--n_views", type=int, default=8)
    p.add_argument("--width", type=int, default=1297)
    p.add_argument("--height", type=int, default=840)
    p.add_argument("--out", default="results/exchange_cap_sweep.json")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from examples.garden_benchmark import build_garden_scene
    from gscodec_studio_tpu.models.splats import splat_activations
    from gscodec_studio_tpu.ops.projection import fully_fused_projection
    from gscodec_studio_tpu.rendering import rasterization
    from gscodec_studio_tpu.training.losses import psnr

    d = np.load(args.splats)
    # Accept either a flat splats npz (garden_benchmark splats_final.npz)
    # or a trainer checkpoint (keys prefixed "splats/").
    splats = {
        k.removeprefix("splats/"): jnp.asarray(d[k])
        for k in d.files
        if k == "step" or k.startswith("splats/") or "/" not in k
    }
    splats.pop("step", None)
    means, quats, scales, opac = splat_activations(splats)
    colors = jnp.concatenate([splats["sh0"], splats["shN"]], axis=1)
    N = means.shape[0]
    G = args.mesh
    # contiguous shards, exactly like the trainer's leaf_spec sharding
    Nl = -(-N // G)

    # same camera arc the training run used (held-out style views)
    _, _, views, _ = build_garden_scene(
        args.n_views, args.width, args.height)
    vms = jnp.asarray(
        np.stack([np.linalg.inv(v["camtoworld"]) for v in views])
    )
    Ks = jnp.asarray(np.stack([v["K"] for v in views]))
    C = vms.shape[0]
    Cl = -(-C // G)

    @jax.jit
    def project_radii(vm, K):
        radii, *_ = fully_fused_projection(
            means, None, quats, scales, vm, K,
            args.width, args.height, opacities=opac,
        )
        return radii * (opac[None, :] >= 1.0 / 255.0)

    radii = np.asarray(project_radii(vms, Ks))  # [C, N]

    @jax.jit
    def render(vm, K, opac_mask):
        img, _, _ = rasterization(
            means, quats, scales, opac * opac_mask, colors, vm, K,
            args.width, args.height, sh_degree=3, isect_capacity=6 << 20,
        )
        return jnp.clip(img, 0.0, 1.0)

    # uncapped reference renders per destination group. With C < G the
    # trailing groups own no cameras (slice is empty -> a 0-camera render
    # would crash the binning); skip them everywhere.
    def group_cams(dg):
        return slice(dg * Cl, min((dg + 1) * Cl, C))

    live_groups = [dg for dg in range(G)
                   if group_cams(dg).stop > group_cams(dg).start]
    full = {}
    for dg in live_groups:
        cams = group_cams(dg)
        full[dg] = np.asarray(render(
            vms[cams], Ks[cams], jnp.ones((N,), jnp.float32)))

    rows = []
    for cap in args.caps:
        t0 = time.time()
        keep = np.zeros((G, N), bool)  # [dest, gaussian]
        dropped_visible = 0
        for dg in live_groups:
            cams = group_cams(dg)
            vis = (radii[cams] > 0).any(axis=0)  # [N]
            for sg in range(G):
                sl = slice(sg * Nl, min((sg + 1) * Nl, N))
                v = vis[sl]
                # visible-first stable order, top `cap` kept — exactly
                # _exchange_bucketed's rule
                order = np.argsort(~v, kind="stable")[:cap]
                k = np.zeros(v.shape, bool)
                k[order] = True
                keep[dg, sl] = k & v
                dropped_visible += int(v.sum() - (k & v).sum())
        psnrs = []
        for dg in live_groups:
            cams = group_cams(dg)
            img = np.asarray(render(
                vms[cams], Ks[cams],
                jnp.asarray(keep[dg].astype(np.float32))))
            psnrs.append(float(psnr(jnp.asarray(img),
                                    jnp.asarray(full[dg]))))
        sent = G * Cl * G * cap
        dense = C * N
        rows.append({
            "exchange_cap": cap,
            "psnr_vs_uncapped": round(float(np.mean(psnrs)), 3),
            "sent_over_dense": round(sent / dense, 4),
            "dropped_visible_rows": dropped_visible,
            "visible_rows": int((radii > 0).any(axis=0).sum()),
            "secs": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"n_gaussians": int(N), "mesh": G, "n_views": C,
                   "rows": rows}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
