"""Throughput/memory profiling harness (reference profiling/main.py):
sweeps resolution / #Gaussians / channels and reports fwd and fwd+bwd
Mpix/s per configuration using the relay-safe honest timer."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_config(n, width, height, channels, isect_capacity):
    import jax
    import jax.numpy as jnp

    from gscodec_studio_tpu.rendering import rasterization
    from gscodec_studio_tpu.utils.profiling import honest_timer
    from bench import make_scene

    means, quats, scales, opacities, colors, viewmats, Ks = make_scene(
        n=n, width=width, height=height
    )
    if channels != 3:
        feat = jnp.asarray(
            np.random.default_rng(0).random((n, channels)).astype(np.float32)
        )

    cols = colors if channels == 3 else feat
    args = (means, quats, scales, opacities, cols, viewmats, Ks)

    def fwd(c, means, quats, scales, opacities, cols, viewmats, Ks):
        img, _, _ = rasterization(
            means + c, quats, scales, opacities, cols,
            viewmats, Ks, width, height,
            sh_degree=3 if channels == 3 else None,
            isect_capacity=isect_capacity,
        )
        return jnp.sum(img) * 1e-20 + 1e-12

    def bwd(c, means, quats, scales, opacities, cols, viewmats, Ks):
        def loss(means):
            img, _, _ = rasterization(
                means, quats, scales, opacities, cols,
                viewmats, Ks, width, height,
                sh_degree=3 if channels == 3 else None,
                isect_capacity=isect_capacity,
            )
            return jnp.mean(img**2)

        return jnp.sum(jax.grad(loss)(means + c)) * 1e-20 + 1e-12

    t_f = honest_timer(fwd, args, K=6)
    t_b = honest_timer(bwd, args, K=6)
    return {
        "n_gaussians": n, "width": width, "height": height,
        "channels": channels,
        "fwd_ms": round(t_f * 1e3, 2),
        "fwd_bwd_ms": round(t_b * 1e3, 2),
        "fwd_mpix_s": round(width * height / t_f / 1e6, 1),
        "fwd_bwd_mpix_s": round(width * height / t_b / 1e6, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    configs = [
        (1_000_000, 1297, 840, 3, 6 << 20),
    ]
    if not args.quick:
        configs += [
            (100_000, 1297, 840, 3, 1 << 20),
            (4_000_000, 1297, 840, 3, 12 << 20),
            (1_000_000, 1920, 1080, 3, 8 << 20),
            (1_000_000, 1297, 840, 32, 6 << 20),
        ]
    results = []
    for cfg in configs:
        r = run_config(*cfg)
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
