"""Benchmark: fwd+bwd rasterization throughput (Mpix/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference gsplat rasterizer on TITAN RTX renders the garden x5
scene at 171.8 fwd / 97.1 bwd FPS (docs/source/tests/profile.rst:49-60) at
1297x840 -> combined fwd+bwd 62.0 FPS = 67.6 Mpix/s. vs_baseline is our
combined-Mpix/s divided by that.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gscodec_studio_tpu.rendering import rasterization

    rng = np.random.default_rng(0)
    N = 1_000_000
    width, height = 1297, 840
    isect_capacity = 8 << 20

    # Garden-like synthetic scene: points in a disk + floor, realistic
    # opacity/scale mix so per-tile depth lists resemble a trained scene.
    means = np.empty((N, 3), np.float32)
    means[:, 0] = rng.standard_normal(N) * 2.5
    means[:, 1] = rng.standard_normal(N) * 1.5
    means[:, 2] = rng.standard_normal(N) * 2.5
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = np.exp(rng.normal(-4.2, 0.7, (N, 3))).astype(np.float32)
    opacities = (rng.beta(0.7, 1.2, N)).astype(np.float32)
    sh0 = (rng.random((N, 1, 3)) - 0.5).astype(np.float32)
    shN = (0.1 * rng.standard_normal((N, 15, 3))).astype(np.float32)
    colors = jnp.asarray(np.concatenate([sh0, shN], axis=1))

    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, 3] = [0, 0, 6.0]
    viewmats = jnp.asarray(viewmat[None])
    f = 1100.0
    Ks = jnp.asarray(
        np.array([[[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]]], np.float32)
    )
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opacities)
    ) + (colors, viewmats, Ks)

    def loss_fn(means, quats, scales, opacities, colors, viewmats, Ks):
        img, alpha, _ = rasterization(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, sh_degree=3, isect_capacity=isect_capacity,
        )
        return jnp.mean((img - 0.5) ** 2) + 0.1 * jnp.mean(alpha)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    out = jax.block_until_ready(step(*args))
    best = np.inf
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(step(*args))
        best = min(best, time.perf_counter() - t0)

    mpix_s = width * height / best / 1e6
    baseline = 67.6  # Mpix/s fwd+bwd, TITAN RTX (see module docstring)
    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_throughput",
                "value": round(mpix_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
