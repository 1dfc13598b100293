"""Benchmark: fwd+bwd rasterization throughput (Mpix/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference gsplat rasterizer on TITAN RTX renders the garden x5
scene at 171.8 fwd / 97.1 bwd FPS (docs/source/tests/profile.rst:49-60) at
1297x840 -> combined fwd+bwd 62.0 FPS = 67.6 Mpix/s. vs_baseline is our
combined-Mpix/s divided by that.

Default config (round-5 hardware sweep, results/r5_evidence/
bench_sweep.jsonl): tile_size=32 (fewer binned rows for large splats;
16/24/32 measured 11.06/12.92/13.31 Mpix/s), capacity right-sized to
1.2x the probed elliptical-binned row count (the static capacity is
what the pipeline pays for — the trainer sizes its buffer adaptively
the same way), packed bf16 payloads + MXU log-composite. Every knob is
env-overridable and echoed in the output config.

Timing methodology: this remote-TPU relay reports async completion
unreliably and adds a fixed dispatch tax after any device-to-host transfer,
so we measure per-iteration time by K-step scan differencing with a forced
sync (utils/profiling.honest_timer) — no host transfer happens before the
timed runs.
"""

import json
import time

import numpy as np


def make_scene(n=1_000_000, width=1297, height=840, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # Garden-like synthetic scene: points clustered in a disk + floor with a
    # realistic opacity/scale mix so per-tile depth lists resemble a trained
    # scene.
    means = np.empty((n, 3), np.float32)
    means[:, 0] = rng.standard_normal(n) * 2.5
    means[:, 1] = rng.standard_normal(n) * 1.5
    means[:, 2] = rng.standard_normal(n) * 2.5
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    scales = np.exp(rng.normal(-4.6, 0.7, (n, 3))).astype(np.float32)
    opacities = (rng.beta(0.7, 1.2, n)).astype(np.float32)
    sh0 = (rng.random((n, 1, 3)) - 0.5).astype(np.float32)
    shN = (0.1 * rng.standard_normal((n, 15, 3))).astype(np.float32)
    colors = jnp.asarray(np.concatenate([sh0, shN], axis=1))
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, 3] = [0, 0, 6.0]
    f = 1100.0
    Ks = jnp.asarray(
        np.array(
            [[[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]]], np.float32
        )
    )
    return (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), colors, jnp.asarray(viewmat[None]), Ks,
    )


def main():
    import os

    import jax

    # Persistent compilation cache: repeated bench runs skip the (slow,
    # possibly remote) TPU compile entirely.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gscodec_studio_tpu.rendering import rasterization
    from gscodec_studio_tpu.utils.profiling import honest_timer

    width, height = 1297, 840
    tile = int(os.environ.get("GSC_BENCH_TILE", "32"))
    means, quats, scales, opacities, colors, viewmats, Ks = make_scene(
        width=width, height=height
    )
    if int(os.environ.get("GSC_BENCH_AUTO_CAP", "1")):
        # Pipeline cost scales with the STATIC intersection capacity, not
        # the actual row count — a tile-size sweep at fixed capacity would
        # measure nothing. Probe the actual elliptical-binned volume at
        # this tile size and size the capacity ~1.2x over it.
        from gscodec_studio_tpu.ops.projection import fully_fused_projection
        from gscodec_studio_tpu.ops.raster_v2 import tile_counts

        @jax.jit
        def count():
            radii, means2d, _, _, _ = fully_fused_projection(
                means, None, quats, scales, viewmats, Ks, width, height,
                opacities=opacities, elliptical=True,
            )
            tw, th = -(-width // tile), -(-height // tile)
            _, _, _, cnts = tile_counts(means2d, radii, tile, tw, th)
            return jnp.sum(cnts)

        n_rows = int(count())
        isect_capacity = int(n_rows * 1.2)
        import sys

        # diagnostics go to stderr: stdout carries exactly ONE JSON line
        print(json.dumps({"probe": "auto_cap", "tile_size": tile,
                          "binned_rows": n_rows,
                          "isect_capacity": isect_capacity}),
              file=sys.stderr)
    else:
        isect_capacity = int(os.environ.get(
            "GSC_BENCH_ISECT_CAP", str(5 << 20)
        ))  # default ~1.2x the ts=16 scene's 4.19M intersections

    def body(c, means, quats, scales, opacities, colors, viewmats, Ks):
        def loss_fn(means):
            img, alpha, _ = rasterization(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, sh_degree=3, isect_capacity=isect_capacity,
                cutoff_mode="soft",  # the trainer's production default
                # A/B knobs. Defaults = the fast packed configuration
                # (bf16-pair sort payloads + MXU log-composite), parity-
                # tested in tests/test_raster_v2.py (bf16 grads ~1.5e-2
                # atol, bf16 attrs ~2e-3 — a precision/speed trade like
                # bf16 matmuls); override via env for f32 A/B legs.
                grad_dtype=os.environ.get("GSC_BENCH_GRAD_DTYPE", "bf16"),
                attr_dtype=os.environ.get("GSC_BENCH_ATTR_DTYPE", "bf16"),
                log_composite=bool(int(os.environ.get(
                    "GSC_BENCH_LOG_COMPOSITE", "1"))),
                tile_size=tile,
                geom_dtype=os.environ.get("GSC_BENCH_GEOM_DTYPE", "f32"),
            )
            return jnp.mean((img - 0.5) ** 2) + 0.1 * jnp.mean(alpha)

        g = jax.grad(loss_fn)(means + c)
        return jnp.sum(g) * 1e-20 + 1e-12

    per_iter = honest_timer(
        body, (means, quats, scales, opacities, colors, viewmats, Ks), K=8
    )
    mpix_s = width * height / per_iter / 1e6
    baseline = 67.6  # Mpix/s fwd+bwd, TITAN RTX (see module docstring)
    # Emit the active precision config so every recorded number is
    # self-describing (ADVICE r4: the default changed from f32 to the
    # packed bf16 config between rounds; vs_baseline still divides by
    # the f32 GPU reference).
    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_throughput",
                "value": round(mpix_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / baseline, 3),
                "config": {
                    "grad_dtype": os.environ.get(
                        "GSC_BENCH_GRAD_DTYPE", "bf16"),
                    "attr_dtype": os.environ.get(
                        "GSC_BENCH_ATTR_DTYPE", "bf16"),
                    "log_composite": bool(int(os.environ.get(
                        "GSC_BENCH_LOG_COMPOSITE", "1"))),
                    "tile_size": tile,
                    "geom_dtype": os.environ.get(
                        "GSC_BENCH_GEOM_DTYPE", "f32"),
                    "isect_capacity": isect_capacity,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
