"""Capture a device-timeline trace of the fwd+bwd rasterization step.

The per-stage scan-differenced timers (v2_stages.py) give honest totals;
this gives the per-kernel device timeline — jax.profiler's TensorBoard/
Perfetto trace (the reference's torch.profiler integration equivalent,
simple_trainer.py:53-83).

Usage:
    python profiling/trace_step.py [--logdir /tmp/gsc_trace] [--iters 3]

Then either:
    tensorboard --logdir /tmp/gsc_trace   (Profile tab; needs the
                                           tensorboard-plugin-profile)
or open the .trace.json.gz under
    <logdir>/plugins/profile/*/  in https://ui.perfetto.dev
to read per-kernel durations and MXU/VPU utilization.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="/tmp/gsc_trace")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--n_gauss", type=int, default=1_000_000)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_scene
    from gscodec_studio_tpu.rendering import rasterization

    width, height = 1297, 840
    means, quats, scales, opacities, colors, viewmats, Ks = make_scene(
        n=args.n_gauss, width=width, height=height
    )

    @jax.jit
    def step(means, quats, scales, opacities, colors, viewmats, Ks):
        def loss_fn(means):
            img, alpha, _ = rasterization(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, sh_degree=3, isect_capacity=5 << 20,
                cutoff_mode="soft",
                grad_dtype=os.environ.get("GSC_BENCH_GRAD_DTYPE", "f32"),
                attr_dtype=os.environ.get("GSC_BENCH_ATTR_DTYPE", "f32"),
            )
            return jnp.mean((img - 0.5) ** 2) + 0.1 * jnp.mean(alpha)

        return jax.grad(loss_fn)(means)

    # compile + warm outside the trace
    g = step(means, quats, scales, opacities, colors, viewmats, Ks)
    jax.block_until_ready(g)

    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            g = step(means, quats, scales, opacities, colors, viewmats, Ks)
        jax.block_until_ready(g)
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
