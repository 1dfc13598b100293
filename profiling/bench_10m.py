"""Large-N headroom point: 10M gaussians, single chip (VERDICT r2 item 10).

Reference context: packed-mode profile points at 49M/107M gaussians
(docs profile.rst:118-146, 62.1 fwd FPS @ 49M on TITAN RTX). The dense
[C, N] design's ceiling is the f32-exact id budget (C*N < 2^24 = 16.7M per
rasterization call); 10M exercises the memory story and the sort scaling.

Prints ONE JSON line with Mpix/s and device memory.
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gscodec_studio_tpu.rendering import rasterization
    from gscodec_studio_tpu.utils.profiling import honest_timer
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", __file__.rsplit("/", 2)[0] + "/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    width, height = 1297, 840
    n = 10_000_000
    # scale radii down so the isect count stays near the 1M-scene's
    # (the reference's 49M-point scenes are grid replications where most
    # splats project small)
    means, quats, scales, opacities, colors, viewmats, Ks = bench.make_scene(
        n=n, width=width, height=height
    )
    scales = scales * 0.35
    cap = 10 << 20

    def body(c, means, quats, scales, opacities, colors, viewmats, Ks):
        def loss_fn(means):
            img, alpha, _ = rasterization(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, sh_degree=3, isect_capacity=cap,
                cutoff_mode="soft",
            )
            return jnp.mean((img - 0.5) ** 2) + 0.1 * jnp.mean(alpha)

        g = jax.grad(loss_fn)(means + c)
        return jnp.sum(g) * 1e-20 + 1e-12

    per_iter = honest_timer(
        body, (means, quats, scales, opacities, colors, viewmats, Ks), K=3
    )
    mpix_s = width * height / per_iter / 1e6
    # The axon relay's Device.memory_stats() returns None (round 4's
    # peak_device_mem_gb was silently 0.0) — use XLA's own buffer
    # assignment instead: argument + output + temp sizes of the compiled
    # fwd+bwd step are the authoritative device-memory footprint.
    args = (jnp.zeros((), jnp.float32), means, quats, scales, opacities,
            colors, viewmats, Ks)
    ma = jax.jit(body).lower(*args).compile().memory_analysis()
    arg_gb = getattr(ma, "argument_size_in_bytes", 0) / 2**30
    tmp_gb = getattr(ma, "temp_size_in_bytes", 0) / 2**30
    out_gb = getattr(ma, "output_size_in_bytes", 0) / 2**30
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_throughput_10M",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "n_gaussians": n,
        "peak_device_mem_gb": round(arg_gb + tmp_gb + out_gb, 2),
        "mem_breakdown_gb": {"args": round(arg_gb, 2),
                             "temps": round(tmp_gb, 2),
                             "outputs": round(out_gb, 3)},
        "mem_source": "xla_memory_analysis",
        "vs_baseline": round(mpix_s / 67.6, 3),
    }))


if __name__ == "__main__":
    main()
