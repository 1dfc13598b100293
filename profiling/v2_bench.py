"""Benchmark raster_v2 fwd+bwd at the baseline workload (garden 5x5 @1080p).

Usage: python profiling/v2_bench.py [tile_size] [tiles_per_step]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def baseline_scene(width=1920, height=1080, seed=42):
    """Replica of the reference profiling workload: test_garden.npz cropped
    to [-2,2]^3, replicated on a 5x5 grid, random scales/quats/opacities with
    the same distributions (gsplat/_helper.py:load_test_data, scene_grid=5),
    rendered from the first garden camera at 1080p (profiling/main.py:171)."""
    d = np.load("/root/reference/assets/test_garden.npz")
    h, w = int(d["height"]), int(d["width"])
    means = d["means3d"]
    colors_rgb = d["colors"] / 255.0
    sel = ((means >= -2) & (means <= 2)).all(axis=1)
    mc, cc = means[sel], colors_rgb[sel]
    g = np.arange(-2, 3)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    grid = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
    mg = (mc[None] + grid[:, None] * 4.0).reshape(-1, 3).astype(np.float32)
    cg = np.tile(cc, (25, 1)).astype(np.float32)
    N = mg.shape[0]
    rng = np.random.default_rng(seed)
    scales = (rng.random((N, 3)) * 0.02).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.random(N).astype(np.float32)
    viewmat = d["viewmats"][:1].astype(np.float32)
    K = d["Ks"][:1].astype(np.float32).copy()
    K[:, 0, :] *= width / w
    K[:, 1, :] *= height / h
    return mg, quats, scales, opac, cg, viewmat, K


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gscodec_studio_tpu.ops.projection import fully_fused_projection
    from gscodec_studio_tpu.ops.raster_v2 import rasterize_to_pixels_v2
    from gscodec_studio_tpu.utils.profiling import honest_timer

    ts = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    g_t = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    width, height = 1920, 1080
    cap = {16: 6 << 20, 32: 5 << 19, 64: 3 << 19}[ts]

    mg, quats, scales, opac, cg, viewmat, Kmat = baseline_scene(width, height)
    args = tuple(map(jnp.asarray, (mg, quats, scales, opac, cg, viewmat, Kmat)))

    def render(means, quats, scales, opac, colors, viewmats, Ks):
        radii, means2d, depths, conics, comps = fully_fused_projection(
            means, None, quats, scales, viewmats, Ks, width, height
        )
        img, alp, meta = rasterize_to_pixels_v2(
            means2d, conics, colors[None], opac[None], depths, radii,
            width, height, tile_size=ts, isect_capacity=cap,
            tiles_per_step=g_t,
        )
        return img, alp, meta

    # report isect count once
    _, _, meta = jax.jit(render)(*args)
    print("n_isects:", int(meta["n_isects"]), "cap:", cap)

    def body(c, *a):
        def loss(means):
            img, alp, _ = render(means + c * 0.0, *a[1:])
            return jnp.mean((img - 0.5) ** 2) + 0.1 * jnp.mean(alp)

        g = jax.grad(loss)(a[0])
        return jnp.sum(g).astype(jnp.float32) * 1e-20 + c

    per = honest_timer(body, args, K=8, repeats=2)
    mpix = width * height / per / 1e6
    print(f"ts={ts} G={g_t}: {per*1e3:.1f} ms/iter  {mpix:.1f} Mpix/s "
          f"vs_baseline(128.6)={mpix/128.6:.3f}")


if __name__ == "__main__":
    main()
