"""Correctness check of raster_v2 against the pure-jnp oracle (small scene)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_small(C=2, N=300, width=100, height=72, seed=3):
    rng = np.random.default_rng(seed)
    means2d = rng.uniform(-10, [width + 10, height + 10], (C, N, 2)).astype(np.float32)
    # conics: positive-definite-ish
    l1 = rng.uniform(0.01, 0.3, (C, N))
    l2 = rng.uniform(0.01, 0.3, (C, N))
    th = rng.uniform(0, np.pi, (C, N))
    ct, st = np.cos(th), np.sin(th)
    a = l1 * ct * ct + l2 * st * st
    c = l1 * st * st + l2 * ct * ct
    b = (l1 - l2) * ct * st
    conics = np.stack([a, b, c], -1).astype(np.float32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    opac = rng.uniform(0.1, 1.0, (C, N)).astype(np.float32)
    depths = rng.uniform(0.5, 10.0, (C, N)).astype(np.float32)
    # radius from conic (3-sigma of the larger eigenvalue of covariance)
    cov_max = 1.0 / np.minimum(l1, l2)
    radii = np.ceil(3.0 * np.sqrt(cov_max)).astype(np.int32)
    radii[rng.random((C, N)) < 0.1] = 0  # some culled
    return (means2d, conics, colors, opac, depths, radii)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gscodec_studio_tpu.ops.raster_v2 import rasterize_to_pixels_v2
    from gscodec_studio_tpu.ops.rasterize_ref import rasterize_to_pixels_ref

    width, height = 100, 72
    m2, con, cols, op, dep, rad = map(jnp.asarray, make_small())
    bg = jnp.asarray(np.random.default_rng(0).random((2, 3)).astype(np.float32))

    @jax.jit
    def v2(m2, con, cols, op):
        img, alp, meta = rasterize_to_pixels_v2(
            m2, con, cols, op, dep, rad, width, height,
            tile_size=16, isect_capacity=1 << 14, backgrounds=bg,
        )
        return img, alp

    @jax.jit
    def ref(m2, con, cols, op):
        return rasterize_to_pixels_ref(
            m2, con, cols, op, dep, rad, width, height, 16, backgrounds=bg
        )

    img2, alp2 = v2(m2, con, cols, op)
    imgr, alpr = ref(m2, con, cols, op)
    e_img = float(jnp.max(jnp.abs(img2 - imgr)))
    e_alp = float(jnp.max(jnp.abs(alp2 - alpr)))
    print("fwd max abs err img/alpha:", e_img, e_alp)

    def loss2(m2, con, cols, op):
        img, alp = v2(m2, con, cols, op)
        return jnp.sum(img * img) + jnp.sum(alp * 0.3)

    def lossr(m2, con, cols, op):
        img, alp = ref(m2, con, cols, op)
        return jnp.sum(img * img) + jnp.sum(alp * 0.3)

    g2 = jax.grad(loss2, argnums=(0, 1, 2, 3))(m2, con, cols, op)
    gr = jax.grad(lossr, argnums=(0, 1, 2, 3))(m2, con, cols, op)
    for name, a, b in zip(["means2d", "conics", "colors", "opac"], g2, gr):
        denom = float(jnp.max(jnp.abs(b))) + 1e-8
        err = float(jnp.max(jnp.abs(a - b))) / denom
        print(f"grad {name:8s} rel err {err:.3e}")


if __name__ == "__main__":
    main()
