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

    check_2dgs()


def check_2dgs(N=400, W=96, H=64):
    """Fused 2DGS kernel vs the jnp oracle on hardware (projected surfels
    from the real garden scene geometry)."""
    import jax
    import jax.numpy as jnp

    from gscodec_studio_tpu.ops.projection_2dgs import (
        fully_fused_projection_2dgs,
    )
    from gscodec_studio_tpu.ops.raster_v2_2dgs import (
        rasterize_to_pixels_2dgs_v2,
    )
    from gscodec_studio_tpu.ops.rasterize_ref_2dgs import (
        rasterize_to_pixels_2dgs_ref,
    )

    d = np.load("/root/reference/assets/test_garden.npz")
    rng = np.random.default_rng(5)
    sel = rng.choice(len(d["means3d"]), N, replace=False)
    means = jnp.asarray(d["means3d"][sel].astype(np.float32))
    quats = jnp.asarray(rng.standard_normal((N, 4)).astype(np.float32))
    scales = jnp.asarray(
        np.exp(rng.normal(-2.2, 0.4, (N, 3))).astype(np.float32)
    )
    vm = jnp.asarray(d["viewmats"][:1].astype(np.float32))
    K0 = d["Ks"][0].astype(np.float32).copy()
    K0[0] *= W / float(d["width"])
    K0[1] *= H / float(d["height"])
    Ks = jnp.asarray(K0[None])
    radii, m2d, dep, M, nrm = fully_fused_projection_2dgs(
        means, quats, scales, vm, Ks, W, H
    )
    op = jnp.asarray((0.3 + 0.65 * rng.random((1, N))).astype(np.float32))
    rgb = jnp.asarray(rng.random((1, N, 3)).astype(np.float32))
    cols = jnp.concatenate([rgb, dep[..., None]], axis=-1)

    @jax.jit
    def fused(m2d, M, cols, op, nrm):
        img, alp, n_img, dist, med, _ = rasterize_to_pixels_2dgs_v2(
            m2d, M, cols, op, nrm, dep, radii, W, H, tile_size=16,
            isect_capacity=1 << 14,
        )
        return img, alp, n_img, dist, med

    @jax.jit
    def oracle(m2d, M, cols, op, nrm):
        return rasterize_to_pixels_2dgs_ref(
            m2d, M, cols, op, nrm, dep, radii, W, H, 16
        )

    of = fused(m2d, M, cols, op, nrm)
    orc = oracle(m2d, M, cols, op, nrm)
    for name, a, b in zip(
        ["img", "alpha", "normals", "distort", "median"], of, orc
    ):
        print(f"2dgs fwd {name:8s} max abs err "
              f"{float(jnp.max(jnp.abs(a - b))):.3e}")

    def l_f(m2d, M, cols, op, nrm):
        img, alp, n_img, dist, _ = fused(m2d, M, cols, op, nrm)
        return (jnp.sum(img * img) + 0.3 * jnp.sum(alp)
                + 0.2 * jnp.sum(n_img * n_img) + 0.5 * jnp.sum(dist))

    def l_r(m2d, M, cols, op, nrm):
        img, alp, n_img, dist, _ = oracle(m2d, M, cols, op, nrm)
        return (jnp.sum(img * img) + 0.3 * jnp.sum(alp)
                + 0.2 * jnp.sum(n_img * n_img) + 0.5 * jnp.sum(dist))

    gf = jax.grad(l_f, argnums=(0, 1, 2, 3, 4))(m2d, M, cols, op, nrm)
    gr = jax.grad(l_r, argnums=(0, 1, 2, 3, 4))(m2d, M, cols, op, nrm)
    for name, a, b in zip(
        ["means2d", "transforms", "colors", "opac", "normals"], gf, gr
    ):
        denom = float(jnp.max(jnp.abs(b))) + 1e-8
        print(f"2dgs grad {name:10s} rel err "
              f"{float(jnp.max(jnp.abs(a - b))) / denom:.3e}")


if __name__ == "__main__":
    main()
