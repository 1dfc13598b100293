"""Fused 2DGS tile rasterizer vs the pure-jnp 2DGS oracle.

Forward (colors / alpha / normals / distortion / median) allclose and the
hand-derived backward (incl. the distortion chain) vs jax.grad of the
oracle — the 2DGS analog of tests/test_raster_v2.py. Interpret mode, CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gscodec_studio_tpu.ops.raster_v2_2dgs import rasterize_to_pixels_2dgs_v2
from gscodec_studio_tpu.ops.rasterize_ref_2dgs import (
    rasterize_to_pixels_2dgs_ref,
)


def _make_scene(rng, test_scene, N=220, W=48, H=32):
    s = test_scene
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        jnp.asarray(s["means"][:N]), jnp.asarray(s["quats"][:N]),
        jnp.asarray(s["scales"][:N] * 0.5), jnp.asarray(s["viewmats"][:1]),
        jnp.asarray(s["Ks"][:1]), W, H,
    )
    C = 1
    opac = jnp.asarray((0.3 + 0.65 * rng.random((C, N))).astype(np.float32))
    rgb = jnp.asarray(rng.random((C, N, 3)).astype(np.float32))
    colors = jnp.concatenate([rgb, depths[..., None]], axis=-1)
    bg = jnp.asarray(rng.random((C, colors.shape[-1])).astype(np.float32))
    return means2d, M, colors, opac, normals, depths, radii, bg, W, H


def test_2dgs_v2_forward_matches_oracle(rng, test_scene):
    (means2d, M, colors, opac, normals, depths, radii, bg, W, H) = (
        _make_scene(rng, test_scene)
    )
    img, alp, nrm, dist, med, meta = rasterize_to_pixels_2dgs_v2(
        means2d, M, colors, opac, normals, depths, radii, W, H,
        tile_size=16, isect_capacity=8192, backgrounds=bg,
    )
    img_r, alp_r, nrm_r, dist_r, med_r = rasterize_to_pixels_2dgs_ref(
        means2d, M, colors, opac, normals, depths, radii, W, H, 16,
        backgrounds=bg,
    )
    assert int(np.sum(np.asarray(alp) > 0.05)) > 50
    np.testing.assert_allclose(img, img_r, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(alp, alp_r, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(nrm, nrm_r, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(dist, dist_r, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(med, med_r, rtol=1e-4, atol=1e-4)


def test_2dgs_v2_backward_matches_oracle(rng, test_scene):
    (means2d, M, colors, opac, normals, depths, radii, bg, W, H) = (
        _make_scene(rng, test_scene, N=160)
    )
    tgt = jnp.asarray(
        np.random.default_rng(7).random((1, H, W, colors.shape[-1]),
                                        np.float32)
    )

    def losses(render):
        img, alp, nrm, dist = render
        return (
            jnp.sum((img - tgt) ** 2)
            + 0.3 * jnp.sum(alp**2)
            + 0.2 * jnp.sum(nrm * nrm)
            + 0.5 * jnp.sum(dist)
        )

    def loss_v2(means2d, M, colors, opac, normals):
        img, alp, nrm, dist, _, _ = rasterize_to_pixels_2dgs_v2(
            means2d, M, colors, opac, normals, depths, radii, W, H,
            tile_size=16, isect_capacity=8192, backgrounds=bg,
        )
        return losses((img, alp, nrm, dist))

    def loss_ref(means2d, M, colors, opac, normals):
        img, alp, nrm, dist, _ = rasterize_to_pixels_2dgs_ref(
            means2d, M, colors, opac, normals, depths, radii, W, H, 16,
            backgrounds=bg,
        )
        return losses((img, alp, nrm, dist))

    args = (means2d, M, colors, opac, normals)
    np.testing.assert_allclose(
        loss_v2(*args), loss_ref(*args), rtol=2e-4
    )
    gv = jax.grad(loss_v2, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means2d", "ray_transforms", "colors", "opacities", "normals"]
    for name, a, b in zip(names, gv, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=5e-3, err_msg=name
        )
