"""Pallas tile rasterizer vs the pure-jnp oracle: forward allclose and
hand-derived backward vs jax.grad of the oracle (the TPU analog of the
reference's CUDA-vs-torch dual-implementation tests,
tests/test_basic.py:477-576). Runs in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.isect import isect_tiles, isect_offset_encode
from gscodec_studio_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gscodec_studio_tpu.ops.rasterize_pallas import rasterize_to_pixels


def make_2d_scene(rng, C=1, N=200, W=48, H=32, CH=3):
    means2d = np.stack(
        [rng.random((C, N)) * W, rng.random((C, N)) * H], axis=-1
    ).astype(np.float32)
    L = rng.random((C, N, 2, 2)).astype(np.float32) - 0.5
    cov = L @ np.swapaxes(L, -1, -2) + 2.0 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1).astype(
        np.float32
    )
    colors = rng.random((C, N, CH)).astype(np.float32)
    opacities = (0.1 + 0.9 * rng.random((C, N))).astype(np.float32)
    depths = (0.5 + rng.random((C, N))).astype(np.float32)
    radii = rng.integers(0, 10, size=(C, N)).astype(np.int32)
    bg = rng.random((C, CH)).astype(np.float32)
    return means2d, conics, colors, opacities, depths, radii, bg


@pytest.mark.parametrize("CH", [3, 8])
@pytest.mark.parametrize("C", [1, 2])
def test_pallas_forward_matches_oracle(rng, C, CH):
    W, H, ts = 48, 32, 16
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=C, CH=CH
    )
    tw, th = -(-W // ts), -(-H // ts)
    isect = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, 8192,
    )
    offsets = isect_offset_encode(isect.tile_keys, C, tw, th)

    img, alp = rasterize_to_pixels(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), isect, offsets, W, H, ts,
        backgrounds=jnp.asarray(bg),
    )
    img_ref, alp_ref = rasterize_to_pixels_ref(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), jnp.asarray(depths), jnp.asarray(radii),
        W, H, ts, backgrounds=jnp.asarray(bg),
    )
    np.testing.assert_allclose(img, img_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(alp, alp_ref, rtol=1e-3, atol=1e-4)


def test_pallas_backward_matches_oracle(rng):
    C, W, H, ts, CH = 1, 48, 32, 16, 3
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=C, N=150, W=W, H=H, CH=CH
    )
    tw, th = -(-W // ts), -(-H // ts)
    isect = isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        ts, tw, th, 8192,
    )
    offsets = isect_offset_encode(isect.tile_keys, C, tw, th)

    tgt = jnp.asarray(rng.random((C, H, W, CH)).astype(np.float32))

    def loss_pallas(means2d, conics, colors, opacities):
        img, alp = rasterize_to_pixels(
            means2d, conics, colors, opacities, isect, offsets, W, H, ts,
            backgrounds=jnp.asarray(bg),
        )
        return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)

    def loss_ref(means2d, conics, colors, opacities):
        img, alp = rasterize_to_pixels_ref(
            means2d, conics, colors, opacities, jnp.asarray(depths),
            jnp.asarray(radii), W, H, ts, backgrounds=jnp.asarray(bg),
        )
        return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)

    args = (
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities),
    )
    lp = loss_pallas(*args)
    lr = loss_ref(*args)
    np.testing.assert_allclose(lp, lr, rtol=1e-4)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    names = ["means2d", "conics", "colors", "opacities"]
    for name, a, b in zip(names, gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=5e-3, err_msg=name
        )


def test_pallas_empty_scene(rng):
    """No visible gaussians: background everywhere, zero alpha."""
    C, N, W, H, ts, CH = 1, 16, 32, 32, 16, 3
    means2d = jnp.zeros((C, N, 2))
    conics = jnp.tile(jnp.asarray([0.1, 0.0, 0.1]), (C, N, 1))
    colors = jnp.ones((C, N, CH))
    opacities = jnp.ones((C, N))
    depths = jnp.ones((C, N))
    radii = jnp.zeros((C, N), jnp.int32)
    tw, th = W // ts, H // ts
    isect = isect_tiles(means2d, radii, depths, ts, tw, th, 1024)
    offsets = isect_offset_encode(isect.tile_keys, C, tw, th)
    bg = jnp.asarray([[0.25, 0.5, 0.75]])
    img, alp = rasterize_to_pixels(
        means2d, conics, colors, opacities, isect, offsets, W, H, ts,
        backgrounds=bg,
    )
    np.testing.assert_allclose(alp, 0.0)
    np.testing.assert_allclose(img, np.broadcast_to(bg[:, None, None, :], img.shape))
