"""Oracle rasterizer vs an independent sequential numpy transcription of the
CUDA tile-kernel semantics (rasterize_to_pixels_fwd.cu:137-184)."""

import numpy as np

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops import fully_fused_projection
from gscodec_studio_tpu.ops.rasterize_ref import rasterize_to_pixels_ref


def sequential_rasterize(
    means2d, conics, colors, opacities, depths, radii, width, height, tile_size, bg
):
    """Literal per-pixel front-to-back loop with early stop + tile inclusion."""
    C, N, _ = means2d.shape
    ch = colors.shape[-1]
    out = np.zeros((C, height, width, ch), dtype=np.float64)
    out_alpha = np.zeros((C, height, width), dtype=np.float64)
    tw, th = -(-width // tile_size), -(-height // tile_size)
    for c in range(C):
        order = np.argsort(np.where(radii[c] > 0, depths[c], np.inf), kind="stable")
        tm = means2d[c] / tile_size
        tr = radii[c].astype(np.float64) / tile_size
        tminx = np.clip(np.floor(tm[:, 0] - tr), 0, tw)
        tminy = np.clip(np.floor(tm[:, 1] - tr), 0, th)
        tmaxx = np.clip(np.ceil(tm[:, 0] + tr), 0, tw)
        tmaxy = np.clip(np.ceil(tm[:, 1] + tr), 0, th)
        for py in range(height):
            for px in range(width):
                T = 1.0
                tx, ty = px // tile_size, py // tile_size
                for g in order:
                    if radii[c, g] <= 0:
                        break
                    if not (tminx[g] <= tx < tmaxx[g] and tminy[g] <= ty < tmaxy[g]):
                        continue
                    dx = px + 0.5 - means2d[c, g, 0]
                    dy = py + 0.5 - means2d[c, g, 1]
                    a, b, cc = conics[c, g]
                    sigma = 0.5 * (a * dx * dx + cc * dy * dy) + b * dx * dy
                    if sigma < 0:
                        continue
                    alpha = min(0.999, opacities[c, g] * np.exp(-sigma))
                    if alpha < 1.0 / 255.0:
                        continue
                    next_T = T * (1 - alpha)
                    if next_T <= 1e-4:
                        break
                    out[c, py, px] += alpha * T * colors[c, g]
                    T = next_T
                out_alpha[c, py, px] = 1 - T
                out[c, py, px] += T * bg[c]
    return out, out_alpha


def test_rasterize_ref_matches_sequential(rng):
    C, N, W, H = 1, 60, 40, 24
    means2d = np.stack(
        [rng.random(size=(C, N)) * W, rng.random(size=(C, N)) * H], axis=-1
    ).astype(np.float32)
    L = rng.random(size=(C, N, 2, 2)).astype(np.float32) - 0.5
    cov = L @ np.swapaxes(L, -1, -2) + 4.0 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1).astype(
        np.float32
    )
    colors = rng.random(size=(C, N, 3)).astype(np.float32)
    opacities = rng.random(size=(C, N)).astype(np.float32)
    depths = (0.5 + rng.random(size=(C, N))).astype(np.float32)
    radii = rng.integers(0, 12, size=(C, N)).astype(np.int32)
    bg = rng.random(size=(C, 3)).astype(np.float32)

    ours, ours_alpha = rasterize_to_pixels_ref(
        jnp.asarray(means2d),
        jnp.asarray(conics),
        jnp.asarray(colors),
        jnp.asarray(opacities),
        jnp.asarray(depths),
        jnp.asarray(radii),
        W,
        H,
        tile_size=16,
        backgrounds=jnp.asarray(bg),
    )
    exp, exp_alpha = sequential_rasterize(
        means2d, conics, colors, opacities, depths, radii, W, H, 16, bg
    )
    np.testing.assert_allclose(ours, exp, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours_alpha[..., 0], exp_alpha, rtol=1e-3, atol=1e-4)


def test_rasterize_ref_grad_finite(rng):
    """Gradients through the oracle are finite and nonzero."""
    C, N, W, H = 1, 30, 32, 16
    means2d = jnp.asarray(
        np.stack(
            [rng.random(size=(C, N)) * W, rng.random(size=(C, N)) * H], -1
        ).astype(np.float32)
    )
    conics = jnp.asarray(
        np.tile(np.array([0.1, 0.0, 0.1], np.float32), (C, N, 1))
    )
    colors = jnp.asarray(rng.random(size=(C, N, 3)).astype(np.float32))
    opacities = jnp.asarray(0.5 * rng.random(size=(C, N)).astype(np.float32))
    depths = jnp.asarray((0.5 + rng.random(size=(C, N))).astype(np.float32))
    radii = jnp.asarray(np.full((C, N), 20, np.int32))

    def loss(means2d, colors, opacities, conics):
        img, alpha = rasterize_to_pixels_ref(
            means2d, conics, colors, opacities, depths, radii, W, H
        )
        return jnp.sum(img**2) + jnp.sum(alpha)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, colors, opacities, conics)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(grads[1])).sum() > 0


def test_rasterize_to_indices_in_range_reconstructs_oracle(rng):
    """Chunked near-to-far index enumeration reconstructs the one-pass
    oracle render exactly (the reference's iterative-rasterization
    contract, _wrapper.py:572 / _torch_impl.py:522-619)."""
    import jax.numpy as jnp

    from gscodec_studio_tpu.ops.indices_range import (
        rasterize_to_indices_in_range,
    )
    from tests.test_rasterize_pallas import make_2d_scene

    C, N, W, H, CH = 1, 120, 48, 32, 3
    means2d, conics, colors, opacities, depths, radii, _ = make_2d_scene(
        rng, C=C, N=N, W=W, H=H, CH=CH
    )
    args = tuple(map(jnp.asarray,
                     (means2d, conics, colors, opacities, depths, radii)))
    img_ref, alp_ref = rasterize_to_pixels_ref(*args, W, H, 16)

    T = jnp.ones((C, H, W), jnp.float32)
    out = np.zeros((C, H, W, CH), np.float32)
    Tnp = np.ones((C, H, W), np.float32)
    for start in range(0, N, 32):
        g, p, c, nv, T = rasterize_to_indices_in_range(
            start, min(start + 32, N), T, args[0], args[1], args[3],
            args[4], args[5], W, H, 16, out_capacity=1 << 16,
        )
        g, p, c = np.asarray(g), np.asarray(p), np.asarray(c)
        nv = int(nv)
        for i in range(nv):
            gi, pi, ci = g[i], p[i], c[i]
            yy, xx = pi // W, pi % W
            dx = means2d[ci, gi, 0] - (xx + 0.5)
            dy = means2d[ci, gi, 1] - (yy + 0.5)
            ca, cb, cc = conics[ci, gi]
            sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
            a = min(0.999, opacities[ci, gi] * np.exp(-sigma))
            w = a * Tnp[ci, yy, xx]
            out[ci, yy, xx] += w * colors[ci, gi]
            Tnp[ci, yy, xx] *= 1.0 - a
    np.testing.assert_allclose(out, np.asarray(img_ref), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        1.0 - Tnp[..., None], np.asarray(alp_ref), rtol=1e-4, atol=1e-5
    )
