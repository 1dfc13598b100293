"""Learnable bilateral grid for per-image appearance correction.

Behavioral spec: /root/reference/examples/lib_bilagrid.py (573 LoC, from
"Bilateral Guided Radiance Field Processing"): a [D, H, W, 12] grid of
affine color transforms per image, sliced at (x, y, guidance(rgb)) by
trilinear interpolation, plus a total-variation regularizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilagrid_init(n_images: int, D: int = 8, H: int = 16, W: int = 16):
    """Identity affine transforms: [n, D, H, W, 12]."""
    ident = jnp.asarray(
        [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32
    )
    return jnp.tile(ident, (n_images, D, H, W, 1))


def _guidance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma as grid depth coordinate (lib_bilagrid default guidance)."""
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    )


def bilagrid_slice(
    grids: jnp.ndarray,  # [n, D, H, W, 12]
    image_id: jnp.ndarray,  # scalar int
    rgb: jnp.ndarray,  # [h, w, 3] rendered image in [0, 1]
) -> jnp.ndarray:
    """Trilinearly sample the per-pixel affine transform and apply it."""
    g = grids[image_id]  # [D, H, W, 12]
    D, H, W, _ = g.shape
    h, w = rgb.shape[:2]
    ys = jnp.linspace(0.0, H - 1.0, h)
    xs = jnp.linspace(0.0, W - 1.0, w)
    zz = jnp.clip(_guidance(rgb) * (D - 1), 0.0, D - 1.0)  # [h, w]
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))

    def tri(coords):
        z, y, x = coords
        z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        fz, fy, fx = z - z0, y - y0, x - x0
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    wgt = (
                        (fz if dz else 1 - fz)
                        * (fy if dy else 1 - fy)
                        * (fx if dx else 1 - fx)
                    )
                    out = out + wgt[..., None] * g[z0 + dz, y0 + dy, x0 + dx]
        return out

    aff = tri((zz, yy, xx))  # [h, w, 12]
    A = aff.reshape(h, w, 3, 4)
    return jnp.einsum("hwij,hwj->hwi", A[..., :3], rgb) + A[..., 3]


def bilagrid_tv_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Total variation over the grid dims (lib_bilagrid total_variation)."""
    tv = 0.0
    for axis in (1, 2, 3):
        d = jnp.diff(grids, axis=axis)
        tv = tv + jnp.mean(d * d)
    return tv
