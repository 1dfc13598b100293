"""Reference (oracle) rasterizer in pure jnp — the dual-implementation test
oracle, replacing the reference's ``_torch_impl._rasterize_to_pixels``
(/root/reference/gsplat/cuda/_torch_impl.py:522-619).

Materializes the full [C, N, H, W] alpha tensor, so it is only meant for small
test scenes; gradients come from plain ``jax.autodiff``. Semantics match the
CUDA tile kernel (rasterize_to_pixels_fwd.cu:137-184) exactly:

  * a Gaussian contributes to a pixel only if the pixel's tile is inside the
    Gaussian's [tile_min, tile_max) bounding box (the tile-binning rule);
  * sigma = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy; contributions with sigma < 0 are
    skipped; alpha = min(0.999, opac * exp(-sigma)); alpha < 1/255 skipped;
  * front-to-back compositing in (depth) order with early stop: Gaussian k is
    included iff the inclusive transmittance product after k stays > 1e-4.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
MAX_ALPHA = 0.999


def rasterize_to_pixels_ref(
    means2d: jnp.ndarray,  # [C, N, 2]
    conics: jnp.ndarray,  # [C, N, 3]
    colors: jnp.ndarray,  # [C, N, ch]
    opacities: jnp.ndarray,  # [C, N]
    depths: jnp.ndarray,  # [C, N] (defines compositing order)
    radii: jnp.ndarray,  # [C, N] int32 (0 = culled)
    width: int,
    height: int,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, ch]
    masks: Optional[jnp.ndarray] = None,  # [C, TH, TW] bool tile mask
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (render_colors [C,H,W,ch], render_alphas [C,H,W,1])."""
    C, N, _ = means2d.shape
    ch = colors.shape[-1]
    tile_width = -(-width // tile_size)
    tile_height = -(-height // tile_size)

    # Depth sort per camera (invisible gaussians to the back).
    alive0 = (
        jnp.maximum(radii[..., 0], radii[..., 1])
        if radii.ndim == means2d.ndim else radii
    ) > 0
    order = jnp.argsort(jnp.where(alive0, depths, jnp.inf), axis=1)  # [C, N]
    gather = lambda x: jnp.take_along_axis(
        x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
    )
    means2d = gather(means2d)
    conics = gather(conics)
    colors = gather(colors)
    opacities = gather(opacities)
    radii = gather(radii)

    # Pixel centers.
    px = jnp.arange(width, dtype=means2d.dtype) + 0.5  # [W]
    py = jnp.arange(height, dtype=means2d.dtype) + 0.5  # [H]
    dx = px[None, None, None, :] - means2d[..., 0][..., None, None]  # [C,N,1,W]
    dy = py[None, None, :, None] - means2d[..., 1][..., None, None]  # [C,N,H,1]

    a = conics[..., 0][..., None, None]
    b = conics[..., 1][..., None, None]
    c = conics[..., 2][..., None, None]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy  # [C,N,H,W]
    alpha = jnp.minimum(MAX_ALPHA, opacities[..., None, None] * jnp.exp(-sigma))

    # Tile-inclusion rule (isect_tiles bounds, _torch_impl.py:351-360).
    # radii may be scalar [C, N] or per-axis AABB [C, N, 2] (elliptical).
    if radii.ndim == means2d.ndim:
        trx = radii[..., 0].astype(means2d.dtype) / tile_size
        try_ = radii[..., 1].astype(means2d.dtype) / tile_size
        alive = jnp.maximum(radii[..., 0], radii[..., 1]) > 0
    else:
        trx = try_ = radii.astype(means2d.dtype) / tile_size
        alive = radii > 0
    tm = means2d / tile_size
    tile_min_x = jnp.clip(jnp.floor(tm[..., 0] - trx), 0, tile_width)
    tile_min_y = jnp.clip(jnp.floor(tm[..., 1] - try_), 0, tile_height)
    tile_max_x = jnp.clip(jnp.ceil(tm[..., 0] + trx), 0, tile_width)
    tile_max_y = jnp.clip(jnp.ceil(tm[..., 1] + try_), 0, tile_height)
    ptx = (jnp.arange(width) // tile_size).astype(means2d.dtype)  # [W]
    pty = (jnp.arange(height) // tile_size).astype(means2d.dtype)  # [H]
    in_x = (ptx[None, None, None, :] >= tile_min_x[..., None, None]) & (
        ptx[None, None, None, :] < tile_max_x[..., None, None]
    )
    in_y = (pty[None, None, :, None] >= tile_min_y[..., None, None]) & (
        pty[None, None, :, None] < tile_max_y[..., None, None]
    )
    visible = in_x & in_y & alive[..., None, None]
    if masks is not None:
        # Per-tile mask: pixels of disabled tiles render nothing
        # (rasterization.py `masks` arg semantics).
        pix_mask = jnp.repeat(
            jnp.repeat(masks, tile_size, axis=1), tile_size, axis=2
        )[:, :height, :width]
        visible &= pix_mask[:, None]

    alpha = jnp.where(visible & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD), alpha, 0.0)

    # Early-stop semantics via inclusive transmittance (see module docstring).
    log1ma = jnp.log1p(-alpha)
    logT_incl = jnp.cumsum(log1ma, axis=1)  # [C,N,H,W] after-k product
    include = logT_incl > jnp.log(TRANSMITTANCE_EPS)
    alpha = jnp.where(include, alpha, 0.0)
    log1ma = jnp.log1p(-alpha)
    logT_excl = jnp.cumsum(log1ma, axis=1) - log1ma  # before-k product
    weights = alpha * jnp.exp(logT_excl)  # [C,N,H,W]

    render = jnp.einsum("cnhw,cnk->chwk", weights, colors)
    alphas = jnp.sum(weights, axis=1)[..., None]  # [C,H,W,1]
    if backgrounds is not None:
        render = render + (1.0 - alphas) * backgrounds[:, None, None, :]
    return render, alphas
