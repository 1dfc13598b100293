"""2DGS oracle rasterizer in pure jnp (dual-implementation of the CUDA
kernel /root/reference/gsplat/cuda/csrc/rasterize_to_pixels_2dgs_fwd.cu:200-360
and the torch oracle _torch_impl_2dgs.py).

Per (pixel, surfel): ray-splat intersection via the homogeneous-plane cross
product, kernel weight = min(UV-space Gaussian, 2x-filtered 2D Gaussian),
then front-to-back compositing producing colors, alpha, accumulated normals,
the Mip-NeRF-360-style distortion accumulator, and median depth (first
crossing of T <= 0.5). O(C*N*H*W) memory — test oracle and small scenes;
gradients via jax autodiff.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
MAX_ALPHA = 0.999
FILTER_INV_SQUARE = 2.0


def rasterize_to_pixels_2dgs_ref(
    means2d: jnp.ndarray,  # [C, N, 2]
    ray_transforms: jnp.ndarray,  # [C, N, 3, 3]
    colors: jnp.ndarray,  # [C, N, ch] (LAST channel must be depth if
    #                       distortion/median outputs are wanted)
    opacities: jnp.ndarray,  # [C, N]
    normals: jnp.ndarray,  # [C, N, 3]
    depths: jnp.ndarray,  # [C, N] (sort key)
    radii: jnp.ndarray,  # [C, N]
    width: int,
    height: int,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,
):
    """Returns (colors [C,H,W,ch], alphas [C,H,W,1], render_normals [C,H,W,3],
    distort [C,H,W,1], median_depth [C,H,W,1])."""
    C, N, _ = means2d.shape
    ch = colors.shape[-1]
    tw = -(-width // tile_size)
    th = -(-height // tile_size)

    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf), axis=1)
    gather = lambda x: jnp.take_along_axis(
        x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
    )
    means2d = gather(means2d)
    M = gather(ray_transforms.reshape(C, N, 9)).reshape(C, N, 3, 3)
    colors = gather(colors)
    opacities = gather(opacities)
    normals = gather(normals)
    radii = gather(radii)

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    PX = px[None, None, None, :]  # [1,1,1,W]
    PY = py[None, None, :, None]  # [1,1,H,1]

    M0 = M[..., 0, :][..., None, None, :]  # [C,N,1,1,3]
    M1 = M[..., 1, :][..., None, None, :]
    M2 = M[..., 2, :][..., None, None, :]
    # h_u = px*M2 - M0 ; h_v = py*M2 - M1 (each [C,N,H,W,3])
    h_u = PX[..., None] * M2 - M0
    h_v = PY[..., None] * M2 - M1
    cross = jnp.cross(h_u, h_v)  # [C,N,H,W,3]
    cz = cross[..., 2]
    safe_cz = jnp.where(cz == 0, 1.0, cz)
    s_u = cross[..., 0] / safe_cz
    s_v = cross[..., 1] / safe_cz
    gw3d = s_u * s_u + s_v * s_v
    dx = means2d[..., 0][..., None, None] - PX
    dy = means2d[..., 1][..., None, None] - PY
    gw2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(gw3d, gw2d)
    alpha = jnp.minimum(MAX_ALPHA, opacities[..., None, None] * jnp.exp(-sigma))

    # Tile-inclusion rule (same binning as 3DGS).
    tr = radii.astype(jnp.float32) / tile_size
    tm = means2d / tile_size
    tminx = jnp.clip(jnp.floor(tm[..., 0] - tr), 0, tw)
    tminy = jnp.clip(jnp.floor(tm[..., 1] - tr), 0, th)
    tmaxx = jnp.clip(jnp.ceil(tm[..., 0] + tr), 0, tw)
    tmaxy = jnp.clip(jnp.ceil(tm[..., 1] + tr), 0, th)
    ptx = (jnp.arange(width) // tile_size).astype(jnp.float32)
    pty = (jnp.arange(height) // tile_size).astype(jnp.float32)
    in_x = (ptx[None, None, None, :] >= tminx[..., None, None]) & (
        ptx[None, None, None, :] < tmaxx[..., None, None]
    )
    in_y = (pty[None, None, :, None] >= tminy[..., None, None]) & (
        pty[None, None, :, None] < tmaxy[..., None, None]
    )
    visible = in_x & in_y & (radii > 0)[..., None, None] & (cz != 0)
    alpha = jnp.where(
        visible & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD), alpha, 0.0
    )

    log1ma = jnp.log1p(-alpha)
    logT_incl = jnp.cumsum(log1ma, axis=1)
    include = logT_incl > jnp.log(TRANSMITTANCE_EPS)
    alpha = jnp.where(include, alpha, 0.0)
    log1ma = jnp.log1p(-alpha)
    logT_incl = jnp.cumsum(log1ma, axis=1)
    logT_excl = logT_incl - log1ma
    T_prev = jnp.exp(logT_excl)
    w = alpha * T_prev  # vis [C,N,H,W]

    out = jnp.einsum("cnhw,cnk->chwk", w, colors)
    out_n = jnp.einsum("cnhw,cnk->chwk", w, normals)
    alphas = jnp.sum(w, axis=1)[..., None]

    depth_ch = colors[..., -1]  # [C, N]
    wz = w * depth_ch[..., None, None]
    # distortion: 2 * sum_i [w_i z_i (1 - T_i_before... per kernel:
    # distort += 2*(vis*z*(1-T) - vis*accum_vis_depth_before)
    one_m_T = 1.0 - T_prev  # accumulated alpha BEFORE i
    accum_before = jnp.cumsum(wz, axis=1) - wz
    distort = jnp.sum(
        2.0 * (wz * one_m_T - w * accum_before), axis=1
    )[..., None]

    # median depth: depth of the last included splat with T_prev > 0.5
    med_sel = (T_prev > 0.5) & (w > 0)
    idx = jnp.arange(N)[None, :, None, None]
    last = jnp.max(jnp.where(med_sel, idx, -1), axis=1)  # [C,H,W]
    z_sorted = jnp.broadcast_to(
        depth_ch[..., None, None], w.shape
    )
    med = jnp.take_along_axis(
        z_sorted, jnp.maximum(last, 0)[:, None], axis=1
    )[:, 0]
    med = jnp.where(last >= 0, med, 0.0)[..., None]

    if backgrounds is not None:
        out = out + (1.0 - alphas) * backgrounds[:, None, None, :]
    return out, alphas, out_n, distort, med
