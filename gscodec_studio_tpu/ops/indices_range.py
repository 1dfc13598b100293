"""Iterative index rasterization — ``rasterize_to_indices_in_range``
(reference gsplat/cuda/_wrapper.py:572 / rasterize_to_indices_in_range.cu).

Enumerates the (gaussian, pixel, camera) intersections that CONTRIBUTE
(alpha >= 1/255 and transmittance > 1e-4) for a near-to-far depth batch
``[range_start, range_end)``, continuing from per-pixel incoming
transmittances — the memory-bounded building block behind the reference's
pure-torch rasterizer (_torch_impl.py:522-619).

TPU-native differences: static shapes throughout — the output list has a
fixed ``out_capacity`` (valid prefix length returned alongside; compaction
is one sort, no atomics), and the depth batch indexes the GLOBAL depth
order (equivalent per pixel to the reference's per-tile depth-sorted
lists). The updated transmittance map is returned instead of being
recomputed by the caller.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
MAX_ALPHA = 0.999


def rasterize_to_indices_in_range(
    range_start: int,
    range_end: int,
    transmittances: jnp.ndarray,  # [C, H, W] current per-pixel T
    means2d: jnp.ndarray,  # [C, N, 2]
    conics: jnp.ndarray,  # [C, N, 3]
    opacities: jnp.ndarray,  # [C, N]
    depths: jnp.ndarray,  # [C, N] (global sort keys)
    radii: jnp.ndarray,  # [C, N]
    width: int,
    height: int,
    tile_size: int = 16,
    out_capacity: int = 1 << 20,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (gaussian_ids [M], pixel_ids [M], camera_ids [M], n_valid,
    new_transmittances [C, H, W]); entries beyond n_valid are -1."""
    C, N, _ = means2d.shape
    R = range_end - range_start

    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf), axis=1)
    sel = order[:, range_start:range_end]  # [C, R] original ids
    take = lambda x: jnp.take_along_axis(
        x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), axis=1
    )
    m2d = take(means2d)
    con = take(conics)
    op = take(opacities)
    rad = take(radii)

    px = jnp.arange(width, dtype=jnp.float32)[None, None, None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[None, None, :, None] + 0.5
    dx = m2d[..., 0][..., None, None] - px  # [C, R, H, W]
    dy = m2d[..., 1][..., None, None] - py
    ca = con[..., 0][..., None, None]
    cb = con[..., 1][..., None, None]
    cc = con[..., 2][..., None, None]
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha = jnp.minimum(MAX_ALPHA, op[..., None, None] * jnp.exp(-sigma))

    # tile-inclusion rule (same binning as the pipeline)
    tw, th = -(-width // tile_size), -(-height // tile_size)
    tr = rad.astype(jnp.float32) / tile_size
    tm = m2d / tile_size
    tminx = jnp.clip(jnp.floor(tm[..., 0] - tr), 0, tw)[..., None, None]
    tminy = jnp.clip(jnp.floor(tm[..., 1] - tr), 0, th)[..., None, None]
    tmaxx = jnp.clip(jnp.ceil(tm[..., 0] + tr), 0, tw)[..., None, None]
    tmaxy = jnp.clip(jnp.ceil(tm[..., 1] + tr), 0, th)[..., None, None]
    ptx = (jnp.arange(width) // tile_size).astype(jnp.float32)
    pty = (jnp.arange(height) // tile_size).astype(jnp.float32)
    in_tile = (
        (ptx[None, None, None, :] >= tminx)
        & (ptx[None, None, None, :] < tmaxx)
        & (pty[None, None, :, None] >= tminy)
        & (pty[None, None, :, None] < tmaxy)
        & (rad > 0)[..., None, None]
    )
    alpha = jnp.where(
        in_tile & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD), alpha, 0.0
    )

    # continue compositing from the incoming transmittances
    log1ma = jnp.log1p(-alpha)
    logT_in = jnp.log(jnp.maximum(transmittances, 1e-12))[:, None]
    logT_incl = jnp.cumsum(log1ma, axis=1) + logT_in
    keep = logT_incl > jnp.log(TRANSMITTANCE_EPS)
    alpha = jnp.where(keep, alpha, 0.0)
    log1ma = jnp.log1p(-alpha)
    logT_incl = jnp.cumsum(log1ma, axis=1) + logT_in
    new_T = jnp.exp(logT_incl[:, -1]) if R > 0 else transmittances

    contrib = alpha > 0.0  # [C, R, H, W]

    # static-shape compaction: sort all C*R*H*W flags valid-first carrying
    # the flat index; take the first out_capacity
    import jax

    flat = contrib.reshape(-1)
    key = jnp.where(flat, 0, 1).astype(jnp.int32)
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    order2 = jax.lax.sort((key, idx), num_keys=1, is_stable=True)[1]
    order2 = order2[:out_capacity]
    valid = jnp.take(flat, order2)
    n_valid = jnp.sum(contrib).astype(jnp.int32)

    HW = height * width
    cam_ids = order2 // (R * HW)
    rank = (order2 % (R * HW)) // HW
    pixel_ids = order2 % HW
    gauss_ids = sel[cam_ids, rank]
    out_g = jnp.where(valid, gauss_ids, -1)
    out_p = jnp.where(valid, pixel_ids, -1)
    out_c = jnp.where(valid, cam_ids, -1)
    return out_g, out_p, out_c, jnp.minimum(n_valid, out_capacity), new_T
