"""Tile binning: which Gaussians touch which 16x16 (or other) screen tiles.

TPU-native equivalent of the reference's CUB-based pipeline
(/root/reference/gsplat/cuda/csrc/isect_tiles.cu and the torch oracle
/root/reference/gsplat/cuda/_torch_impl.py:331-402). Differences by design:

  * Static shapes: the intersection list lives in a fixed-``capacity`` buffer
    (overflow entries are dropped; ``n_isects`` is returned so callers can
    detect truncation and raise the capacity between steps). This is the
    static-shape answer to the reference's two-pass count+alloc.
  * The 64-bit radix-sort key (camera|tile|depth bit-packing,
    isect_tiles.cu:89-103) is replaced by a multi-operand lexicographic
    ``jax.lax.sort`` on (int32 tile key, float32 depth) — no int64 needed.
  * Offsets come from ``searchsorted`` instead of a dedicated kernel
    (isect_tiles.cu:308-354).

All outputs are non-differentiable (indices), matching the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


def isect_tiles(
    means2d: jnp.ndarray,  # [C, N, 2]
    radii: jnp.ndarray,  # [C, N] int32
    depths: jnp.ndarray,  # [C, N]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tiles_per_gauss [C,N] i32, tile_keys [cap] i32,
    isect_depths [cap] f32, flatten_ids [cap] i32, n_isects scalar i32).

    ``tile_keys[i] = cam_id * (TH*TW) + tile_id`` for valid entries, INT32_MAX
    for padding; entries are sorted by (tile_key, depth) ascending.
    ``flatten_ids[i] = cam_id * N + gauss_id`` indexes the projected arrays.
    """
    C, N = radii.shape
    n_tiles = tile_width * tile_height
    assert C * n_tiles < INT32_MAX, "tile key overflows int32"

    # Per-Gaussian tile bounds (matches _torch_impl.py:351-360).
    tm = means2d / tile_size
    tr = radii.astype(means2d.dtype) / tile_size
    tile_min_x = jnp.clip(jnp.floor(tm[..., 0] - tr), 0, tile_width).astype(jnp.int32)
    tile_min_y = jnp.clip(jnp.floor(tm[..., 1] - tr), 0, tile_height).astype(jnp.int32)
    tile_max_x = jnp.clip(jnp.ceil(tm[..., 0] + tr), 0, tile_width).astype(jnp.int32)
    tile_max_y = jnp.clip(jnp.ceil(tm[..., 1] + tr), 0, tile_height).astype(jnp.int32)
    nx = tile_max_x - tile_min_x
    ny = tile_max_y - tile_min_y
    tiles_per_gauss = jnp.where(radii > 0, nx * ny, 0)  # [C, N]

    counts = tiles_per_gauss.reshape(-1)  # [C*N]
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts  # exclusive prefix

    # Expand: one row per (gaussian, covered-tile) pair, gaussian-major order.
    src = jnp.repeat(
        jnp.arange(C * N, dtype=jnp.int32), counts, total_repeat_length=capacity
    )  # [cap]
    pos = jnp.arange(capacity, dtype=jnp.int32)
    valid = pos < jnp.minimum(total, capacity)
    rank = pos - offsets[src]  # position within the gaussian's tile run

    nx_s = jnp.maximum(nx.reshape(-1)[src], 1)
    dx = rank % nx_s
    dy = rank // nx_s
    tx = tile_min_x.reshape(-1)[src] + dx
    ty = tile_min_y.reshape(-1)[src] + dy
    cam_id = src // N
    tile_keys = cam_id * n_tiles + ty * tile_width + tx
    tile_keys = jnp.where(valid, tile_keys, INT32_MAX)
    isect_depths = jnp.where(valid, depths.reshape(-1)[src], jnp.inf).astype(
        means2d.dtype
    )
    flatten_ids = jnp.where(valid, src, 0)

    # Lexicographic sort on (tile_key, depth); padding (INT32_MAX) goes last.
    tile_keys, isect_depths, flatten_ids = jax.lax.sort(
        (tile_keys, isect_depths, flatten_ids), num_keys=2
    )
    n_isects = jnp.minimum(total, capacity).astype(jnp.int32)
    return tiles_per_gauss, tile_keys, isect_depths, flatten_ids, n_isects


def isect_offset_encode(
    tile_keys: jnp.ndarray,  # [cap] sorted, INT32_MAX padded
    C: int,
    tile_width: int,
    tile_height: int,
) -> jnp.ndarray:
    """Start offset of each tile's run in the sorted intersection list.

    Returns [C*TH*TW + 1] int32; tile t owns entries
    ``[offsets[t], offsets[t+1])``. (Reference returns [C,TH,TW] starts,
    isect_tiles.cu:308-354 — the extra trailing entry replaces its implicit
    "next tile start" logic.)
    """
    n_tiles_total = C * tile_width * tile_height
    targets = jnp.arange(n_tiles_total + 1, dtype=jnp.int32)
    return jnp.searchsorted(tile_keys, targets, side="left").astype(jnp.int32)
