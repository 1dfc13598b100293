"""Tile binning: which Gaussians touch which 16x16 (or other) screen tiles.

TPU-native equivalent of the reference's CUB-based pipeline
(/root/reference/gsplat/cuda/csrc/isect_tiles.cu and the torch oracle
/root/reference/gsplat/cuda/_torch_impl.py:331-402). Differences by design:

  * Static shapes: the intersection list lives in a fixed-``capacity`` buffer
    (overflow entries are dropped; ``n_isects`` is returned so callers can
    detect truncation and raise the capacity between steps). This is the
    static-shape answer to the reference's two-pass count+alloc.
  * The 64-bit radix-sort key (camera|tile|depth bit-packing,
    isect_tiles.cu:89-103) is replaced by a two-operand lexicographic
    ``jax.lax.sort`` on (int32 tile key, int32 depth bits) — positive-float
    bits sort like the floats, so no int64 is needed.
  * Offsets come from ``searchsorted`` instead of a dedicated kernel
    (isect_tiles.cu:308-354).
  * Gather-count discipline (TPU gathers are the expensive primitive here):
    all per-Gaussian fields consumed by the expansion are packed into ONE
    int32 table so the expansion does a single row gather.

All outputs are non-differentiable (indices), matching the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


class Intersections(NamedTuple):
    """Sorted tile-intersection list (static capacity).

    tiles_per_gauss: [C, N] int32
    tile_keys:       [cap] int32, cam*TH*TW + tile, sorted; INT32_MAX padding
    depths:          [cap] f32 (sorted secondary key)
    flatten_ids:     [cap] int32, cam*N + gauss per sorted entry
    n_isects:        scalar int32 (true count clamped to cap)
    exp_offsets:     [C*N + 1] int32 — start of each (cam,gauss)'s contiguous
                     run in *expansion* (pre-sort) order; used by the
                     rasterizer VJP for a scatter-free segment reduction
    inv_perm:        [cap] int32 — expansion position -> sorted position
    """

    tiles_per_gauss: jnp.ndarray
    tile_keys: jnp.ndarray
    depths: jnp.ndarray
    flatten_ids: jnp.ndarray
    n_isects: jnp.ndarray
    exp_offsets: jnp.ndarray
    inv_perm: jnp.ndarray


def isect_tiles(
    means2d: jnp.ndarray,  # [C, N, 2]
    radii: jnp.ndarray,  # [C, N] int32
    depths: jnp.ndarray,  # [C, N]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
    need_inv_perm: bool = True,
) -> Intersections:
    """Bin Gaussians to tiles; see :class:`Intersections`.

    ``need_inv_perm=False`` skips the inverse-permutation bookkeeping (one
    [cap] scatter + an extra sort payload) — the rasterizer's scatter-add
    backward reduction doesn't use it."""
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

    # One packed per-Gaussian table -> ONE row gather in the expansion.
    depth_bits = jax.lax.bitcast_convert_type(
        depths.reshape(-1).astype(jnp.float32), jnp.int32
    )
    base_key = (
        (jnp.arange(C, dtype=jnp.int32) * n_tiles)[:, None]
        + tile_min_y * tile_width
        + tile_min_x
    ).reshape(-1)
    table = jnp.stack(
        [offsets, nx.reshape(-1), base_key, depth_bits], axis=-1
    )  # [C*N, 4] i32

    src = jnp.repeat(
        jnp.arange(C * N, dtype=jnp.int32), counts, total_repeat_length=capacity
    )  # [cap]
    pos = jnp.arange(capacity, dtype=jnp.int32)
    valid = pos < jnp.minimum(total, capacity)

    g = jnp.take(table, src, axis=0)  # [cap, 4]
    rank = pos - g[:, 0]
    nx_s = jnp.maximum(g[:, 1], 1)
    dx = rank % nx_s
    dy = rank // nx_s
    tile_keys = g[:, 2] + dy * tile_width + dx
    tile_keys = jnp.where(valid, tile_keys, INT32_MAX)
    depth_keys = jnp.where(valid, g[:, 3], INT32_MAX)
    flatten_ids = jnp.where(valid, src, 0)

    # Lexicographic sort on (tile_key, depth bits); padding sorts last.
    n_isects = jnp.minimum(total, capacity).astype(jnp.int32)
    if need_inv_perm:
        # ``pos`` rides along to invert the permutation for the VJP's
        # scatter-free segment reduction.
        tile_keys, depth_keys, flatten_ids, sorted_pos = jax.lax.sort(
            (tile_keys, depth_keys, flatten_ids, pos), num_keys=2
        )
        # inv_perm[expansion position] = sorted position.
        inv_perm = (
            jnp.zeros((capacity,), jnp.int32)
            .at[sorted_pos]
            .set(pos, unique_indices=True)
        )
    else:
        tile_keys, depth_keys, flatten_ids = jax.lax.sort(
            (tile_keys, depth_keys, flatten_ids), num_keys=2
        )
        inv_perm = jnp.zeros((1,), jnp.int32)
    isect_depths = jax.lax.bitcast_convert_type(depth_keys, jnp.float32)
    exp_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.minimum(cum, capacity).astype(jnp.int32)]
    )
    return Intersections(
        tiles_per_gauss,
        tile_keys,
        isect_depths,
        flatten_ids,
        n_isects,
        exp_offsets,
        inv_perm,
    )


class AlignedIsects(NamedTuple):
    """Tile-aligned view of the sorted intersection list for the Pallas
    rasterizer: every tile's run is padded to a multiple of ``align`` entries
    so the kernel's chunk DMAs are hardware-aligned and backward writes are
    exactly collision-free.

    ids:        [cap2] int32, cam*N + gauss per aligned slot (padding slots
                point at the zero pad row and are masked by ``ends``)
    starts:     [T] int32 aligned start of each tile's run (multiple of align)
    ends:       [T] int32 true (unpadded) end of each tile's run
    inv_perm:   [cap] int32 expansion position -> aligned position
    n_isects:   scalar int32
    """

    ids: jnp.ndarray
    starts: jnp.ndarray
    ends: jnp.ndarray
    inv_perm: jnp.ndarray
    n_isects: jnp.ndarray


def align_isects(
    isect: Intersections,
    C: int,
    tile_width: int,
    tile_height: int,
    align: int = 128,
    need_inv_perm: bool = True,
) -> AlignedIsects:
    """Re-lay the sorted intersection list with per-tile runs padded to
    ``align`` entries.

    Gather-count discipline: the sorted->aligned map is
    new_pos[j] = j + delta[tile_keys[j]] with delta[t] = astarts[t] -
    offsets[t] — ONE gather from a [T]-sized table plus one [cap] scatter
    (everything else is [T]-sized arithmetic)."""
    cap = isect.tile_keys.shape[0]
    T = C * tile_width * tile_height
    offsets = isect_offset_encode(isect.tile_keys, C, tile_width, tile_height)
    lens = offsets[1:] - offsets[:-1]  # [T]
    plens = ((lens + align - 1) // align) * align
    astarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(plens).astype(jnp.int32)]
    )  # [T+1]
    cap2 = ((cap + T * align) // align + 2) * align

    # delta[T] entry for padding keys routes them to the dump slot.
    delta = jnp.concatenate(
        [astarts[:-1] - offsets[:-1], jnp.full((1,), cap2 - 1, jnp.int32)]
    )  # [T+1]
    j = jnp.arange(cap, dtype=jnp.int32)
    tkey = jnp.minimum(isect.tile_keys, T)  # clamp INT32_MAX padding -> T
    new_pos = jnp.where(
        tkey < T, j + jnp.take(delta, tkey), cap2 - 1
    )
    ids = (
        jnp.full((cap2,), -1, jnp.int32)
        .at[new_pos]
        .set(jnp.where(tkey < T, isect.flatten_ids, -1))
    )
    # (all padding entries collide on the dump slot cap2-1, writing -1 so it
    # never aliases a real Gaussian id; -1 marks alignment padding in runs.)

    inv_perm = (
        jnp.take(new_pos, isect.inv_perm)
        if need_inv_perm
        else jnp.zeros((1,), jnp.int32)
    )
    return AlignedIsects(
        ids=ids,
        starts=astarts[:-1],
        ends=astarts[:-1] + lens,
        inv_perm=inv_perm,
        n_isects=isect.n_isects,
    )


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
