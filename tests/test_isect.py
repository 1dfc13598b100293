"""Tile-binning parity vs the upstream torch oracle (_torch_impl._isect_tiles),
matching the bit-exact key test of reference tests/test_basic.py:443-472 —
adapted to our (tile_key, depth) two-operand sort design."""

import numpy as np
import pytest

import jax.numpy as jnp

from gscodec_studio_tpu.ops import fully_fused_projection
from gscodec_studio_tpu.ops.isect import isect_tiles, isect_offset_encode, INT32_MAX

from tests.reference_oracle import get_torch_impl

ref = get_torch_impl()
needs_ref = pytest.mark.skipif(ref is None, reason="reference oracle unavailable")


@needs_ref
def test_isect_tiles_parity(rng, test_scene):
    import torch

    s = test_scene
    tile_size = 16
    tile_width = -(-s["width"] // tile_size)
    tile_height = -(-s["height"] // tile_size)
    C, N = s["viewmats"].shape[0], s["means"].shape[0]

    radii, means2d, depths, conics, _ = fully_fused_projection(
        jnp.asarray(s["means"]),
        None,
        jnp.asarray(s["quats"]),
        jnp.asarray(s["scales"]),
        jnp.asarray(s["viewmats"]),
        jnp.asarray(s["Ks"]),
        s["width"],
        s["height"],
    )

    capacity = 16384
    isect = isect_tiles(
        means2d, radii, depths, tile_size, tile_width, tile_height, capacity
    )
    tiles_per_gauss, tile_keys, isect_depths, flatten_ids, n_isects = (
        isect.tiles_per_gauss, isect.tile_keys, isect.depths,
        isect.flatten_ids, isect.n_isects,
    )
    n_isects = int(n_isects)
    assert n_isects < capacity, "test capacity too small"

    tpg_ref, isect_ids_ref, flatten_ids_ref = ref._isect_tiles(
        torch.from_numpy(np.asarray(means2d)),
        torch.from_numpy(np.asarray(radii)),
        torch.from_numpy(np.asarray(depths)),
        tile_size,
        tile_width,
        tile_height,
    )
    np.testing.assert_array_equal(tiles_per_gauss, tpg_ref.numpy())
    assert n_isects == len(isect_ids_ref)

    # Decode the reference's packed 64-bit keys: cam|tile|depth-bits.
    tile_n_bits = (tile_width * tile_height).bit_length()
    ids = isect_ids_ref.numpy().astype(np.uint64)
    cam_ref = (ids >> np.uint64(32 + tile_n_bits)).astype(np.int64)
    tile_ref = ((ids >> np.uint64(32)) & np.uint64((1 << tile_n_bits) - 1)).astype(
        np.int64
    )
    depth_ref = (ids & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.float32)

    keys = np.asarray(tile_keys[:n_isects])
    np.testing.assert_array_equal(
        keys, cam_ref * tile_width * tile_height + tile_ref
    )
    np.testing.assert_allclose(np.asarray(isect_depths[:n_isects]), depth_ref)
    # flatten ids may permute within equal (tile, depth) keys; compare as sets
    # grouped by key.
    ours = np.asarray(flatten_ids[:n_isects])
    theirs = flatten_ids_ref.numpy()
    order_o = np.lexsort((ours, keys))
    order_t = np.lexsort((theirs, keys))
    np.testing.assert_array_equal(ours[order_o], theirs[order_t])

    # Padding sorted to the end.
    assert np.all(np.asarray(tile_keys[n_isects:]) == INT32_MAX)

    # Offsets bracket exactly the matching keys.
    offsets = np.asarray(isect_offset_encode(tile_keys, C, tile_width, tile_height))
    assert offsets[-1] == n_isects
    for tid in range(0, C * tile_width * tile_height, 7):
        lo, hi = offsets[tid], offsets[tid + 1]
        assert np.all(keys[lo:hi] == tid)


def test_isect_tiles_overflow(rng, test_scene):
    """When capacity is too small, n_isects reports the true total clamped and
    the buffer stays well-formed."""
    s = test_scene
    radii, means2d, depths, _, _ = fully_fused_projection(
        jnp.asarray(s["means"]),
        None,
        jnp.asarray(s["quats"]),
        jnp.asarray(s["scales"]),
        jnp.asarray(s["viewmats"]),
        jnp.asarray(s["Ks"]),
        s["width"],
        s["height"],
    )
    tile_size = 16
    tw, th = -(-s["width"] // tile_size), -(-s["height"] // tile_size)
    cap = 128
    res = isect_tiles(means2d, radii, depths, tile_size, tw, th, cap)
    tile_keys, n_isects = res.tile_keys, res.n_isects
    assert int(n_isects) == cap
    assert np.all(np.asarray(tile_keys) != INT32_MAX)
