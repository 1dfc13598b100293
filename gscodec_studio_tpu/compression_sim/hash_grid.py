"""Multi-resolution hash-grid encoder (Instant-NGP style) in pure JAX.

TPU-native equivalent of the reference's CUDA gridencoder
(/root/reference/third_party/gridencoder/: multi-res hash grids with
optionally STE-binarized embeddings), which powers the Gaussian-conditional
entropy model's position-conditioned mean/scale regressor
(gsplat/compression_simulation/gaussian_distribution_model.py:348-382:
12-level 3D grid + 4-level tri-plane 2D grids + MLP head).

All lookups are batched gathers; gradients reach the embedding tables via
the gather transpose (deterministic scatter-add) — no custom kernels needed
at these table sizes.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.compression_sim.ops import ste_binary

_PRIMES = (1, 2654435761, 805459861)


class HashGridCfg(NamedTuple):
    """Static (hashable) grid configuration — kept out of the param pytree so
    param trees stay pure arrays for grad/optax."""

    n_levels: int = 12
    n_features: int = 2
    table_size: int = 1 << 19
    base_resolution: int = 16
    per_level_scale: float = 1.447
    dim: int = 3


def hash_grid_init(
    key: jax.Array,
    n_levels: int = 12,
    n_features: int = 2,
    log2_hashmap_size: int = 19,
    base_resolution: int = 16,
    per_level_scale: float = 1.447,
    dim: int = 3,
) -> Tuple[jnp.ndarray, HashGridCfg]:
    """-> (tables [n_levels, table_size, n_features], static cfg)."""
    cfg = HashGridCfg(
        n_levels=n_levels, n_features=n_features,
        table_size=1 << log2_hashmap_size, base_resolution=base_resolution,
        per_level_scale=per_level_scale, dim=dim,
    )
    tables = jax.random.uniform(
        key, (n_levels, cfg.table_size, n_features), minval=-1e-4, maxval=1e-4
    )
    return tables, cfg


def _hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer coords [..., dim] -> [0, table_size).
    uint32 wraparound arithmetic (the standard NGP hash)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, coords.shape[-1]):
        h = h ^ (c[..., d] * jnp.uint32(_PRIMES[d % 3]))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def hash_grid_encode(
    tables: jnp.ndarray,
    cfg: HashGridCfg,
    x: jnp.ndarray,  # [N, dim] in [0, 1]
    binarize: bool = False,
) -> jnp.ndarray:
    """-> [N, n_levels * n_features]. ``binarize`` applies the STE sign
    quantization the reference uses to make tables 1-bit codable."""
    dim = cfg.dim
    if binarize:
        tables = ste_binary(tables)
    outs = []
    n_corners = 1 << dim
    corner_offsets = jnp.asarray(
        [[(c >> d) & 1 for d in range(dim)] for c in range(n_corners)],
        jnp.int32,
    )  # [2^dim, dim]
    for lvl in range(cfg.n_levels):
        res = int(math.floor(cfg.base_resolution * cfg.per_level_scale**lvl))
        xs = jnp.clip(x, 0.0, 1.0) * (res - 1)
        x0 = jnp.floor(xs).astype(jnp.int32)
        f = xs - x0  # [N, dim]
        corners = x0[:, None, :] + corner_offsets[None]  # [N, 2^dim, dim]
        idx = _hash(jnp.clip(corners, 0, res - 1), cfg.table_size)
        emb = jnp.take(tables[lvl], idx, axis=0)  # [N, 2^dim, F]
        w = jnp.ones(f.shape[:1] + (n_corners,), x.dtype)
        for d in range(dim):
            wd = jnp.where(corner_offsets[None, :, d] == 1, f[:, d : d + 1],
                           1 - f[:, d : d + 1])
            w = w * wd
        outs.append(jnp.sum(w[..., None] * emb, axis=1))  # [N, F]
    return jnp.concatenate(outs, axis=-1)


def gaussian_conditional_init(
    key: jax.Array,
    channel: int,
    n_levels_3d: int = 12,
    n_levels_2d: int = 4,
    mlp_width: int = 64,
    log2_hashmap_3d: int = 19,
    log2_hashmap_2d: int = 17,
) -> Dict:
    """Position-conditioned (mu, sigma) regressor: 3D hash grid + tri-plane
    2D grids + 2-layer MLP (gaussian_distribution_model.py:348-382)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    grid3d, cfg3d = hash_grid_init(k1, n_levels=n_levels_3d, dim=3,
                                   log2_hashmap_size=log2_hashmap_3d)
    planes, cfg2d = [], None
    for k in (k2, k3, k4):
        t, cfg2d = hash_grid_init(k, n_levels=n_levels_2d, dim=2,
                                  log2_hashmap_size=log2_hashmap_2d)
        planes.append(t)
    in_dim = n_levels_3d * 2 + 3 * n_levels_2d * 2
    w_scale = (2.0 / in_dim) ** 0.5
    mlp = [
        {"w": w_scale * jax.random.normal(k5, (in_dim, mlp_width)),
         "b": jnp.zeros(mlp_width)},
        {"w": (2.0 / mlp_width) ** 0.5
         * jax.random.normal(jax.random.split(k5)[0], (mlp_width, 2 * channel)),
         "b": jnp.zeros(2 * channel)},
    ]
    params = {"grid3d": grid3d, "planes": planes, "mlp": mlp}
    return params, (cfg3d, cfg2d, channel)


def gaussian_conditional_apply(
    params: Dict, cfgs, pos: jnp.ndarray, binarize: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pos [N, 3] in [0,1] -> (mean [N, C], scale [N, C])."""
    cfg3d, cfg2d, channel = cfgs
    feats = [hash_grid_encode(params["grid3d"], cfg3d, pos, binarize)]
    for axes, plane in zip(((0, 1), (0, 2), (1, 2)), params["planes"]):
        feats.append(
            hash_grid_encode(plane, cfg2d, pos[:, list(axes)], binarize)
        )
    h = jnp.concatenate(feats, axis=-1)
    for i, layer in enumerate(params["mlp"]):
        h = h @ layer["w"] + layer["b"]
        if i + 1 < len(params["mlp"]):
            h = jax.nn.relu(h)
    mean, raw_scale = h[:, :channel], h[:, channel:]
    return mean, jax.nn.softplus(raw_scale) + 1e-4


def gaussian_conditional_bits(
    params: Dict,
    cfgs,
    x: jnp.ndarray,  # [N, C] quantized values
    pos: jnp.ndarray,  # [N, 3] normalized positions
    q_step: float,
    binarize: bool = False,
) -> jnp.ndarray:
    """Estimated bits under the position-conditioned Gaussian
    (Entropy_gaussian hash path, entropy_model.py:313-345)."""
    from gscodec_studio_tpu.compression_sim.entropy_model import gaussian_bits

    mean, scale = gaussian_conditional_apply(params, cfgs, pos, binarize)
    return gaussian_bits(x, mean, scale, q_step)
