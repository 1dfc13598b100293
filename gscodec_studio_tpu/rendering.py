"""Top-level rendering API: ``rasterization()``.

TPU-native equivalent of the reference entry point
(/root/reference/gsplat/rendering.py:28): projection -> SH -> tile binning ->
pixel rasterization, returning (render_colors, render_alphas, meta).

Key design departures (all static-shape / jit-friendly):
  * no "packed" variant — dense [C, N] with a radii==0 mask plus a fixed
    ``isect_capacity`` intersection buffer replaces the reference's dynamic
    [nnz] tensors;
  * the rasterizer backend is selectable: "pallas" (TPU tile kernel, the
    production path) or "reference" (pure-jnp oracle, O(C*N*H*W) memory — for
    tests and tiny scenes);
  * everything composes under ``jax.jit`` / ``jax.grad`` / ``shard_map``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.projection import fully_fused_projection
from gscodec_studio_tpu.ops.sh import spherical_harmonics
from gscodec_studio_tpu.ops.isect import isect_tiles, isect_offset_encode
from gscodec_studio_tpu.ops.rasterize_ref import rasterize_to_pixels_ref

RENDER_MODES = ("RGB", "D", "ED", "RGB+D", "RGB+ED")


def _default_isect_capacity(C: int, N: int) -> int:
    """Heuristic static capacity for the intersection buffer: ~8 tiles per
    visible Gaussian, rounded up to a multiple of 1024."""
    cap = max(C * N * 8, 1 << 16)
    return ((cap + 1023) // 1024) * 1024


def rasterization(
    means: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3] (linear, i.e. already exp'ed)
    opacities: jnp.ndarray,  # [N] (linear, i.e. already sigmoided)
    colors: jnp.ndarray,  # [(C,) N, D] or [(C,) N, K, 3] SH coefficients
    viewmats: jnp.ndarray,  # [C, 4, 4]
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    sh_degree: Optional[int] = None,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, D]
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",  # or "antialiased"
    camera_model: str = "pinhole",
    isect_capacity: Optional[int] = None,
    channel_chunk: int = 32,
    rasterizer: str = "fused",
    cutoff_mode: str = "exact",  # fused only: "soft" = chunk-granular
    # early-out (cheaper pair math, sub-1e-4 tail admitted)
    grad_dtype: str = "f32",  # fused only: per-isect grad row precision
    log_composite: bool = False,  # fused only: MXU log-space transmittance
    attr_dtype: str = "f32",  # fused only: sorted-table opacity/color rows
    # as bf16 pairs (fewer tile-sort payloads, half the kernel DMA bytes)
    geom_dtype: str = "f32",  # fused only: "u16" packs the (x, y) rows as
    # one u16 fixed-point pair (1/8 px) — one fewer tile-sort payload
    means2d_probe: Optional[jnp.ndarray] = None,
    absgrad_probe: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Differentiable batched splat rendering (reference rendering.py:28-890).

    Returns (render_colors [C,H,W,X], render_alphas [C,H,W,1], meta). X follows
    ``render_mode``: RGB -> D, D/ED -> 1, RGB+D/RGB+ED -> D+1.

    ``colors`` may be per-camera ([C,N,D]) or shared ([N,D]); with
    ``sh_degree`` set they are SH coefficients [(C,)N,K,3] evaluated along the
    camera->gaussian direction.
    """
    C = viewmats.shape[0]
    N = means.shape[0]
    assert render_mode in RENDER_MODES, render_mode
    assert rasterize_mode in ("classic", "antialiased"), rasterize_mode

    calc_compensations = rasterize_mode == "antialiased"
    # the fused backend bins with per-axis elliptical AABBs (tighter rects
    # for elongated splats -> fewer intersections); other backends expect
    # the reference scalar radius
    elliptical = rasterizer == "fused"
    radii, means2d, depths, conics, compensations = fully_fused_projection(
        means,
        None,
        quats,
        scales,
        viewmats,
        Ks,
        width,
        height,
        eps2d=eps2d,
        near_plane=near_plane,
        far_plane=far_plane,
        radius_clip=radius_clip,
        calc_compensations=calc_compensations,
        camera_model=camera_model,
        opacities=opacities,  # opacity-aware tight radius (exact culling)
        elliptical=elliptical,
    )
    # Opacity culling: a splat with linear opacity < 1/255 can never pass the
    # kernel's alpha threshold (alpha = op*exp(-sigma) <= op), so drop it from
    # binning. This is exact, and it is what makes dead capacity slots
    # (models/splats.py) free: they never reach the intersection buffer.
    opac_ok = opacities[None, :] >= 1.0 / 255.0
    radii = jnp.where(
        opac_ok[..., None] if elliptical else opac_ok, radii, 0
    )
    radii_scalar = jnp.max(radii, axis=-1) if elliptical else radii

    if means2d_probe is not None:
        # Zero-valued probe whose gradient is the screen-space position
        # gradient the densification strategies consume (the JAX analog of
        # the reference's info["means2d"].retain_grad(),
        # simple_trainer.py:940-946).
        means2d = means2d + means2d_probe

    opacities_cn = jnp.broadcast_to(opacities[None, :], (C, N))
    if compensations is not None:
        opacities_cn = opacities_cn * compensations

    # Color preparation (rendering.py:352-392).
    if sh_degree is None:
        # colors: [N, D] or [C, N, D]
        if colors.ndim == 2:
            colors_cn = jnp.broadcast_to(colors[None], (C, N, colors.shape[-1]))
        else:
            colors_cn = colors
    else:
        campos = -jnp.einsum("cij,ci->cj", viewmats[:, :3, :3], viewmats[:, :3, 3])
        dirs = means[None, :, :] - campos[:, None, :]  # [C, N, 3]
        shs = colors if colors.ndim == 4 else jnp.broadcast_to(
            colors[None], (C,) + colors.shape
        )
        colors_cn = spherical_harmonics(
            sh_degree, dirs, shs, masks=radii_scalar > 0
        )
        colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)  # Inria parity

    # Depth rendering modes (rendering.py:481-492).
    if render_mode in ("D", "ED"):
        colors_cn = depths[..., None]
        backgrounds_used = None
    elif render_mode in ("RGB+D", "RGB+ED"):
        colors_cn = jnp.concatenate([colors_cn, depths[..., None]], axis=-1)
        backgrounds_used = (
            None
            if backgrounds is None
            else jnp.concatenate(
                [backgrounds, jnp.zeros((C, 1), backgrounds.dtype)], axis=-1
            )
        )
    else:
        backgrounds_used = backgrounds

    # Tile binning + pixel rasterization.
    tile_width = -(-width // tile_size)
    tile_height = -(-height // tile_size)
    if isect_capacity is None:
        isect_capacity = _default_isect_capacity(C, N)

    D = colors_cn.shape[-1]
    meta_extra: Dict = {}
    if rasterizer == "fused":
        # Production path: fused binning + Pallas tile kernels
        # (ops/raster_v2.py) — the isect_tiles/offset_encode stages live
        # inside the op. Unlike the reference's CUDA kernels (COLOR_DIM
        # templates force chunking at 32, rendering.py:528-556), the v2
        # kernel parametrizes the channel count, so wide feature renders
        # (sandwich STG at 35ch) BIN ONCE and rasterize once; only renders
        # beyond the VMEM-safe width fall back to the chunk loop, which
        # re-runs the binning per chunk.
        from gscodec_studio_tpu.ops.raster_v2 import rasterize_to_pixels_v2

        fused_chunk = max(channel_chunk, 128)
        chunks = []
        alphas = None
        for lo in range(0, D, fused_chunk):
            cols = colors_cn[..., lo : lo + fused_chunk]
            bgs = (
                None
                if backgrounds_used is None
                else backgrounds_used[..., lo : lo + fused_chunk]
            )
            img, alphas, vmeta = rasterize_to_pixels_v2(
                means2d, conics, cols, opacities_cn, depths, radii,
                width, height, tile_size=tile_size,
                isect_capacity=isect_capacity, backgrounds=bgs,
                absgrad_probe=absgrad_probe, cutoff_mode=cutoff_mode,
                grad_dtype=grad_dtype, attr_dtype=attr_dtype,
                log_composite=log_composite, geom_dtype=geom_dtype,
            )
            chunks.append(img)
        render_colors = (
            chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, -1)
        )
        render_alphas = alphas
        meta_extra = dict(n_isects=vmeta["n_isects"])
    else:
        if absgrad_probe is not None:
            raise ValueError(
                "absgrad accumulation requires the 'fused' rasterizer"
            )
        from gscodec_studio_tpu.ops.rasterize_pallas import SEGRED_MODE

        isect = isect_tiles(
            means2d, radii_scalar, depths, tile_size, tile_width,
            tile_height,
            isect_capacity,
            need_inv_perm=(rasterizer != "pallas" or SEGRED_MODE == "cumsum"),
        )
        tile_offsets = isect_offset_encode(
            isect.tile_keys, C, tile_width, tile_height
        )

        # Chunked when channels exceed channel_chunk (rendering.py:528-556).
        chunks = []
        alphas = None
        for lo in range(0, D, channel_chunk):
            cols = colors_cn[..., lo : lo + channel_chunk]
            bgs = (
                None
                if backgrounds_used is None
                else backgrounds_used[..., lo : lo + channel_chunk]
            )
            img, alphas = _rasterize_backend(
                rasterizer,
                means2d,
                conics,
                cols,
                opacities_cn,
                depths,
                radii_scalar,
                isect,
                tile_offsets,
                width,
                height,
                tile_size,
                bgs,
            )
            chunks.append(img)
        render_colors = (
            chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, -1)
        )
        render_alphas = alphas
        meta_extra = dict(
            tiles_per_gauss=isect.tiles_per_gauss,
            tile_keys=isect.tile_keys,
            flatten_ids=isect.flatten_ids,
            tile_offsets=tile_offsets,
            n_isects=isect.n_isects,
        )

    if render_mode in ("ED", "RGB+ED"):
        # Normalize expected depth by alpha (rendering.py:572-580).
        d = render_colors[..., -1:] / jnp.clip(render_alphas, 1e-10, None)
        render_colors = jnp.concatenate([render_colors[..., :-1], d], axis=-1)

    meta = dict(
        radii=radii_scalar,
        means2d=means2d,
        depths=depths,
        conics=conics,
        opacities=opacities_cn,
        compensations=compensations,
        width=width,
        height=height,
        tile_width=tile_width,
        tile_height=tile_height,
        tile_size=tile_size,
        n_cameras=C,
        **meta_extra,
    )
    return render_colors, render_alphas, meta


def rasterization_2dgs(
    means: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3] (z ignored)
    opacities: jnp.ndarray,  # [N]
    colors: jnp.ndarray,  # [(C,) N, D] or SH [(C,) N, K, 3]
    viewmats: jnp.ndarray,  # [C, 4, 4]
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    sh_degree: Optional[int] = None,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,
    render_mode: str = "RGB",
    distloss: bool = False,
    depth_mode: str = "expected",
    rasterizer: str = "auto",
    isect_capacity: Optional[int] = None,
    log_composite: bool = False,
):
    """2DGS (surfel) rendering — reference ``rasterization_2dgs``
    (rendering.py:1002-1321). Returns (render_colors, render_alphas,
    render_normals, surf_normals, render_distort, render_median, meta).

    Backends: ``"fused"`` = the Pallas 2DGS tile kernel sharing the 3DGS
    binning/reduction pipeline (ops/raster_v2_2dgs.py; production path on
    TPU), ``"reference"`` = the pure-jnp oracle (O(C*N*H*W) memory — test
    oracle / tiny scenes), ``"auto"`` = fused on TPU, reference elsewhere
    (the fused kernel runs interpret-mode on CPU, which is far slower than
    the oracle at test sizes).
    """
    from gscodec_studio_tpu.ops.projection_2dgs import (
        fully_fused_projection_2dgs,
    )
    from gscodec_studio_tpu.ops.raster_v2 import _supports_mosaic
    from gscodec_studio_tpu.ops.rasterize_ref_2dgs import (
        rasterize_to_pixels_2dgs_ref,
    )

    if rasterizer == "auto":
        rasterizer = "fused" if _supports_mosaic() else "reference"
    assert rasterizer in ("fused", "reference"), rasterizer

    C = viewmats.shape[0]
    N = means.shape[0]
    ell2 = rasterizer == "fused"
    radii, means2d, depths, ray_transforms, normals = (
        fully_fused_projection_2dgs(
            means, quats, scales, viewmats, Ks, width, height,
            near_plane, far_plane, radius_clip,
            opacities=opacities, elliptical=ell2,
        )
    )
    opac_ok2 = opacities[None, :] >= 1.0 / 255.0
    radii = jnp.where(opac_ok2[..., None] if ell2 else opac_ok2, radii, 0)
    radii_sc = jnp.max(radii, axis=-1) if ell2 else radii
    opacities_cn = jnp.broadcast_to(opacities[None, :], (C, N))

    if sh_degree is None:
        colors_cn = (
            jnp.broadcast_to(colors[None], (C, N, colors.shape[-1]))
            if colors.ndim == 2
            else colors
        )
    else:
        campos = -jnp.einsum("cij,ci->cj", viewmats[:, :3, :3], viewmats[:, :3, 3])
        dirs = means[None, :, :] - campos[:, None, :]
        shs = colors if colors.ndim == 4 else jnp.broadcast_to(
            colors[None], (C,) + colors.shape
        )
        colors_cn = spherical_harmonics(
            sh_degree, dirs, shs, masks=radii_sc > 0
        )
        colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)

    # Depth channel rides along for distortion/median (2dgs_fwd.cu depth use).
    colors_cn = jnp.concatenate([colors_cn, depths[..., None]], axis=-1)

    if rasterizer == "fused":
        from gscodec_studio_tpu.ops.raster_v2_2dgs import (
            rasterize_to_pixels_2dgs_v2,
        )

        cap = isect_capacity or _default_isect_capacity(C, N)
        render, alphas, render_normals, render_distort, render_median, kmeta = (
            rasterize_to_pixels_2dgs_v2(
                means2d, ray_transforms, colors_cn, opacities_cn, normals,
                depths, radii, width, height, tile_size=tile_size,
                isect_capacity=cap, backgrounds=backgrounds,
                log_composite=log_composite,
            )
        )
        n_isects = kmeta["n_isects"]
    else:
        n_isects = jnp.zeros((), jnp.int32)
        render, alphas, render_normals, render_distort, render_median = (
            rasterize_to_pixels_2dgs_ref(
                means2d, ray_transforms, colors_cn, opacities_cn, normals,
                depths, radii_sc, width, height, tile_size, backgrounds,
            )
        )
    render_colors, accum_depth = render[..., :-1], render[..., -1:]
    if render_mode in ("ED", "RGB+ED"):
        accum_depth = accum_depth / jnp.clip(alphas, 1e-10, None)
    if depth_mode == "median":
        depth_out = render_median
    else:
        depth_out = accum_depth
    surf_normals = depth_to_normal(depth_out, viewmats, Ks)

    meta = dict(
        radii=radii_sc, means2d=means2d, depths=depths,
        ray_transforms=ray_transforms, normals=normals, width=width,
        height=height, n_cameras=C, gradient_2dgs=means2d,
        n_isects=n_isects,
    )
    if render_mode in ("RGB+D", "RGB+ED"):
        render_colors = jnp.concatenate([render_colors, depth_out], axis=-1)
    elif render_mode in ("D", "ED"):
        render_colors = depth_out
    return (render_colors, alphas, render_normals, surf_normals,
            render_distort, render_median, meta)


def depth_to_normal(depths, viewmats, Ks):
    """Per-pixel normals from finite differences of the un-projected depth
    map (reference rendering.py depth_to_normal used for the
    normal-consistency loss)."""
    C, H, W, _ = depths.shape
    fx = Ks[:, 0, 0][:, None, None]
    fy = Ks[:, 1, 1][:, None, None]
    cx = Ks[:, 0, 2][:, None, None]
    cy = Ks[:, 1, 2][:, None, None]
    xs = jnp.arange(W, dtype=depths.dtype)[None, None, :] + 0.5
    ys = jnp.arange(H, dtype=depths.dtype)[None, :, None] + 0.5
    z = depths[..., 0]
    X = (xs - cx) / fx * z
    Y = (ys - cy) / fy * z
    pts = jnp.stack([X, Y, z], axis=-1)  # camera-space [C,H,W,3]
    dx = pts[:, 1:-1, 2:] - pts[:, 1:-1, :-2]
    dy = pts[:, 2:, 1:-1] - pts[:, :-2, 1:-1]
    n = jnp.cross(dx, dy)
    # rsqrt of the clamped squared norm: finite gradients at n == 0 (a bare
    # jnp.linalg.norm has a NaN gradient there, which would poison the whole
    # backward pass through 0*NaN).
    n = n * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-12)
    )
    out = jnp.zeros_like(pts)
    out = out.at[:, 1:-1, 1:-1].set(n)
    # rotate into world frame (normals compared against world-frame splat
    # normals rotated to camera by the caller; keep camera frame here)
    return out


def _rasterize_backend(
    rasterizer,
    means2d,
    conics,
    colors,
    opacities,
    depths,
    radii,
    isect,
    tile_offsets,
    width,
    height,
    tile_size,
    backgrounds,
):
    if rasterizer == "reference":
        return rasterize_to_pixels_ref(
            means2d,
            conics,
            colors,
            opacities,
            depths,
            radii,
            width,
            height,
            tile_size,
            backgrounds,
        )
    elif rasterizer == "pallas":
        from gscodec_studio_tpu.ops.rasterize_pallas import rasterize_to_pixels

        return rasterize_to_pixels(
            means2d,
            conics,
            colors,
            opacities,
            isect,
            tile_offsets,
            width,
            height,
            tile_size,
            backgrounds,
        )
    raise ValueError(f"unknown rasterizer {rasterizer!r}")
