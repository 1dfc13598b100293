"""Pallas TPU tile rasterizer: depth-sorted alpha compositing over 2D Gaussians.

TPU-native re-design of the reference CUDA kernels
(/root/reference/gsplat/cuda/csrc/rasterize_to_pixels_fwd.cu:60-351 and
rasterize_to_pixels_bwd.cu). Not a translation — the design maps the per-tile
sequential loop onto TPU hardware:

  * The sorted intersection list is pre-gathered once (XLA gather) into a
    contiguous ``packed`` [cap2, D] array whose per-tile runs are padded to
    K_CHUNK-entry chunks (isect.align_isects). The kernel grid iterates over
    those chunks; the Pallas pipeline streams the (K, D) blocks through VMEM
    with automatic double buffering — the TPU answer to the CUDA kernel's
    warp-cooperative shared-memory staging (fwd.cu:90-130), with zero
    per-tile DMA latency on the critical path.
  * Each chunk composites K_CHUNK Gaussians against all P=tile_size^2 pixels:
    Gaussians on sublanes, pixels on lanes. Per-pair alphas [K, P] on the
    VPU; the front-to-back prefix transmittance is an exclusive cumulative
    *product* along the Gaussian axis computed with a log2(K)-step
    roll-and-multiply scan (no transcendentals, no MXU); color accumulation
    is a [CH, K] x [K, P] matmul (MXU). A carried per-pixel transmittance
    row in VMEM scratch links chunks of the same tile; outputs are tile
    blocks revisited across a tile's chunks (scalar-prefetched chunk->tile
    map), so partial sums stay in VMEM.
  * Early termination (fwd.cu:99-101): once max(T) <= 1e-4 the remaining
    chunks of the tile skip their compute. The CUDA semantics (a Gaussian
    renders iff the running product *including it* stays > 1e-4) are
    reproduced exactly with an inclusive-product mask.

  Backward (hand-derived, deterministic — replaces bwd.cu's warp-reduced
  atomicAdds, which have no TPU equivalent):
  * pure recompute: replays the forward chunk scan front-to-back carrying
    (T, q) where q = sum_ch (C_total - C_prefix) * v_color; per-chunk suffix
    terms come from an inclusive roll-scan;
  * per-intersection gradients are written to the chunk's own (K, D) output
    block — tile runs are chunk-aligned, so writes never collide;
  * the per-Gaussian reduction is scatter-free: invert the tile sort with
    the precomputed permutation (a gather), then take cumulative-sum
    differences over the contiguous per-Gaussian runs of the expansion
    order (isect.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gscodec_studio_tpu.ops.isect import Intersections, AlignedIsects, align_isects

_HI = jax.lax.Precision.HIGHEST

ALPHA_THRESHOLD = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
MAX_ALPHA = 0.999

K_CHUNK = 128  # gaussians per grid step == the isect alignment unit

# Backward per-Gaussian reduction (all deterministic):
#   "sort"    sort the per-intersection grad rows by Gaussian id and take
#             prefix-sum differences at the id boundaries. XLA sorts are fast
#             on TPU (~3.5 ns/row) while big-table random gathers (~23 ns/row)
#             and duplicate-index scatter-adds (~100 ns/row) are not — this is
#             the cheapest path and needs no inverse-permutation bookkeeping.
#   "cumsum"  invert the tile sort with the precomputed permutation (gather)
#             then prefix-sum differences over expansion runs.
#   "scatter" one scatter-add by slot id (slow on TPU: serializes duplicates).
SEGRED_MODE = "sort"

# Early-termination semantics: "exact" reproduces the CUDA per-Gaussian
# inclusive-product cutoff bit-for-bit (extra mask + reduction per chunk);
# "soft" drops contributions only at chunk granularity — the sub-1e-4
# transmittance tail it admits is visually/gradient-wise negligible and the
# chunk math gets ~25% cheaper. Tests run "exact"; production defaults soft.
CUTOFF_MODE = "soft"



class RasterCfg(NamedTuple):
    C: int
    tile_width: int
    tile_height: int
    tile_size: int
    channels: int
    cap: int  # unaligned isect capacity
    cap2: int  # aligned capacity (multiple of K_CHUNK)
    interpret: bool
    m: int = 0  # rows of flat_attrs (C*N)

    @property
    def n_tiles(self):
        return self.C * self.tile_width * self.tile_height

    @property
    def pixels(self):
        return self.tile_size * self.tile_size

    @property
    def d(self):
        return 6 + self.channels

    @property
    def n_chunks(self):
        return self.cap2 // K_CHUNK


def _supports_mosaic() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _shifted(x, sh, axis, fill):
    """x shifted by +sh along ``axis`` with ``fill`` entering at the start."""
    rolled = pltpu.roll(x, sh, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx < sh, fill, rolled)


def _cumprod_excl(x, axis):
    """Exclusive cumulative product along ``axis`` (length must be a power of
    two) via a log2-step roll-and-multiply scan — VPU-only, exact f32."""
    n = x.shape[axis]
    y = _shifted(x, 1, axis, 1.0)  # shift in the identity
    sh = 1
    while sh < n:
        y = y * _shifted(y, sh, axis, 1.0)
        sh *= 2
    return y


def _cumsum_incl(x, axis):
    """Inclusive cumulative sum along ``axis`` via the same scan."""
    n = x.shape[axis]
    sh = 1
    while sh < n:
        x = x + _shifted(x, sh, axis, 0.0)
        sh *= 2
    return x


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(cfg: RasterCfg, tile_idx):
    """Pixel-center coordinates for one tile, shape (1, P) each."""
    ts = cfg.tile_size
    P = cfg.pixels
    tiles_per_cam = cfg.tile_width * cfg.tile_height
    rem = tile_idx % tiles_per_cam
    ty = rem // cfg.tile_width
    tx = rem % cfg.tile_width
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * ts + p % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + p // ts).astype(jnp.float32) + 0.5
    return px, py


def _chunk_geometry(cfg, buf, px, py, row0, end):
    """Per-chunk pair math. buf (K, D): gaussians on sublanes. Returns [K, P]
    maps plus per-gaussian columns."""
    K = K_CHUNK
    xs, ys = buf[:, 0:1], buf[:, 1:2]
    ca, cb, cc = buf[:, 2:3], buf[:, 3:4], buf[:, 4:5]
    op = buf[:, 5:6]
    dx = xs - px  # (K, P)
    dy = ys - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    idx = row0 + jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    in_range = idx < end
    alpha_raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    valid = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range
    alpha = jnp.where(valid, alpha, 0.0)
    clamped = alpha_raw > MAX_ALPHA
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, sigma=sigma, alpha=alpha,
        valid=valid, clamped=clamped,
    )


def _composite_weights(alpha, t_row):
    """Blockwise front-to-back weights; t_row is the carried (1, P) row.
    All products, no logs: f32 underflow below the 1e-4 cutoff is benign."""
    oma = 1.0 - alpha  # (K, P)
    t_rel_excl = _cumprod_excl(oma, axis=0)
    t_prev = t_rel_excl * t_row
    if CUTOFF_MODE == "exact":
        t_incl = t_prev * oma
        m = t_incl > TRANSMITTANCE_EPS
        w = alpha * t_prev * jnp.where(m, 1.0, 0.0)
        t_new = jnp.min(jnp.where(m, t_incl, t_row), axis=0, keepdims=True)
        t_new = jnp.minimum(t_row, t_new)
        return w, m, t_prev, t_new
    # soft mode: admit the (invisible) sub-eps tail within the chunk; the
    # while-condition still stops at chunk granularity.
    w = alpha * t_prev
    K = alpha.shape[0]
    t_new = t_prev[K - 1 : K] * oma[K - 1 : K]
    return w, None, t_prev, t_new


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(cfg: RasterCfg, tile_ref, starts_ref, ends_ref, packed_ref,
                color_ref, alpha_ref, t_scratch):
    K = K_CHUNK
    CH = cfg.channels
    i = pl.program_id(0)
    t = tile_ref[i]
    row0 = i * K
    first = row0 == starts_ref[t]
    end = ends_ref[t]

    @pl.when(first)
    def _():
        color_ref[0] = jnp.zeros_like(color_ref[0])
        t_scratch[:] = jnp.ones_like(t_scratch)

    t_row = t_scratch[:]  # (1, P)

    @pl.when(jnp.max(t_row) > TRANSMITTANCE_EPS)
    def _():
        px, py = _pixel_coords(cfg, t)
        g = _chunk_geometry(cfg, packed_ref[:], px, py, row0, end)
        w, m, t_prev, t_new = _composite_weights(g["alpha"], t_row)
        # (CH, P) += colors (K, CH)^T x w (K, P)
        color_ref[0] += _dot(packed_ref[:, 6 : 6 + CH], w, ((0,), (0,)))
        t_scratch[:] = t_new
        alpha_ref[0] = 1.0 - t_new

    @pl.when(first & (end <= row0))
    def _():
        # Fully-padded (empty) tile: still define the outputs.
        alpha_ref[0] = jnp.zeros_like(alpha_ref[0])


def _run_fwd(cfg: RasterCfg, packed, chunk_tile, starts, ends):
    P = cfg.pixels
    CH = cfg.channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk_tile, starts, ends
        grid=(cfg.n_chunks,),
        in_specs=[
            pl.BlockSpec((K_CHUNK, cfg.d), lambda i, ct, s, e: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, CH, P), lambda i, ct, s, e: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct, s, e: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cfg.n_tiles + 1, CH, P), jnp.float32),
            jax.ShapeDtypeStruct((cfg.n_tiles + 1, 1, P), jnp.float32),
        ),
        interpret=cfg.interpret,
    )(chunk_tile, starts, ends, packed)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(cfg: RasterCfg, tile_ref, starts_ref, ends_ref, packed_ref,
                vcol_ref, valp_ref, alpha_ref, qinit_ref, vpacked_ref,
                t_scratch, q_scratch):
    K = K_CHUNK
    CH = cfg.channels
    i = pl.program_id(0)
    t = tile_ref[i]
    row0 = i * K
    first = row0 == starts_ref[t]
    end = ends_ref[t]

    @pl.when(first)
    def _():
        t_scratch[:] = jnp.ones_like(t_scratch)
        q_scratch[:] = qinit_ref[0]

    t_row = t_scratch[:]
    alive = jnp.max(t_row) > TRANSMITTANCE_EPS

    @pl.when(alive)
    def _():
        px, py = _pixel_coords(cfg, t)
        buf = packed_ref[:]
        g = _chunk_geometry(cfg, buf, px, py, row0, end)
        alpha = g["alpha"]
        w, m, t_prev, t_new = _composite_weights(alpha, t_row)

        v_c = vcol_ref[0]  # (CH, P)
        v_a = valp_ref[0]  # (1, P)
        t_final = 1.0 - alpha_ref[0]  # (1, P)
        q_row = q_scratch[:]  # (1, P)

        # G[k, p] = sum_ch color_k[ch] * v_c[ch, p]
        G = _dot(buf[:, 6 : 6 + CH], v_c, ((1,), (0,)))  # (K, P)
        u = w * G
        cum_u = _cumsum_incl(u, axis=0)
        s = q_row - cum_u  # suffix color term sum_ch S_k * v_c
        one_m_alpha = 1.0 - alpha
        inv_oma = 1.0 / jnp.where(one_m_alpha > 0, one_m_alpha, 1.0)
        v_alpha = t_prev * G - s * inv_oma + v_a * t_final * inv_oma
        if m is not None:
            v_alpha = v_alpha * jnp.where(m, 1.0, 0.0)

        dvalid = jnp.where(g["valid"] & jnp.logical_not(g["clamped"]), 1.0, 0.0)
        exp_neg_sigma = jnp.exp(-g["sigma"])
        v_sig = -alpha * v_alpha * dvalid  # (K, P)
        dx, dy = g["dx"], g["dy"]

        vpacked_ref[:, 0:1] = jnp.sum(
            v_sig * (g["ca"] * dx + g["cb"] * dy), axis=1, keepdims=True
        )
        vpacked_ref[:, 1:2] = jnp.sum(
            v_sig * (g["cc"] * dy + g["cb"] * dx), axis=1, keepdims=True
        )
        vpacked_ref[:, 2:3] = jnp.sum(v_sig * 0.5 * dx * dx, axis=1, keepdims=True)
        vpacked_ref[:, 3:4] = jnp.sum(v_sig * dx * dy, axis=1, keepdims=True)
        vpacked_ref[:, 4:5] = jnp.sum(v_sig * 0.5 * dy * dy, axis=1, keepdims=True)
        vpacked_ref[:, 5:6] = jnp.sum(
            v_alpha * exp_neg_sigma * dvalid, axis=1, keepdims=True
        )
        # v_color[k, ch] = sum_p w[k, p] * v_c[ch, p]
        vpacked_ref[:, 6 : 6 + CH] = _dot(w, v_c, ((1,), (1,)))

        t_scratch[:] = t_new
        q_scratch[:] = q_row - jnp.sum(u, axis=0, keepdims=True)

    @pl.when(jnp.logical_not(alive))
    def _():
        vpacked_ref[:] = jnp.zeros_like(vpacked_ref)


def _run_bwd(cfg: RasterCfg, packed, chunk_tile, starts, ends, tile_colors,
             tile_alphas, v_tile_colors, v_tile_alphas):
    P = cfg.pixels
    CH = cfg.channels

    # q_init[t] = sum_ch C_total[t] * v_c[t]  (cheap XLA prepass)
    q_init = jnp.sum(tile_colors * v_tile_colors, axis=1, keepdims=True)

    tile_block = lambda ch: pl.BlockSpec(
        (1, ch, P), lambda i, ct, s, e: (ct[i], 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cfg.n_chunks,),
        in_specs=[
            pl.BlockSpec((K_CHUNK, cfg.d), lambda i, ct, s, e: (i, 0),
                         memory_space=pltpu.VMEM),  # packed
            tile_block(CH),  # v_tile_colors
            tile_block(1),  # v_tile_alphas
            tile_block(1),  # tile_alphas (for T_final)
            tile_block(1),  # q_init
        ],
        out_specs=pl.BlockSpec((K_CHUNK, cfg.d), lambda i, ct, s, e: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.cap2, cfg.d), jnp.float32),
        interpret=cfg.interpret,
    )(chunk_tile, starts, ends, packed, v_tile_colors, v_tile_alphas,
      tile_alphas, q_init)


def _chunk_tile_map(cfg: RasterCfg, starts, ends):
    """chunk index -> owning tile (sentinel = n_tiles for padding chunks).
    starts come from align_isects so runs are K-aligned and consecutive."""
    total = jnp.concatenate(
        [starts, jnp.full((1,), cfg.cap2 + 1, starts.dtype)]
    )
    chunk_row = jnp.arange(cfg.n_chunks, dtype=jnp.int32) * K_CHUNK
    # run of tile t covers [starts[t], starts[t+1]) in aligned space; the
    # aligned end of tile t equals starts[t+1] (runs are packed). A chunk
    # belongs to the last tile whose start is <= its first row.
    aligned_ends = jnp.concatenate(
        [starts[1:], ((ends[-1:] + K_CHUNK - 1) // K_CHUNK) * K_CHUNK]
    )
    tile = jnp.searchsorted(starts, chunk_row, side="right").astype(jnp.int32) - 1
    in_run = chunk_row < aligned_ends[tile]
    return jnp.where(in_run, tile, cfg.n_tiles).astype(jnp.int32)


# ---------------------------------------------------------------------------
# custom-vjp wrapper: gather -> kernel -> scatter-free segment reduce
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize_packed(cfg, flat_attrs, aligned_ids, chunk_tile, starts, ends,
                      exp_offsets, inv_perm, n_isects):
    out, _ = _rasterize_packed_fwd(
        cfg, flat_attrs, aligned_ids, chunk_tile, starts, ends, exp_offsets,
        inv_perm, n_isects
    )
    return out


def _pack(cfg, flat_attrs, aligned_ids):
    """[M, D] attrs + one zero pad row, gathered to aligned order [cap2, D]."""
    pad = jnp.zeros((1, flat_attrs.shape[1]), flat_attrs.dtype)
    flat = jnp.concatenate([flat_attrs, pad], axis=0)
    return jnp.take(flat, aligned_ids, axis=0)


def _pad_scalar(x):
    """Append a sentinel entry (0) so the padding-chunk tile index n_tiles is
    a valid read."""
    return jnp.concatenate([x, jnp.zeros((1,), x.dtype)])


def _rasterize_packed_fwd(cfg, flat_attrs, aligned_ids, chunk_tile, starts,
                          ends, exp_offsets, inv_perm, n_isects):
    packed = _pack(cfg, flat_attrs, aligned_ids)
    tile_colors, tile_alphas = _run_fwd(
        cfg, packed, chunk_tile, _pad_scalar(starts), _pad_scalar(ends)
    )
    # Tiles with no chunks never get written — zero them.
    visited = (ends > starts)[:, None, None]
    tile_colors = jnp.where(visited, tile_colors[: cfg.n_tiles], 0.0)
    tile_alphas = jnp.where(visited, tile_alphas[: cfg.n_tiles], 0.0)
    res = (packed, aligned_ids, chunk_tile, starts, ends, tile_colors,
           tile_alphas, exp_offsets, inv_perm, n_isects)
    return (tile_colors, tile_alphas), res


def _rasterize_packed_bwd(cfg, res, cot):
    (packed, aligned_ids_res, chunk_tile, starts, ends, tile_colors,
     tile_alphas, exp_offsets, inv_perm, n_isects) = res
    v_tile_colors, v_tile_alphas = cot
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0
    )
    v_packed = _run_bwd(
        cfg, packed, chunk_tile, _pad_scalar(starts), _pad_scalar(ends),
        pad(tile_colors), pad(tile_alphas), pad(v_tile_colors),
        pad(v_tile_alphas)
    )  # [cap2, D]

    M = cfg.m if cfg.m else exp_offsets.shape[0] - 1
    if SEGRED_MODE == "sort":
        # Sort grad rows by Gaussian id; padding (-1) maps to the dump id M
        # and sorts last. Runs become contiguous -> prefix-sum differences.
        ids = jnp.where(aligned_ids_res >= 0, aligned_ids_res, M)
        cols = tuple(v_packed[:, i] for i in range(v_packed.shape[1]))
        sorted_all = jax.lax.sort((ids,) + cols, num_keys=1)
        sorted_ids = sorted_all[0]
        v_sorted = jnp.stack(sorted_all[1:], axis=-1)  # [cap2, D]
        del sorted_ids
        csum = jnp.concatenate(
            [jnp.zeros((1, v_sorted.shape[1]), v_sorted.dtype),
             jnp.cumsum(v_sorted, axis=0)],
            axis=0,
        )
        # Id-sorted run boundaries == the expansion offsets (the expansion
        # enumerates Gaussians id-major with the same per-id counts), so no
        # searchsorted is needed.
        v_flat = jnp.take(csum, exp_offsets[1:], axis=0) - jnp.take(
            csum, exp_offsets[:-1], axis=0
        )
    elif SEGRED_MODE == "scatter":
        # One deterministic scatter-add by aligned slot ids (padding -1 and
        # any dropped slots land on the dump row M).
        ids = jnp.where(aligned_ids_res >= 0, aligned_ids_res, M)
        v_flat = (
            jnp.zeros((M + 1, v_packed.shape[1]), v_packed.dtype)
            .at[ids]
            .add(v_packed)[:M]
        )
    else:
        # Segment reduction without scatters: aligned -> expansion order via
        # the precomputed inverse permutation (a gather), then prefix-sum
        # differences over the contiguous per-Gaussian expansion runs.
        v_exp = jnp.take(v_packed, inv_perm, axis=0)  # [cap, D]
        pos = jnp.arange(cfg.cap, dtype=jnp.int32)
        v_exp = jnp.where((pos < n_isects)[:, None], v_exp, 0.0)
        csum = jnp.concatenate(
            [jnp.zeros((1, v_exp.shape[1]), v_exp.dtype),
             jnp.cumsum(v_exp, axis=0)],
            axis=0,
        )
        v_flat = jnp.take(csum, exp_offsets[1:], axis=0) - jnp.take(
            csum, exp_offsets[:-1], axis=0
        )  # [M, D]

    f0 = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (
        v_flat,
        f0((cfg.cap2,)),  # aligned_ids
        f0(chunk_tile.shape),
        f0(starts.shape),
        f0(ends.shape),
        f0(exp_offsets.shape),
        f0(inv_perm.shape),
        f0(n_isects.shape),
    )


_rasterize_packed.defvjp(_rasterize_packed_fwd, _rasterize_packed_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels(
    means2d: jnp.ndarray,  # [C, N, 2]
    conics: jnp.ndarray,  # [C, N, 3]
    colors: jnp.ndarray,  # [C, N, CH]
    opacities: jnp.ndarray,  # [C, N]
    isect: Intersections,
    tile_offsets: jnp.ndarray,  # unused (kept for API parity)
    width: int,
    height: int,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, CH]
    interpret: Optional[bool] = None,
    aligned: Optional[AlignedIsects] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable tile rasterization -> ([C,H,W,CH] colors, [C,H,W,1] alpha).

    Equivalent of the reference ``rasterize_to_pixels`` op
    (gsplat/cuda/_wrapper.py:436). Gradients flow to means2d, conics, colors,
    opacities (and backgrounds) — deterministic by construction.
    """
    del tile_offsets
    C, N, _ = means2d.shape
    CH = colors.shape[-1]
    tile_width = -(-width // tile_size)
    tile_height = -(-height // tile_size)
    if aligned is None:
        aligned = align_isects(
            isect, C, tile_width, tile_height, K_CHUNK,
            need_inv_perm=(SEGRED_MODE == "cumsum"),
        )
    if interpret is None:
        interpret = not _supports_mosaic()
    cfg = RasterCfg(
        C=C,
        tile_width=tile_width,
        tile_height=tile_height,
        tile_size=tile_size,
        channels=CH,
        cap=isect.flatten_ids.shape[0],
        cap2=aligned.ids.shape[0],
        interpret=interpret,
        m=C * N,
    )
    flat_attrs = jnp.concatenate(
        [
            means2d.reshape(C * N, 2),
            conics.reshape(C * N, 3),
            opacities.reshape(C * N, 1),
            colors.reshape(C * N, CH),
        ],
        axis=-1,
    ).astype(jnp.float32)

    chunk_tile = _chunk_tile_map(cfg, aligned.starts, aligned.ends)
    tile_colors, tile_alphas = _rasterize_packed(
        cfg,
        flat_attrs,
        aligned.ids,
        chunk_tile,
        aligned.starts,
        aligned.ends,
        isect.exp_offsets,
        aligned.inv_perm,
        aligned.n_isects,
    )

    ts = tile_size
    TH, TW = tile_height, tile_width

    def assemble(buf, ch):
        img = buf.reshape(C, TH, TW, ch, ts, ts)
        img = img.transpose(0, 1, 4, 2, 5, 3).reshape(C, TH * ts, TW * ts, ch)
        return img[:, :height, :width, :]

    img = assemble(tile_colors, CH)
    alp = assemble(tile_alphas, 1)

    if backgrounds is not None:
        img = img + (1.0 - alp) * backgrounds[:, None, None, :]
    return img, alp
