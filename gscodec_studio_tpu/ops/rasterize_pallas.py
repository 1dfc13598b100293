"""Pallas TPU tile rasterizer: depth-sorted alpha compositing over 2D Gaussians.

TPU-native re-design of the reference CUDA kernels
(/root/reference/gsplat/cuda/csrc/rasterize_to_pixels_fwd.cu:60-351 and
rasterize_to_pixels_bwd.cu). Not a translation — the design maps the per-tile
sequential loop onto TPU hardware:

  Forward (one grid step per screen tile; the TPU grid runs sequentially):
    * the sorted intersection list is pre-gathered once (XLA gather) into a
      transposed ``packed`` [D_pad, cap2] array whose per-tile runs are padded
      to K=128-entry chunks (isect.align_isects), so every inner-loop read is
      one aligned (D_pad, 128) async DMA, double-buffered — the TPU answer to
      the CUDA kernel's warp-cooperative shared-memory staging (fwd.cu:90-130);
    * a chunk of 128 Gaussians is composited against all P=tile_size^2 pixels
      at once — pixels on sublanes, Gaussians on lanes: per-pair alphas [P, K]
      on the VPU, the exclusive cumulative transmittance via an upper-
      triangular [K, K] matmul in log space (MXU), and color accumulation as a
      [P, K] x [K, CH] matmul (MXU) — the flash-attention formulation of
      front-to-back compositing with a carried per-pixel transmittance column;
    * early termination (fwd.cu:99-101) happens at chunk granularity via the
      ``lax.while_loop`` condition max(T) > 1e-4, which also skips the
      remaining DMAs; the CUDA semantics (a Gaussian renders iff the running
      product *including it* stays > 1e-4) are reproduced exactly with an
      inclusive-product mask.

  Backward (hand-derived, deterministic — replaces bwd.cu's warp-reduced
  atomicAdds, which have no TPU equivalent):
    * pure recompute: replays the forward chunk loop front-to-back carrying
      (T, q) where q = sum_ch (C_total - C_prefix) * v_color; per-chunk
      suffix terms come from an inclusive-triangular matmul;
    * per-intersection gradients are DMA'd to the chunk's own aligned column
      range of a [D_pad, cap2] buffer — tile runs are chunk-aligned, so
      writes never collide;
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

K_CHUNK = 128  # gaussians per inner step == the isect alignment unit


class RasterCfg(NamedTuple):
    C: int
    tile_width: int
    tile_height: int
    tile_size: int
    channels: int
    cap: int  # unaligned isect capacity
    cap2: int  # aligned capacity (multiple of K_CHUNK)
    interpret: bool

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
    def d_pad(self):
        return ((self.d + 7) // 8) * 8


def _supports_mosaic() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _ut(k: int, strict: bool) -> jnp.ndarray:
    """Upper-triangular ones [K, K]: x @ UT = (exclusive|inclusive) row-wise
    prefix sums along lanes. Built from iota (Pallas forbids captured consts)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i < j if strict else i <= j).astype(jnp.float32)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(cfg: RasterCfg, tile_idx):
    """Pixel-center coordinates for one tile, shape (P, 1) each."""
    ts = cfg.tile_size
    P = cfg.pixels
    tiles_per_cam = cfg.tile_width * cfg.tile_height
    rem = tile_idx % tiles_per_cam
    ty = rem // cfg.tile_width
    tx = rem % cfg.tile_width
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + p % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + p // ts).astype(jnp.float32) + 0.5
    return px, py


def _chunk_geometry(cfg, buf, px, py, start, end, c):
    """Shared fwd/bwd per-chunk math. buf is (D_pad, K); returns [P, K] maps."""
    K = K_CHUNK
    xs, ys = buf[0:1, :], buf[1:2, :]
    ca, cb, cc = buf[2:3, :], buf[3:4, :], buf[4:5, :]
    op = buf[5:6, :]
    dx = xs - px  # (P, K)
    dy = ys - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    idx = start + c * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
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


def _composite_weights(alpha, t_col, ut_strict):
    """Blockwise front-to-back weights; t_col is the carried (P, 1) column."""
    logom = jnp.log1p(-alpha)  # (P, K)
    cum_excl = _dot(logom, ut_strict, ((1,), (0,)))
    cum_incl = cum_excl + logom
    t_prev = jnp.exp(cum_excl) * t_col
    t_incl = jnp.exp(cum_incl) * t_col
    m = t_incl > TRANSMITTANCE_EPS
    w = alpha * t_prev * jnp.where(m, 1.0, 0.0)
    t_new = jnp.minimum(
        t_col, jnp.min(jnp.where(m, t_incl, jnp.inf), axis=1, keepdims=True)
    )
    return w, m, t_prev, t_new


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(cfg: RasterCfg, starts_ref, ends_ref, packed_ref, color_ref,
                alpha_ref, chunk_buf, sems):
    K = K_CHUNK
    CH = cfg.channels
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    nchunks = pl.cdiv(end - start, K)
    px, py = _pixel_coords(cfg, t)
    ut_strict = _ut(K, strict=True)

    color_ref[0] = jnp.zeros_like(color_ref[0])

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * K, K)  # tile runs are K-aligned
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, K)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        c, t_col = state
        return (c < nchunks) & (jnp.max(t_col) > TRANSMITTANCE_EPS)

    def body(state):
        c, t_col = state
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        buf = chunk_buf[slot]
        g = _chunk_geometry(cfg, buf, px, py, start, end, c)
        w, m, t_prev, t_new = _composite_weights(g["alpha"], t_col, ut_strict)
        # (P, CH) += w (P, K) x colors (CH, K)^T
        color_ref[0] += _dot(w, buf[6 : 6 + CH, :], ((1,), (1,)))
        return c + 1, t_new

    t_init = jnp.ones((cfg.pixels, 1), jnp.float32)
    _, t_final = jax.lax.while_loop(cond, body, (jnp.int32(0), t_init))
    alpha_ref[0] = 1.0 - t_final


def _run_fwd(cfg: RasterCfg, packed_t, starts, ends):
    T = cfg.n_tiles
    P = cfg.pixels
    CH = cfg.channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, P, CH), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cfg.d_pad, K_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, P, CH), jnp.float32),
            jax.ShapeDtypeStruct((T, P, 1), jnp.float32),
        ),
        interpret=cfg.interpret,
    )(starts, ends, packed_t)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(cfg: RasterCfg, starts_ref, ends_ref, packed_ref, vcol_ref,
                valp_ref, alpha_ref, qinit_ref, zeros_ref, vpacked_ref,
                chunk_buf, vbuf, sems, out_sems):
    del zeros_ref  # aliased to vpacked_ref (pre-zeroed output)
    K = K_CHUNK
    CH = cfg.channels
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    nchunks = pl.cdiv(end - start, K)
    px, py = _pixel_coords(cfg, t)
    ut_strict = _ut(K, strict=True)
    ut_incl = _ut(K, strict=False)

    v_c = vcol_ref[0]  # (P, CH) cotangent of this tile's gaussian color part
    v_a = valp_ref[0]  # (P, 1) cotangent of this tile's alpha output
    t_final = 1.0 - alpha_ref[0]  # (P, 1)
    q_init = qinit_ref[0]  # (P, 1) = sum_ch C_total * v_c

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * K, K)  # tile runs are K-aligned
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, K)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    def out_dma(slot, c):
        off = pl.multiple_of(start + c * K, K)
        return pltpu.make_async_copy(
            vbuf.at[slot],
            vpacked_ref.at[:, pl.ds(off, K)],
            out_sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        c, t_col, q_col = state
        return (c < nchunks) & (jnp.max(t_col) > TRANSMITTANCE_EPS)

    def body(state):
        c, t_col, q_col = state
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()

        # The out-DMA two chunks ago used this vbuf slot; wait before reuse.
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        buf = chunk_buf[slot]
        g = _chunk_geometry(cfg, buf, px, py, start, end, c)
        alpha = g["alpha"]
        w, m, t_prev, t_new = _composite_weights(alpha, t_col, ut_strict)

        # G[p, k] = sum_ch v_c[p, ch] * color_k[ch]
        G = _dot(v_c, buf[6 : 6 + CH, :], ((1,), (0,)))  # (P, K)
        u = w * G
        cum_u = _dot(u, ut_incl, ((1,), (0,)))  # inclusive prefix along K
        s = q_col - cum_u  # suffix color term sum_ch S_k * v_c
        one_m_alpha = 1.0 - alpha
        inv_oma = 1.0 / jnp.where(one_m_alpha > 0, one_m_alpha, 1.0)
        v_alpha = (
            t_prev * G - s * inv_oma + v_a * t_final * inv_oma
        ) * jnp.where(m, 1.0, 0.0)

        dvalid = jnp.where(g["valid"] & jnp.logical_not(g["clamped"]), 1.0, 0.0)
        exp_neg_sigma = jnp.exp(-g["sigma"])
        v_op = jnp.sum(v_alpha * exp_neg_sigma * dvalid, axis=0, keepdims=True)
        v_sig = -alpha * v_alpha * dvalid  # (P, K)
        dx, dy = g["dx"], g["dy"]
        vbuf[slot, 0:1, :] = jnp.sum(
            v_sig * (g["ca"] * dx + g["cb"] * dy), axis=0, keepdims=True
        )
        vbuf[slot, 1:2, :] = jnp.sum(
            v_sig * (g["cc"] * dy + g["cb"] * dx), axis=0, keepdims=True
        )
        vbuf[slot, 2:3, :] = jnp.sum(v_sig * 0.5 * dx * dx, axis=0, keepdims=True)
        vbuf[slot, 3:4, :] = jnp.sum(v_sig * dx * dy, axis=0, keepdims=True)
        vbuf[slot, 4:5, :] = jnp.sum(v_sig * 0.5 * dy * dy, axis=0, keepdims=True)
        vbuf[slot, 5:6, :] = v_op
        # v_color[ch, k] = sum_p v_c[p, ch] * w[p, k]
        vbuf[slot, 6 : 6 + CH, :] = _dot(v_c, w, ((0,), (0,)))
        out_dma(slot, c).start()

        q_new = q_col - jnp.sum(u, axis=1, keepdims=True)
        return c + 1, t_new, q_new

    t_init = jnp.ones((cfg.pixels, 1), jnp.float32)
    c_end, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), t_init, q_init))

    @pl.when(c_end >= 1)
    def _():
        out_dma((c_end - 1) % 2, c_end - 1).wait()

    @pl.when(c_end >= 2)
    def _():
        out_dma((c_end - 2) % 2, c_end - 2).wait()


def _run_bwd(cfg: RasterCfg, packed_t, starts, ends, tile_colors, tile_alphas,
             v_tile_colors, v_tile_alphas):
    T = cfg.n_tiles
    P = cfg.pixels
    CH = cfg.channels

    # q_init[t] = sum_ch tile_colors[t] * v_tile_colors[t]  (cheap XLA prepass)
    q_init = jnp.sum(tile_colors * v_tile_colors, axis=-1, keepdims=True)

    zeros = jnp.zeros((cfg.d_pad, cfg.cap2), jnp.float32)
    tile_block = lambda ch: pl.BlockSpec(
        (1, P, ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed_t
            tile_block(CH),  # v_tile_colors
            tile_block(1),  # v_tile_alphas
            tile_block(1),  # tile_alphas (for T_final)
            tile_block(1),  # q_init
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, cfg.d_pad, K_CHUNK), jnp.float32),
            pltpu.VMEM((2, cfg.d_pad, K_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.d_pad, cfg.cap2), jnp.float32),
        input_output_aliases={7: 0},  # zeros input (incl. 2 scalar args)
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, ends, packed_t, v_tile_colors, v_tile_alphas, tile_alphas,
      q_init, zeros)


# ---------------------------------------------------------------------------
# custom-vjp wrapper: gather -> kernel -> scatter-free segment reduce
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize_packed(cfg, flat_attrs, aligned_ids, starts, ends, exp_offsets,
                      inv_perm, n_isects):
    out, _ = _rasterize_packed_fwd(
        cfg, flat_attrs, aligned_ids, starts, ends, exp_offsets, inv_perm,
        n_isects
    )
    return out


def _pack(cfg, flat_attrs, aligned_ids):
    """[M, D] attrs + one zero pad row, gathered to aligned order and
    transposed to the kernel's [D_pad, cap2] layout."""
    pad = jnp.zeros((1, flat_attrs.shape[1]), flat_attrs.dtype)
    flat = jnp.concatenate([flat_attrs, pad], axis=0)
    packed = jnp.take(flat, aligned_ids, axis=0)  # [cap2, D]
    packed_t = packed.T  # [D, cap2]
    return jnp.pad(packed_t, ((0, cfg.d_pad - cfg.d), (0, 0)))


def _rasterize_packed_fwd(cfg, flat_attrs, aligned_ids, starts, ends,
                          exp_offsets, inv_perm, n_isects):
    packed_t = _pack(cfg, flat_attrs, aligned_ids)
    tile_colors, tile_alphas = _run_fwd(cfg, packed_t, starts, ends)
    res = (packed_t, starts, ends, tile_colors, tile_alphas, exp_offsets,
           inv_perm, n_isects)
    return (tile_colors, tile_alphas), res


def _rasterize_packed_bwd(cfg, res, cot):
    (packed_t, starts, ends, tile_colors, tile_alphas, exp_offsets, inv_perm,
     n_isects) = res
    v_tile_colors, v_tile_alphas = cot
    v_packed_t = _run_bwd(
        cfg, packed_t, starts, ends, tile_colors, tile_alphas,
        v_tile_colors, v_tile_alphas
    )
    v_packed = v_packed_t[: cfg.d].T  # [cap2, D]

    # Segment reduction without scatters: aligned -> expansion order via the
    # precomputed inverse permutation (a gather), then prefix-sum differences
    # over the contiguous per-Gaussian runs.
    v_exp = jnp.take(v_packed, inv_perm, axis=0)  # [cap, D]
    pos = jnp.arange(cfg.cap, dtype=jnp.int32)
    v_exp = jnp.where((pos < n_isects)[:, None], v_exp, 0.0)
    csum = jnp.concatenate(
        [jnp.zeros((1, v_exp.shape[1]), v_exp.dtype), jnp.cumsum(v_exp, axis=0)],
        axis=0,
    )
    v_flat = jnp.take(csum, exp_offsets[1:], axis=0) - jnp.take(
        csum, exp_offsets[:-1], axis=0
    )  # [M, D]

    f0 = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (
        v_flat,
        f0((cfg.cap2,)),  # aligned_ids
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
        aligned = align_isects(isect, C, tile_width, tile_height, K_CHUNK)
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

    tile_colors, tile_alphas = _rasterize_packed(
        cfg,
        flat_attrs,
        aligned.ids,
        aligned.starts,
        aligned.ends,
        isect.exp_offsets,
        aligned.inv_perm,
        aligned.n_isects,
    )

    ts = tile_size
    TH, TW = tile_height, tile_width

    def assemble(buf, ch):
        img = buf.reshape(C, TH, TW, ts, ts, ch)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(C, TH * ts, TW * ts, ch)
        return img[:, :height, :width, :]

    img = assemble(tile_colors, CH)
    alp = assemble(tile_alphas, 1)

    if backgrounds is not None:
        img = img + (1.0 - alp) * backgrounds[:, None, None, :]
    return img, alp
