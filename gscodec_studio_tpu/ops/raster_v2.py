"""Fused tile-rasterization pipeline v2/v3 (binning + Pallas tile kernels).

TPU-native re-design of the reference CUDA rasterization stack
(/root/reference/gsplat/cuda/csrc/isect_tiles.cu,
rasterize_to_pixels_fwd.cu, rasterize_to_pixels_bwd.cu). The XLA plumbing
around the Pallas kernels was the round-1 bottleneck; this pipeline is
built from primitives measured fast on this TPU (profiling/sort_bench.py,
build_bisect.py, take_bisect.py): variadic ``lax.sort`` is ~2-4 ns/row
regardless of payload count, while XLA gathers/scatters of isect-scale
tables cost ~35 ns/row and relayouts (jnp.stack of sorted operands) tens of
ms — so every permutation runs through a sort and every layout change
through a trivial Pallas pack kernel.

Pipeline:
  1. per-Gaussian tile rectangles + counts (elementwise);
  2. compaction-and-depth sort: ONE variadic sort of the per-Gaussian
     attribute table keyed by (visible ? depth : +inf) — this both drops
     culled Gaussians from the working prefix and establishes global depth
     order, so the later per-tile order needs no depth key at all;
  3. expansion: a Pallas kernel enumerates the fixed-capacity intersection
     list. Each 512-row output block covers a contiguous window of the
     compacted table (every compacted Gaussian has >= 1 intersection, so
     512 outputs span <= 512 table rows); the row->Gaussian assignment is an
     on-chip one-hot matrix and the attribute broadcast is an MXU matmul,
     made bit-exact by a 3-way bf16 split of the f32 table (8+8+8 mantissa
     bits; one-hot entries are exact in bf16);
  4. ONE stable single-key sort by tile id carrying all per-isect
     attributes (depth order within a tile is inherited from step 2);
  5. a pack kernel lays the sorted operands out attr-major [d_s, cap] so
     kernel chunk DMAs are lane-aligned 128-wide windows; a tile's run is
     masked by its [start, end) range — no alignment/padding pass exists;
  6. forward/backward Pallas kernels iterate a grid over TILES with an
     inner double-buffered manual-DMA loop over the tile's chunks and
     chunk-level early termination. Pair math runs in (P, K) layout:
     pixels on sublanes, gaussians on lanes, the front-to-back
     transmittance scan is a log2(K)-step roll-multiply along lanes, color
     accumulation is an MXU contraction;
  7. the backward writes per-(tile, chunk) gradient blocks (collision-free
     by construction) plus the Gaussian id; early-terminated and masked
     chunks still get their id row written (a light 2-DMA loop) so that the
     id-sorted gradient rows contain EVERY visible Gaussian — which makes
     the per-Gaussian reduction a deterministic sort + prefix-sum +
     end-compaction-sort chain with no gather or atomics (replaces
     bwd.cu's warp-reduced atomicAdds).

Early-termination semantics reproduce the CUDA rule exactly (a Gaussian
renders iff the inclusive transmittance product stays > 1e-4,
fwd.cu:137-166); there is no approximate mode. absgrad (|dL/d means2d|
accumulation, bwd.cu:232-234) is produced by the same reduction when
requested.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_THRESHOLD = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
MAX_ALPHA = 0.999

K = 128  # gaussians per chunk == lane width (pair-math granularity)
NBUF = 4  # chunk-DMA ring depth per tile. Round-3 note: a 512-lane
# superchunk-DMA variant (4 chunks/fetch) was built and measured SLOWER
# (fwd 44->56ms, bwd 64->82ms at bench scale): the kernels are
# compute-bound with this ring depth, and superchunk-granular processing
# added ~30% masked pair math at run boundaries. Per-chunk fetches stay.
EXPAND_B = 512  # expansion sub-block (outputs per one-hot matmul)
EXPAND_BW = EXPAND_B + 128  # candidate window (128-aligned DMA start slack)
EXPAND_SB = 8  # sub-blocks per expansion grid step
INT32_MAX = np.iinfo(np.int32).max
PAD_ID = 3.0e7  # f32 id sentinel for padding grad rows (> any real id)


class V2Cfg(NamedTuple):
    C: int
    tile_width: int
    tile_height: int
    tile_size: int
    channels: int
    cap: int  # isect capacity (multiple of EXPAND_B*EXPAND_SB)
    n: int  # gaussians per camera
    tiles_per_step: int
    interpret: bool
    absgrad: bool
    # generic-geometry hooks (the 2DGS kernel shares the binning/build/
    # reduction skeleton): number of per-gaussian attribute rows before the
    # id row, whether the expansion may ellipse-cull (needs the 3DGS conic
    # layout x,y,ca,cb,cc,op at rows 0-5), extra grad rows beyond n_attr+id
    n_attr: int = 0  # 0 -> 3DGS layout (6 + channels)
    cull: bool = True
    extra_out: int = 0  # fwd per-pixel outputs beyond channels+alpha
    # "exact" reproduces the CUDA per-pair inclusive-product cutoff
    # (fwd.cu:137-166); "soft" admits the invisible sub-1e-4 tail within a
    # chunk (early termination stays chunk-granular) for ~20% cheaper pair
    # math — the same production knob the v1 kernel shipped with
    cutoff: str = "exact"
    # backward micro-architecture knobs (A/B-able on hardware):
    # bwd_moments: the six per-pair gradient products + sublane reductions
    # (v_means2d/v_conic/v_opacity rows) are algebraically separable in
    # pixel coordinates, so ONE MXU contraction of v_sig against a fixed
    # (8, P) pixel-moment matrix [1, px, py, px^2, px*py, py^2] (tile-LOCAL
    # coords for f32 safety) replaces ~30 VPU ops/pair with per-GAUSSIAN
    # (1, K) algebra. Falls back to the per-pair path when absgrad is
    # requested (|dL/dxy| needs the per-pixel terms) or for non-3DGS
    # layouts.
    bwd_moments: bool = True
    # tri_cumsum: the backward's inclusive lane cumsum (suffix color term)
    # as a (P, K) x (K, K) upper-triangular MXU matmul instead of the
    # 7-step roll-add scan (~20 VPU ops/pair -> MXU).
    tri_cumsum: bool = True
    # grad_dtype: precision of the PER-INTERSECTION gradient rows between
    # the backward kernel and the per-gaussian reduction. "bf16" packs two
    # truncated-bf16 values per f32 row (sort payload count nearly halves:
    # the grad-id sort is ~0.73 ns/row/payload, the single largest step
    # cost), at ~4e-3 relative noise on per-isect contributions — harmless
    # for SGD, and the per-gaussian SUMS stay f32. "f32" keeps bit-accurate
    # rows for tight oracle parity.
    grad_dtype: str = "f32"
    # attr_dtype: precision of the NON-GEOMETRY per-intersection attributes
    # (opacity + colors) in the sorted table. "bf16" packs them as
    # trunc-bf16 pairs at the expansion output: the tile sort carries 2
    # fewer payload operands (CH=3) and d_s halves 16 -> 8, halving the
    # fwd/bwd kernels' chunk-DMA bytes. Geometry rows (x, y, conic) stay
    # f32 — position error at bf16 would be ~2.5 px at 1297-px widths.
    # Opacity/color at bf16 is ~2e-3 relative (half an 8-bit color step).
    # 3DGS layout only (n_attr == 0).
    attr_dtype: str = "f32"
    # log_composite: evaluate the front-to-back transmittance scan in log
    # space as ONE triangular MXU matmul (2-way bf16 split of log1p(-a),
    # exact to ~16 mantissa bits) instead of the log2(K)-step
    # roll-multiply VPU scan — the scan is the largest VPU block in both
    # kernels. A/B-able; bit-identical early-termination semantics.
    log_composite: bool = False
    # geom_dtype: precision of the (x, y) position rows in the sorted
    # table. "u16" packs both into ONE row as 16-bit fixed point
    # (1/8 px over [-4096, 4096) px): the tile sort carries one fewer
    # payload operand and the kernel chunk DMA drops a row. Position
    # quantization is +-1/16 px — ~40x tighter than bf16 would be — i.e.
    # ~1e-2 relative alpha noise at one sigma for px-scale splats.
    # 3DGS layout only (n_attr == 0). The last unpacked residual named in
    # BASELINE.md's floor analysis.
    geom_dtype: str = "f32"

    @property
    def n_tiles(self):
        return self.C * self.tile_width * self.tile_height

    @property
    def pixels(self):
        return self.tile_size * self.tile_size

    @property
    def n_tiles_v(self):
        # +1 virtual overflow tile: ellipse-culled intersections are routed
        # there and processed by the masked-tile light path, so the
        # reduction's rank==id invariant (every counted intersection gets a
        # grad row) holds without per-gaussian recounting
        return self.n_tiles + 1

    @property
    def n_attr_eff(self):
        # 3DGS: x, y, ca, cb, cc, op, colors[CH]
        return self.n_attr or (6 + self.channels)

    @property
    def attr_packed(self):
        return self.attr_dtype == "bf16" and self.n_attr == 0

    @property
    def geom_packed(self):
        return self.geom_dtype == "u16" and self.n_attr == 0

    @property
    def n_geom_rows(self):
        # (x, y) as two f32 rows, or one u16-pair row
        return 1 if self.geom_packed else 2

    @property
    def n_srows(self):
        # sorted attr rows before the id row: attr_packed pairs up
        # (ca, cb), (cc, op), (colors...) — conic/opacity/color at bf16 is
        # ~2^-9 relative; geom_packed folds (x, y) into one u16 row
        if self.attr_packed:
            return self.n_geom_rows + (4 + self.channels + 1) // 2
        if self.geom_packed:
            return self.n_geom_rows + 4 + self.channels
        return self.n_attr_eff

    @property
    def d_s(self):
        # sorted attr rows: attrs..., id
        return _round8(self.n_srows + 1)

    @property
    def idrow(self):
        # id row position within the sorted S table
        return self.n_srows

    @property
    def grad_packed(self):
        return self.grad_dtype == "bf16"

    @property
    def n_vpairs(self):
        # packed value rows: two bf16-truncated grads per f32 row
        return (self.n_attr_eff + 1) // 2

    @property
    def gidrow(self):
        # id row position within the gbuf layout
        return self.n_vpairs if self.grad_packed else self.n_attr_eff

    @property
    def d_g(self):
        # grad rows: v_attrs..., id [, abs rows]
        if self.grad_packed:
            return _round8(self.n_vpairs + 1 + (1 if self.absgrad else 0))
        return _round8(self.n_attr_eff + 1 + (2 if self.absgrad else 0))

    @property
    def chp(self):
        return self.channels + 1 + self.extra_out

    @property
    def n_steps(self):
        return -(-self.n_tiles_v // self.tiles_per_step)

    @property
    def d_t(self):
        # expansion table rows: cum, cnt, base, nx, cidx, attrs...
        return _round8(5 + self.n_attr_eff)

    @property
    def slot_cap(self):
        # sum over tiles of chunks-spanned <= cap/K + n_tiles, rounded so
        # slot_cap*K is a multiple of the pack-kernel block
        raw = self.cap // K + self.n_tiles_v + 1
        return ((raw + 31) // 32) * 32


def _round8(x):
    return ((x + 7) // 8) * 8


def _pack_pair(a, b):
    """Two f32 maps -> one f32 map holding (trunc-bf16(a) | trunc-bf16(b)).

    Pure u32 bit surgery (no 16-bit dtypes): keeps sign/exponent/7 mantissa
    bits of each half. Exact under a later bf16 cast, which makes the
    packed segment-sum a plain bf16 MXU matmul with NO 3-way split."""
    ua = jax.lax.bitcast_convert_type(a, jnp.uint32)
    ub = jax.lax.bitcast_convert_type(b, jnp.uint32)
    p = (ua & jnp.uint32(0xFFFF0000)) | (ub >> 16)
    return jax.lax.bitcast_convert_type(p, jnp.float32)


def _unpack_pair(p):
    up = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type(up & jnp.uint32(0xFFFF0000), jnp.float32)
    b = jax.lax.bitcast_convert_type(up << 16, jnp.float32)
    return a, b


# u16 fixed-point geometry packing: 1/8 px over [-4096, 4096) covers any
# binned splat center (on- or off-screen) at supported image widths.
GEOM_SCALE = 8.0
GEOM_OFF = 4096.0


def _pack_u16_xy(x, y):
    """Two f32 position maps -> one f32 map holding (u16(x) << 16 | u16(y))
    fixed-point at 1/8 px. Rounded to nearest; clipped to the u16 range."""
    qx = jnp.clip((x + GEOM_OFF) * GEOM_SCALE + 0.5, 0.0, 65535.0).astype(
        jnp.int32
    )
    qy = jnp.clip((y + GEOM_OFF) * GEOM_SCALE + 0.5, 0.0, 65535.0).astype(
        jnp.int32
    )
    return jax.lax.bitcast_convert_type(
        (qx << 16) | qy, jnp.float32
    )


def _unpack_u16_xy(p):
    # Mosaic has no uint32 -> f32 cast; both halves fit int32 exactly
    # (<= 65535), so hop through int32.
    up = jax.lax.bitcast_convert_type(p, jnp.uint32)
    xi = (up >> 16).astype(jnp.int32)
    yi = (up & jnp.uint32(0xFFFF)).astype(jnp.int32)
    x = xi.astype(jnp.float32) / GEOM_SCALE - GEOM_OFF
    y = yi.astype(jnp.float32) / GEOM_SCALE - GEOM_OFF
    return x, y


def _supports_mosaic() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Layout helpers: pack / unpack between n separate [L] arrays and an
# attr-major [R, L] block (XLA's own stack/slice relayouts cost tens of ms
# at isect scale; these stream at bandwidth).
# ---------------------------------------------------------------------------


def _pick_blk(L: int, rows: int = 32) -> int:
    # keep (rows x blk f32, double-buffered) within the ~16MB scoped-vmem
    # budget: at 2DGS widths (24 out rows + 20 inputs) a 64K-lane block
    # compiles over the limit
    budget = (10 << 20) // (8 * max(rows, 1))
    for blk in (1 << 16, 1 << 14, 1 << 12, 1 << 10, 256, 128):
        if L % blk == 0 and blk <= budget:
            return blk
    return L


def _pack_kernel(n_in, R, *refs):
    ins = refs[:n_in]
    out = refs[n_in]
    for j in range(n_in):
        out[j : j + 1, :] = ins[j][:]
    if n_in < R:
        out[n_in:R, :] = jnp.zeros_like(out[n_in:R, :])


def pack_rows(arrays, R: int, interpret: bool) -> jnp.ndarray:
    """[L] x n (f32) -> [R, L] attr-major (rows >= n zero-filled)."""
    n = len(arrays)
    L = arrays[0].shape[0]
    blk = _pick_blk(L, n + R)
    a2 = [a.reshape(1, L) for a in arrays]
    return pl.pallas_call(
        functools.partial(_pack_kernel, n, R),
        grid=(L // blk,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(n)
        ],
        out_specs=pl.BlockSpec(
            (R, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        interpret=interpret,
    )(*a2)


def _unpack_kernel(n_out, *refs):
    src = refs[0]
    for j in range(n_out):
        refs[1 + j][:] = src[j : j + 1, :]


def unpack_rows(block: jnp.ndarray, n: int, interpret: bool):
    """[R, L] attr-major -> n separate [1, L] arrays (first n rows)."""
    R, L = block.shape
    blk = _pick_blk(L, R + n)
    outs = pl.pallas_call(
        functools.partial(_unpack_kernel, n),
        grid=(L // blk,),
        in_specs=[
            pl.BlockSpec((R, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(n)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, L), jnp.float32) for _ in range(n)
        ],
        interpret=interpret,
    )(block)
    return [o.reshape(L) for o in outs]


# ---------------------------------------------------------------------------
# Binning: counts (XLA elementwise)
# ---------------------------------------------------------------------------


def tile_counts(means2d, radii, tile_size, tile_width, tile_height):
    """Per-Gaussian tile-rectangle bounds + counts (isect_tiles.cu:49-77 /
    _torch_impl.py:351-360 rule). ``radii`` may be scalar per Gaussian
    ([..., N], circumscribed square) or per-axis AABB half-widths
    ([..., N, 2], elliptical binning — tighter rects for elongated
    splats)."""
    dt = means2d.dtype
    tm = means2d / tile_size
    if radii.ndim == means2d.ndim:  # [..., N, 2]
        trx = radii[..., 0].astype(dt) / tile_size
        try_ = radii[..., 1].astype(dt) / tile_size
        alive = jnp.maximum(radii[..., 0], radii[..., 1]) > 0
    else:
        trx = try_ = radii.astype(dt) / tile_size
        alive = radii > 0
    x0 = jnp.clip(jnp.floor(tm[..., 0] - trx), 0, tile_width).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(tm[..., 1] - try_), 0, tile_height).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(tm[..., 0] + trx), 0, tile_width).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(tm[..., 1] + try_), 0, tile_height).astype(jnp.int32)
    nx = x1 - x0
    counts = jnp.where(alive, nx * (y1 - y0), 0)
    return x0, y0, nx, counts


# ---------------------------------------------------------------------------
# Expansion kernel: compacted gaussian table -> per-isect rows + tile keys
# ---------------------------------------------------------------------------

# table_T rows (attr-major, [16, M_pad]):
_TR_CUM = 0  # inclusive isect-count prefix (f32, exact: cap < 2^24)
_TR_CNT = 1  # per-gaussian tile count
_TR_BASE = 2  # first tile id (cam*TH*TW + y0*TW + x0)
_TR_NX = 3  # rect width in tiles
_TR_CIDX = 4  # compacted index (= row number, f32)
_TR_ATTR = 5  # x, y, ca, cb, cc, op, colors[CH]  (5 .. 5+6+CH)


def _expand_kernel(cfg: V2Cfg, nattr, g0blk_ref, tot_ref, t_hbm, tile_ref,
                   out_refs_and_scratch):
    out_refs = out_refs_and_scratch[:-2]
    win, sems = out_refs_and_scratch[-2:]
    B = EXPAND_B
    BW = EXPAND_BW
    SB = EXPAND_SB
    step = pl.program_id(0)

    def dma(j):
        # window start must be provably 128-aligned for a tiled memref
        # slice; g0blk is the aligned block index (true g0 is recovered by
        # the cum-window compares, which tolerate leading extra candidates)
        return pltpu.make_async_copy(
            t_hbm.at[:, pl.ds(g0blk_ref[step * SB + j] * 128, BW)],
            win.at[j],
            sems.at[j],
        )

    for j in range(SB):
        dma(j).start()

    total = tot_ref[0]
    for j in range(SB):
        dma(j).wait()
        w = win[j]  # (d_t, BW)
        p0 = (step * SB + j) * B
        # one-hot row->gaussian assignment: p on sublanes, g on lanes
        pgs = (jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) + p0).astype(
            jnp.float32
        )
        cum_i = w[_TR_CUM : _TR_CUM + 1, :]
        cnt = w[_TR_CNT : _TR_CNT + 1, :]
        cum_e = cum_i - cnt
        oh = ((cum_e <= pgs) & (pgs < cum_i)).astype(jnp.bfloat16)  # (Bp, BWg)
        # bit-exact f32 selection: 3-way bf16 split (8+8+8 mantissa bits)
        w1 = w.astype(jnp.bfloat16)
        r1 = w - w1.astype(jnp.float32)
        w2 = r1.astype(jnp.bfloat16)
        w3 = (r1 - w2.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))  # contract g lanes -> (16, Bp)
        sel = (
            jax.lax.dot_general(w1, oh, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(w2, oh, dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(w3, oh, dn,
                                  preferred_element_type=jnp.float32)
        )
        pgl = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1) + p0).astype(
            jnp.float32
        )
        rank = pgl - (sel[_TR_CUM : _TR_CUM + 1, :]
                      - sel[_TR_CNT : _TR_CNT + 1, :])
        nxr = jnp.maximum(sel[_TR_NX : _TR_NX + 1, :], 1.0)
        dy = jnp.floor(rank / nxr)
        dx = rank - dy * nxr
        tile = (sel[_TR_BASE : _TR_BASE + 1, :] + dy * cfg.tile_width
                + dx).astype(jnp.int32)
        valid = pgl < total.astype(jnp.float32)

        if cfg.cull:
            # Conservative per-tile ellipse culling (EXACT: a dropped pair
            # could never reach alpha >= 1/255, which the kernel would zero
            # anyway). sigma(x) >= 0.5*lambda_min(conic)*dist(mean, tile)^2;
            # drop when that bound already exceeds ln(255*op). The reference
            # bins by the circumscribed AABB of the 3-sigma circle
            # (isect_tiles.cu:49-77), keeping corner tiles the ellipse
            # misses. Requires the 3DGS attr layout (x,y,ca,cb,cc,op).
            ts_f = float(cfg.tile_size)
            rem = tile % (cfg.tile_width * cfg.tile_height)
            txt = (rem % cfg.tile_width).astype(jnp.float32)
            tyt = (rem // cfg.tile_width).astype(jnp.float32)
            xs = sel[_TR_ATTR : _TR_ATTR + 1, :]
            ysl = sel[_TR_ATTR + 1 : _TR_ATTR + 2, :]
            ca = sel[_TR_ATTR + 2 : _TR_ATTR + 3, :]
            cb = sel[_TR_ATTR + 3 : _TR_ATTR + 4, :]
            cc = sel[_TR_ATTR + 4 : _TR_ATTR + 5, :]
            op = sel[_TR_ATTR + 5 : _TR_ATTR + 6, :]
            qx = jnp.clip(xs, txt * ts_f + 0.5, txt * ts_f + ts_f - 0.5)
            qy = jnp.clip(ysl, tyt * ts_f + 0.5, tyt * ts_f + ts_f - 0.5)
            d2 = (xs - qx) ** 2 + (ysl - qy) ** 2
            half_tr = 0.5 * (ca + cc)
            lam_min = jnp.maximum(
                half_tr - jnp.sqrt((0.5 * (ca - cc)) ** 2 + cb * cb + 1e-30),
                0.0,
            )
            keep = 0.5 * lam_min * d2 <= jnp.log(
                jnp.maximum(255.0 * op, 1e-12)
            )
            # culled-but-in-range entries go to the virtual overflow tile
            # (n_tiles) so they still get zero-grad id rows in the backward
            tile = jnp.where(keep, tile, cfg.n_tiles)
        tile_ref[0:1, pl.ds(j * B, B)] = jnp.where(valid, tile, INT32_MAX)
        # id payload (compacted index)
        out_refs[0][0:1, pl.ds(j * B, B)] = sel[_TR_CIDX : _TR_CIDX + 1, :]
        ng = cfg.n_geom_rows
        if cfg.geom_packed:
            out_refs[1][0:1, pl.ds(j * B, B)] = _pack_u16_xy(
                sel[_TR_ATTR : _TR_ATTR + 1, :],
                sel[_TR_ATTR + 1 : _TR_ATTR + 2, :],
            )
        else:
            for a in range(2):
                out_refs[1 + a][0:1, pl.ds(j * B, B)] = sel[
                    _TR_ATTR + a : _TR_ATTR + a + 1, :
                ]
        if cfg.attr_packed:
            # (conic, op, colors...) as bf16 pairs after the geometry rows
            nval = nattr - 2  # ca, cb, cc, op + CH colors
            for jp in range((nval + 1) // 2):
                lo = _TR_ATTR + 2 + 2 * jp
                a_half = sel[lo : lo + 1, :]
                b_half = (
                    sel[lo + 1 : lo + 2, :]
                    if 2 * jp + 1 < nval
                    else jnp.zeros_like(a_half)
                )
                out_refs[1 + ng + jp][0:1, pl.ds(j * B, B)] = _pack_pair(
                    a_half, b_half
                )
        else:
            for a in range(2, nattr):
                out_refs[ng + a - 1][0:1, pl.ds(j * B, B)] = sel[
                    _TR_ATTR + a : _TR_ATTR + a + 1, :
                ]


def _run_expand(cfg: V2Cfg, table_T, g0s, total):
    B, SB = EXPAND_B, EXPAND_SB
    cap = cfg.cap
    nattr = cfg.n_attr_eff
    n_out = cfg.n_srows  # == nattr unless attr_packed
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap // (B * SB),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, B * SB), lambda i, g, t: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + 1 + n_out)
        ],
        scratch_shapes=[
            pltpu.VMEM((SB, cfg.d_t, EXPAND_BW), jnp.float32),
            pltpu.SemaphoreType.DMA((SB,)),
        ],
    )
    out_shapes = [jax.ShapeDtypeStruct((1, cap), jnp.int32)] + [
        jax.ShapeDtypeStruct((1, cap), jnp.float32) for _ in range(1 + n_out)
    ]

    def kernel(g0blk_ref, tot_ref, t_hbm, tile_ref, *rest):
        _expand_kernel(cfg, nattr, g0blk_ref, tot_ref, t_hbm, tile_ref, rest)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=cfg.interpret,
    )(g0s, total, table_T)
    tile = outs[0].reshape(cap)
    idf = outs[1].reshape(cap)
    attrs = [o.reshape(cap) for o in outs[2:]]
    return tile, idf, attrs


def _build_sorted(cfg: V2Cfg, means2d, conics, colors, opacities, depths,
                  radii):
    """3DGS attr layout -> generic build."""
    C, N = cfg.C, cfg.n
    M = C * N
    CH = cfg.channels
    attr_rows = [
        means2d.reshape(M, 2)[:, 0].astype(jnp.float32),
        means2d.reshape(M, 2)[:, 1].astype(jnp.float32),
        conics.reshape(M, 3)[:, 0].astype(jnp.float32),
        conics.reshape(M, 3)[:, 1].astype(jnp.float32),
        conics.reshape(M, 3)[:, 2].astype(jnp.float32),
        opacities.reshape(M).astype(jnp.float32),
    ] + [colors.reshape(M, CH)[:, i].astype(jnp.float32) for i in range(CH)]
    return _build_sorted_generic(cfg, means2d, attr_rows, depths, radii)


def _build_sorted_generic(cfg: V2Cfg, means2d, attr_rows, depths, radii):
    """Compaction-depth sort + Pallas expansion + stable tile sort.

    ``attr_rows``: the cfg.n_attr_eff per-gaussian [M] f32 rows in kernel
    layout (must start with x, y when cfg.cull). Returns (S [d_s, cap]
    attr-major sorted rows, starts [n_tiles+1], aux dict for the backward
    reduction)."""
    C, N = cfg.C, cfg.n
    M = C * N
    assert M < (1 << 24), "f32-exact gaussian ids require C*N < 2^24"
    assert len(attr_rows) == cfg.n_attr_eff
    TW, TH, ts = cfg.tile_width, cfg.tile_height, cfg.tile_size
    cap = cfg.cap

    # Pre-sort: only visibility is needed for the key; counts/base/nx are
    # recomputed from the sorted (x, y, radius) rows so the sort carries 2
    # fewer payload operands (sort cost is ~linear in payload count).
    _, _, _, counts_pre = tile_counts(means2d, radii, ts, TW, TH)
    visible = counts_pre.reshape(M) > 0
    depth_key = jnp.where(visible, depths.reshape(M), jnp.inf).astype(
        jnp.float32
    )
    origid = jnp.arange(M, dtype=jnp.float32)

    ell = radii.ndim == means2d.ndim  # [C, N, 2] elliptical AABB
    if ell:
        rad_rows = (
            radii[..., 0].reshape(M).astype(jnp.float32),
            radii[..., 1].reshape(M).astype(jnp.float32),
        )
    else:
        rad_rows = (radii.reshape(M).astype(jnp.float32),)
    nrad = len(rad_rows)
    ops = (depth_key,) + rad_rows + tuple(attr_rows) + (origid,)
    so = jax.lax.sort(ops, num_keys=1, is_stable=False)
    origid_s = so[-1]
    # recompute rect/counts in sorted order (attr rows 0, 1 are x, y)
    m2d_s = jnp.stack([so[1 + nrad], so[2 + nrad]], axis=-1)
    if ell:
        radius_s = jnp.stack([so[1], so[2]], axis=-1).astype(jnp.int32)
    else:
        radius_s = so[1].astype(jnp.int32)
    x0s, y0s, nxs, counts_si = tile_counts(
        m2d_s, radius_s, ts, TW, TH
    )
    counts_s = counts_si.astype(jnp.float32)
    cam_s = jnp.floor(origid_s / float(N))
    base_s = cam_s * float(TW * TH) + (
        y0s * TW + x0s
    ).astype(jnp.float32)
    cum_i32 = jnp.cumsum(counts_si)
    total = cum_i32[-1]
    n_isects = jnp.minimum(total, cap)

    # table rows: cum, cnt, base, nx, cidx, x, y, ca, cb, cc, op, colors[CH]
    # pad the table to a fixed granularity so the pack kernel gets an
    # evenly-divisible length (M itself may be odd)
    M_pad = ((M + EXPAND_BW + 4095) // 4096) * 4096
    padv = lambda a, v: jnp.concatenate(
        [a, jnp.full((M_pad - M,), v, jnp.float32)]
    )
    # cum/cnt ride the table as f32; raw cumulative counts can exceed the
    # 2^24 f32-exact integer range when splats balloon (total is UNBOUNDED
    # even with a small cap), which would silently misalign the expansion's
    # one-hot windows. Clamping both prefix bounds to the cap keeps every
    # in-cap window bit-exact (out-of-cap tails are truncated anyway).
    cum_cl = jnp.minimum(cum_i32, cap)
    cum_e_cl = jnp.minimum(cum_i32 - counts_si, cap)
    rows = [
        padv(cum_cl.astype(jnp.float32), 3.0e7),
        padv((cum_cl - cum_e_cl).astype(jnp.float32), 0.0),
        padv(base_s, 0.0),
        padv(jnp.maximum(nxs, 1).astype(jnp.float32), 1.0),
        padv(jnp.arange(M, dtype=jnp.float32), 0.0),
    ] + [padv(so[1 + nrad + i], 0.0) for i in range(cfg.n_attr_eff)]
    table_T = pack_rows(rows, cfg.d_t, cfg.interpret)

    g0s = jnp.searchsorted(
        cum_i32, jnp.arange(0, cap, EXPAND_B, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    g0blk = jnp.minimum(g0s // 128, (M_pad - EXPAND_BW) // 128)
    tile, idf, attrs = _run_expand(
        cfg, table_T, g0blk, n_isects.reshape(1)
    )

    # packed rows (bf16 pairs and/or the u16 xy row) carry bit patterns:
    # ride the sort as int32 so no float canonicalization can touch them
    is_bits = [False] * len(attrs)
    if cfg.geom_packed:
        is_bits[0] = True
    if cfg.attr_packed:
        for i in range(cfg.n_geom_rows, cfg.n_srows):
            is_bits[i] = True
    attrs = [
        jax.lax.bitcast_convert_type(a, jnp.int32) if b else a
        for a, b in zip(attrs, is_bits)
    ]
    so2 = jax.lax.sort(
        (tile,) + tuple(attrs) + (idf,), num_keys=1, is_stable=True
    )
    tile_sorted = so2[0]
    sorted_rows = [
        jax.lax.bitcast_convert_type(a, jnp.float32)
        if b else a
        for a, b in zip(so2[1:], is_bits + [False])  # + idf row
    ]
    S = pack_rows(sorted_rows, cfg.d_s, cfg.interpret)

    starts = jnp.searchsorted(
        tile_sorted, jnp.arange(cfg.n_tiles_v + 1, dtype=jnp.int32),
        side="left"
    ).astype(jnp.int32)
    aux = dict(cum_i32=cum_i32, origid_s=origid_s,
               visible_s=counts_si > 0, n_isects=n_isects)
    return S, starts, aux


# ---------------------------------------------------------------------------
# Shared kernel helpers
# ---------------------------------------------------------------------------


def _shift_lane(x, sh, fill):
    rolled = pltpu.roll(x, sh, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < sh, fill, rolled)


def _cumprod_excl_lane(x):
    """Exclusive cumulative product along lanes (width must be a power of
    two): log2-step roll-and-multiply scan, exact f32."""
    y = _shift_lane(x, 1, 1.0)
    sh = 1
    while sh < x.shape[1]:
        y = y * _shift_lane(y, sh, 1.0)
        sh *= 2
    return y


def _cumsum_incl_lane(x):
    sh = 1
    while sh < x.shape[1]:
        x = x + _shift_lane(x, sh, 0.0)
        sh *= 2
    return x


def _pixel_coords(cfg: V2Cfg, t):
    """Pixel-center coords of tile ``t`` as (P, 1) columns."""
    ts = cfg.tile_size
    P = cfg.pixels
    rem = t % (cfg.tile_width * cfg.tile_height)
    ty = rem // cfg.tile_width
    tx = rem % cfg.tile_width
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = ((tx * ts + p % ts).astype(jnp.float32)) + 0.5
    py = ((ty * ts + p // ts).astype(jnp.float32)) + 0.5
    return px, py


def _chunk_colors(cfg, chunk):
    """(CH, K) color block of a sorted-table chunk (unpacks bf16 pairs
    when cfg.attr_packed: values [ca, cb, cc, op, c0, ...] ride rows
    ng.. as pairs, where ng = cfg.n_geom_rows)."""
    CH = cfg.channels
    ng = cfg.n_geom_rows
    if not cfg.attr_packed:
        return chunk[ng + 4:ng + 4 + CH, :]
    cols = []
    for i in range(CH):
        pair, half = divmod(4 + i, 2)
        a, b = _unpack_pair(chunk[ng + pair:ng + pair + 1, :])
        cols.append(b if half else a)
    return jnp.concatenate(cols, axis=0)


def _chunk_pair(cfg, chunk, px, py, c, off, end):
    """Per-chunk pair math in (P, K); returns dict of (P,K)/(1,K) maps.

    Stays on the VPU on purpose: the quadratic form COULD be a
    (P,8)x(8,K) feature matmul, but MXU matmuls with an 8-wide contraction
    or output dim get padded to 128 on the systolic array (measured: the
    matmul form made both kernels ~35% slower)."""
    if cfg.geom_packed:
        xs, ys = _unpack_u16_xy(chunk[0:1, :])
    else:
        xs, ys = chunk[0:1, :], chunk[1:2, :]
    ng = cfg.n_geom_rows
    if cfg.attr_packed:
        ca, cb = _unpack_pair(chunk[ng:ng + 1, :])
        cc, op = _unpack_pair(chunk[ng + 1:ng + 2, :])
    else:
        ca, cb, cc = (chunk[ng:ng + 1, :], chunk[ng + 1:ng + 2, :],
                      chunk[ng + 2:ng + 3, :])
        op = chunk[ng + 3:ng + 4, :]
    dx = xs - px  # (P, K)
    dy = ys - py
    sigma = (0.5 * ca) * (dx * dx) + (0.5 * cc) * (dy * dy) + cb * (dx * dy)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + c * K
    inr = (lane >= off) & (lane < end)
    alpha_raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    valid = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & inr
    alpha = jnp.where(valid, alpha, 0.0)
    return dict(dx=dx, dy=dy, xs=xs, ys=ys, ca=ca, cb=cb, cc=cc, op=op,
                sigma=sigma, alpha=alpha, valid=valid, inr=inr,
                clamped=alpha_raw > MAX_ALPHA)


def _composite(alpha, t_cur, cutoff="exact"):
    """Front-to-back weights. t_cur: (P, 1) carried transmittance.
    Returns (w, m, t_prev, t_new). ``cutoff="exact"`` reproduces the CUDA
    per-pair inclusive-product rule; "soft" drops only at chunk
    granularity (m is None)."""
    oma = 1.0 - alpha
    t_prev = _cumprod_excl_lane(oma) * t_cur
    if cutoff == "soft":
        w = alpha * t_prev
        K_ = alpha.shape[1]
        t_new = t_prev[:, K_ - 1:K_] * oma[:, K_ - 1:K_]
        return w, None, t_prev, t_new
    t_incl = t_prev * oma
    m = t_incl > TRANSMITTANCE_EPS
    w = alpha * t_prev * jnp.where(m, 1.0, 0.0)
    t_new = jnp.min(
        jnp.where(m, t_incl, jnp.broadcast_to(t_cur, t_incl.shape)),
        axis=1, keepdims=True,
    )
    t_new = jnp.minimum(t_cur, t_new)
    return w, m, t_prev, t_new


def _composite_log(alpha, t_cur, tri_incl, cutoff="exact"):
    """_composite in log space: cumulative products become ONE triangular
    MXU matmul of log1p(-alpha). The 2-way bf16 split keeps ~16 mantissa
    bits of each log term (|l| <= 6.9 at alpha <= 0.999), i.e. ~1e-4
    absolute in log space — below f32 multiply-chain noise."""
    Kw = alpha.shape[1]
    l = jnp.log1p(-alpha)  # (P, K), in [-6.9, 0]
    l1 = l.astype(jnp.bfloat16)
    l2 = (l - l1.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    incl = (
        jax.lax.dot_general(l1, tri_incl, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(l2, tri_incl, dn,
                              preferred_element_type=jnp.float32)
    )  # inclusive cumsum of l along lanes
    excl = incl - l
    t_prev = t_cur * jnp.exp(excl)
    if cutoff == "soft":
        w = alpha * t_prev
        t_new = t_cur * jnp.exp(incl[:, Kw - 1:Kw])
        return w, None, t_prev, t_new
    t_incl = t_cur * jnp.exp(incl)
    m = t_incl > TRANSMITTANCE_EPS
    w = alpha * t_prev * jnp.where(m, 1.0, 0.0)
    t_new = jnp.min(
        jnp.where(m, t_incl, jnp.broadcast_to(t_cur, t_incl.shape)),
        axis=1, keepdims=True,
    )
    t_new = jnp.minimum(t_cur, t_new)
    return w, m, t_prev, t_new


def _tri_incl_bf16():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    ).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(cfg: V2Cfg, starts_ref, masks_ref, s_hbm, out_ref, bufs,
                sems):
    P = cfg.pixels
    CH = cfg.channels
    G = cfg.tiles_per_step
    step = pl.program_id(0)
    tri_c = _tri_incl_bf16() if cfg.log_composite else None

    def dma(g, slot, c):
        return pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(c * K, K)],
            bufs.at[NBUF * g + slot],
            sems.at[NBUF * g + slot],
        )

    def bounds(t):
        off = starts_ref[t]
        end = starts_ref[t + 1]
        c0 = off // K
        c1 = jnp.where(
            (end > off) & (masks_ref[t] > 0), (end + K - 1) // K, c0
        )
        return off, end, c0, c1

    t0 = step * G
    # warm-up: first NBUF chunks of every tile in this step
    for g in range(G):
        _, _, c0, c1 = bounds(t0 + g)
        for d in range(NBUF):
            @pl.when(c0 + d < c1)
            def _():
                dma(g, d, c0 + d).start()

    for g in range(G):
        t = t0 + g
        off, end, c0, c1 = bounds(t)
        px, py = _pixel_coords(cfg, t)

        def cond(carry):
            c, t_cur, _ = carry
            return (c < c1) & (jnp.max(t_cur) > TRANSMITTANCE_EPS)

        def body(carry):
            c, t_cur, acc = carry
            slot = (c - c0) % NBUF
            dma(g, slot, c).wait()
            chunk = bufs[NBUF * g + slot]  # (d_s, K)
            pr = _chunk_pair(cfg, chunk, px, py, c, off, end)
            if cfg.log_composite:
                w, m, t_prev, t_new = _composite_log(
                    pr["alpha"], t_cur, tri_c, cfg.cutoff
                )
            else:
                w, m, t_prev, t_new = _composite(
                    pr["alpha"], t_cur, cfg.cutoff
                )
            acc = acc + jax.lax.dot_general(
                w, _chunk_colors(cfg, chunk),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, CH)

            @pl.when(c + NBUF < c1)
            def _():
                dma(g, slot, c + NBUF).start()

            return c + 1, t_new, acc

        c_fin, t_fin, acc = jax.lax.while_loop(
            cond, body,
            (c0, jnp.ones((P, 1), jnp.float32), jnp.zeros((P, CH), jnp.float32)),
        )

        # drain the in-flight prefetches (early termination leaves up to
        # NBUF outstanding)
        for d in range(NBUF):
            @pl.when(c_fin + d < c1)
            def _():
                dma(g, (c_fin + d - c0) % NBUF, c_fin + d).wait()

        out_ref[g, :, :CH] = acc
        out_ref[g, :, CH:CH + 1] = 1.0 - t_fin


def _run_fwd(cfg: V2Cfg, S, starts_padded, masks_padded):
    G = cfg.tiles_per_step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (G, cfg.pixels, cfg.chp), lambda i, s, m: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF * G, cfg.d_s, K), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF * G,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.n_steps * G, cfg.pixels, cfg.chp), jnp.float32
        ),
        interpret=cfg.interpret,
    )(starts_padded, masks_padded, S)
    return out  # PADDED [n_steps*G, P, CHP]; callers slice [:n_tiles]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _write_grad_rows(cfg: V2Cfg, wbufs, wslot, grows, id_row, abs_rows):
    """Store one chunk's per-isect grad rows in the gbuf layout.

    f32 layout: [grows..., id, absx, absy]; bf16-packed layout:
    [pack(g0,g1), ..., id, pack(absx,absy)] (see V2Cfg.grad_dtype)."""
    gid = cfg.gidrow
    if cfg.grad_packed:
        r = 0
        for i in range(0, len(grows) - 1, 2):
            wbufs[wslot, r:r + 1, :] = _pack_pair(grows[i], grows[i + 1])
            r += 1
        if len(grows) % 2:
            wbufs[wslot, r:r + 1, :] = _pack_pair(
                grows[-1], jnp.zeros_like(grows[-1])
            )
            r += 1
        wbufs[wslot, gid:gid + 1, :] = id_row
        if abs_rows:
            wbufs[wslot, gid + 1:gid + 2, :] = _pack_pair(*abs_rows)
    else:
        for i, gr in enumerate(grows):
            wbufs[wslot, i:i + 1, :] = gr
        wbufs[wslot, gid:gid + 1, :] = id_row
        for j, ar in enumerate(abs_rows):
            wbufs[wslot, gid + 1 + j:gid + 2 + j, :] = ar


def _bwd_kernel(cfg: V2Cfg, starts_ref, slot_ref, masks_ref, s_hbm, ct_ref,
                vt_ref, gbuf_in, gbuf_hbm, wbufs, bufs, sems, wsems, wflag):
    del gbuf_in  # aliased with gbuf_hbm (prefilled id row)
    P = cfg.pixels
    CH = cfg.channels
    G = cfg.tiles_per_step
    step = pl.program_id(0)
    idrow = cfg.idrow

    def dma(g, slot, c):
        return pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(c * K, K)],
            bufs.at[NBUF * g + slot],
            sems.at[NBUF * g + slot],
        )

    tri_c = _tri_incl_bf16() if cfg.log_composite else None
    idr0 = (idrow // 8) * 8  # sublane-aligned row block containing idrow

    def dma_idrow(g, slot, c):
        # light path: only the 8-row block holding the id row of the chunk
        return pltpu.make_async_copy(
            s_hbm.at[idr0:idr0 + 8, pl.ds(c * K, K)],
            bufs.at[NBUF * g + slot, idr0:idr0 + 8],
            sems.at[NBUF * g + slot],
        )

    use_moments = cfg.bwd_moments and not cfg.absgrad and cfg.n_attr == 0
    ts = cfg.tile_size
    if use_moments:
        # Fixed pixel-moment matrix in tile-LOCAL coordinates (invariant
        # across tiles AND chunks; Mosaic hoists it). Local coords keep the
        # x^2-scale terms at O(tile^2) so the separable expansion below
        # loses no f32 precision against the per-pair products.
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (8, P), 1)
        pxl = (pc % ts).astype(jnp.float32) + 0.5
        pyl = (pc // ts).astype(jnp.float32) + 0.5
        phi = jnp.where(
            r8 == 0, 1.0,
            jnp.where(r8 == 1, pxl,
            jnp.where(r8 == 2, pyl,
            jnp.where(r8 == 3, pxl * pxl,
            jnp.where(r8 == 4, pxl * pyl,
            jnp.where(r8 == 5, pyl * pyl, 0.0))))))
    if cfg.tri_cumsum:
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        ).astype(jnp.float32)

    t0 = step * G
    for g in range(G):
        for d in range(NBUF):
            wflag[NBUF * g + d] = 0
        t = t0 + g
        off = starts_ref[t]
        end = starts_ref[t + 1]
        c0 = off // K
        c1_full = jnp.where(
            (end > off) & (masks_ref[t] > 0), (end + K - 1) // K, c0
        )
        for d in range(NBUF):
            @pl.when(c0 + d < c1_full)
            def _():
                dma(g, d, c0 + d).start()

    for g in range(G):
        t = t0 + g
        off = starts_ref[t]
        end = starts_ref[t + 1]
        enabled = masks_ref[t] > 0
        c0 = off // K
        c1 = jnp.where(end > off, (end + K - 1) // K, c0)
        c1_full = jnp.where(enabled, c1, c0)
        slot0 = slot_ref[t]
        px, py = _pixel_coords(cfg, t)
        rem_t = t % (cfg.tile_width * cfg.tile_height)
        ox = ((rem_t % cfg.tile_width) * ts).astype(jnp.float32)
        oy = ((rem_t // cfg.tile_width) * ts).astype(jnp.float32)

        v_out = vt_ref[g]  # (P, CHP)
        c_out = ct_ref[g]
        v_c = v_out[:, :CH]  # (P, CH)
        v_a = v_out[:, CH:CH + 1]  # (P, 1)
        t_final = 1.0 - c_out[:, CH:CH + 1]
        q0 = jnp.sum(c_out[:, :CH] * v_c, axis=1, keepdims=True)  # (P, 1)

        def wait_write(wslot):
            @pl.when(wflag[wslot] == 1)
            def _():
                pltpu.make_async_copy(
                    wbufs.at[wslot], wbufs.at[wslot], wsems.at[wslot]
                ).wait()

        def cond(carry):
            c, t_cur, _ = carry
            return (c < c1_full) & (jnp.max(t_cur) > TRANSMITTANCE_EPS)

        def body(carry):
            c, t_cur, q_cur = carry
            rs = (c - c0) % NBUF
            dma(g, rs, c).wait()
            chunk = bufs[NBUF * g + rs]  # (d_s, K)
            pr = _chunk_pair(cfg, chunk, px, py, c, off, end)
            alpha = pr["alpha"]
            if cfg.log_composite:
                w, m, t_prev, t_new = _composite_log(
                    alpha, t_cur, tri_c, cfg.cutoff
                )
            else:
                w, m, t_prev, t_new = _composite(alpha, t_cur, cfg.cutoff)

            # G[p, k] = sum_ch color_k[ch] * v_c[p, ch]
            Gpk = jax.lax.dot_general(
                v_c, _chunk_colors(cfg, chunk),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, K)
            u = w * Gpk
            if cfg.tri_cumsum:
                s = q_cur - jax.lax.dot_general(
                    u, tri, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # suffix color term after k
            else:
                s = q_cur - _cumsum_incl_lane(u)
            oma = 1.0 - alpha
            inv_oma = 1.0 / jnp.where(oma > 0, oma, 1.0)
            v_alpha = t_prev * Gpk - s * inv_oma + v_a * t_final * inv_oma
            if m is not None:
                v_alpha = v_alpha * jnp.where(m, 1.0, 0.0)
            dvalid = jnp.where(
                pr["valid"] & jnp.logical_not(pr["clamped"]), 1.0, 0.0
            )
            v_sig = -alpha * v_alpha * dvalid  # (P, K)
            dx, dy = pr["dx"], pr["dy"]

            rsum = lambda x: jnp.sum(x, axis=0, keepdims=True)  # (1, K)

            wslot = NBUF * g + rs
            wb = wbufs.at[wslot]

            # wait for the previous write using this buffer (if any)
            wait_write(wslot)
            if use_moments:
                # ONE MXU contraction over pixels, then (1, K) algebra:
                # sum_p v_sig*f(dx, dy) is separable since dx = xl - pxl.
                mom = jax.lax.dot_general(
                    phi, v_sig, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (8, K): m0, mx, my, mxx, mxy, myy, 0, 0
                m0, mx_, my_ = mom[0:1], mom[1:2], mom[2:3]
                mxx, mxy, myy = mom[3:4], mom[4:5], mom[5:6]
                xl = pr["xs"] - ox
                yl = pr["ys"] - oy
                sx = xl * m0 - mx_  # sum_p v_sig*dx
                sy = yl * m0 - my_
                sxx = xl * xl * m0 - 2.0 * xl * mx_ + mxx
                sxy = xl * yl * m0 - xl * my_ - yl * mx_ + mxy
                syy = yl * yl * m0 - 2.0 * yl * my_ + myy
                grows = [
                    pr["ca"] * sx + pr["cb"] * sy,
                    pr["cc"] * sy + pr["cb"] * sx,
                    0.5 * sxx,
                    sxy,
                    0.5 * syy,
                ]
                msum = m0
            else:
                grows = [
                    rsum(v_sig * (pr["ca"] * dx + pr["cb"] * dy)),
                    rsum(v_sig * (pr["cc"] * dy + pr["cb"] * dx)),
                    rsum(v_sig * 0.5 * dx * dx),
                    rsum(v_sig * dx * dy),
                    rsum(v_sig * 0.5 * dy * dy),
                ]
                msum = rsum(v_sig)
            # v_opacity row: alpha == op*exp(-sigma) exactly wherever
            # dvalid=1, so sum(v_alpha*exp(-sigma)*dvalid) = -sum(v_sig)/op
            # (saves a second exp evaluation)
            grows.append(jnp.where(
                pr["op"] > 0.0,
                -msum / jnp.where(pr["op"] > 0.0, pr["op"], 1.0),
                0.0,
            ))
            # v_color[ch, k] = sum_p w[p, k] * v_c[p, ch]
            vcol = jax.lax.dot_general(
                v_c, w, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            grows += [vcol[i:i + 1, :] for i in range(CH)]
            id_row = jnp.where(
                pr["inr"], chunk[idrow:idrow + 1, :], PAD_ID
            )
            if cfg.absgrad:
                # |per-PIXEL xy contribution| summed over pixels
                # (bwd.cu:232-234 takes abs before the warp reduction)
                abs_rows = [
                    rsum(jnp.abs(v_sig * (pr["ca"] * dx + pr["cb"] * dy))),
                    rsum(jnp.abs(v_sig * (pr["cc"] * dy + pr["cb"] * dx))),
                ]
            else:
                abs_rows = []
            _write_grad_rows(cfg, wbufs, wslot, grows, id_row, abs_rows)
            slot = slot0 + (c - c0)
            pltpu.make_async_copy(
                wb, gbuf_hbm.at[:, pl.ds(slot * K, K)], wsems.at[wslot]
            ).start()
            wflag[wslot] = 1

            @pl.when(c + NBUF < c1_full)
            def _():
                dma(g, rs, c + NBUF).start()

            # s's last lane IS q_cur - sum(u): no separate lane reduce
            q_new = s[:, K - 1:K]
            return c + 1, t_new, q_new

        start_c = jnp.where(enabled, c0, c1)  # masked tile: skip main loop
        c_fin, _, _ = jax.lax.while_loop(
            cond, body, (start_c, jnp.ones((P, 1), jnp.float32), q0)
        )

        # drain the in-flight full-chunk prefetches
        for d in range(NBUF):
            @pl.when(c_fin + d < c1_full)
            def _():
                dma(g, (c_fin + d - c0) % NBUF, c_fin + d).wait()

        # Light id-row pass over the chunks never reached (early termination
        # or masked tile): the reduction's rank==id alignment requires every
        # in-range intersection to appear exactly once in the id-sorted
        # gradient rows, so skipped chunks contribute (id, zero-grad) rows.
        c_light0 = jnp.where(enabled, c_fin, c0)

        for d in range(NBUF):
            @pl.when(c_light0 + d < c1)
            def _():
                dma_idrow(
                    g, (c_light0 + d - c0) % NBUF, c_light0 + d
                ).start()

        def cond_l(carry):
            c, = carry
            return c < c1

        def body_l(carry):
            c, = carry
            rs = (c - c0) % NBUF
            dma_idrow(g, rs, c).wait()
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + c * K
            inr = (lane >= off) & (lane < end)
            ids = bufs[NBUF * g + rs, idrow:idrow + 1, :]
            wslot = NBUF * g + rs
            wait_write(wslot)
            gid = cfg.gidrow
            wbufs[wslot, 0:gid, :] = jnp.zeros((gid, K), jnp.float32)
            wbufs[wslot, gid:gid + 1, :] = jnp.where(inr, ids, PAD_ID)
            if cfg.absgrad:
                nab = 1 if cfg.grad_packed else 2
                wbufs[wslot, gid + 1:gid + 1 + nab, :] = jnp.zeros(
                    (nab, K), jnp.float32
                )
            slot = slot0 + (c - c0)
            pltpu.make_async_copy(
                wbufs.at[wslot], gbuf_hbm.at[:, pl.ds(slot * K, K)],
                wsems.at[wslot],
            ).start()
            wflag[wslot] = 1

            @pl.when(c + NBUF < c1)
            def _():
                dma_idrow(g, rs, c + NBUF).start()

            return (c + 1,)

        jax.lax.while_loop(cond_l, body_l, (c_light0,))

    # drain all pending grad writes before the step ends
    for ws in range(NBUF * G):
        @pl.when(wflag[ws] == 1)
        def _():
            pltpu.make_async_copy(
                wbufs.at[ws], wbufs.at[ws], wsems.at[ws]
            ).wait()


def _run_bwd(cfg: V2Cfg, S, starts_padded, slot_base, masks_padded, ct, vt,
             gbuf_init):
    G = cfg.tiles_per_step
    P = cfg.pixels
    tb = lambda: pl.BlockSpec(
        (G, P, cfg.chp), lambda i, s, sl, m: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cfg.n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # S
            tb(),  # ct (fwd tile outputs)
            tb(),  # vt (cotangents)
            pl.BlockSpec(memory_space=pl.ANY),  # gbuf (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NBUF * G, cfg.d_g, K), jnp.float32),
            pltpu.VMEM((NBUF * G, cfg.d_s, K), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF * G,)),
            pltpu.SemaphoreType.DMA((NBUF * G,)),
            pltpu.SMEM((NBUF * G,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.d_g, cfg.slot_cap * K), jnp.float32
        ),
        input_output_aliases={6: 0},  # gbuf_init (after 3 prefetch args) -> out
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts_padded, slot_base, masks_padded, S, ct, vt, gbuf_init)


# ---------------------------------------------------------------------------
# Per-Gaussian reduction: id-sort + Pallas one-hot MXU segment sums at
# build-determined block bounds (no atomics, no gathers, deterministic)
# ---------------------------------------------------------------------------

SEG_SC = 512  # segsum fetch width (4 K-chunks per DMA)
SEG_G = 8  # id blocks (128 compacted ids each) per grid step
SEG_NBUF = 2  # fetch ring depth per id block


def _segsum_kernel(d, idrow_, packed_pairs, bounds_ref, s_hbm, out_ref, bufs,
                   sems):
    G, SC, NB = SEG_G, SEG_SC, SEG_NBUF
    step = pl.program_id(0)

    def dma(g, slot, c):
        return pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(c * SC, SC)],
            bufs.at[g * NB + slot],
            sems.at[g * NB + slot],
        )

    def crange(b):
        lo = bounds_ref[b]
        hi = bounds_ref[b + 1]
        c0 = lo // SC
        c1 = jnp.where(hi > lo, (hi + SC - 1) // SC, c0)
        return c0, c1

    b0 = step * G
    # warm-up: first NB fetches of every id block in this step
    for g in range(G):
        c0, c1 = crange(b0 + g)
        for dd in range(NB):
            @pl.when(c0 + dd < c1)
            def _():
                dma(g, dd, c0 + dd).start()

    dn = (((1,), (1,)), ((), ()))
    for g in range(G):
        b = b0 + g
        c0, c1 = crange(b)
        # this block's 128 compacted ids, on sublanes
        jf = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) + b * 128
        ).astype(jnp.float32)

        def cond(carry):
            c, _ = carry
            return c < c1

        def body(carry):
            c, acc = carry
            slot = (c - c0) % NB
            dma(g, slot, c).wait()
            sc = bufs[g * NB + slot]  # (d, SC)
            ids = sc[idrow_:idrow_ + 1, :]  # (1, SC)
            # One-hot id membership IS the segment mask: rows of other
            # blocks (and PAD_ID rows) compare to zero columns, so no
            # range masking is needed — coverage of [lo, hi) suffices.
            ohT = (jf == ids).astype(jnp.bfloat16)  # (128, SC)
            if packed_pairs:
                # each row packs two trunc-bf16 halves -> both halves are
                # EXACT under a bf16 cast: two plain bf16 matmuls, no split
                up = jax.lax.bitcast_convert_type(sc, jnp.uint32)
                ah = jax.lax.bitcast_convert_type(
                    up & jnp.uint32(0xFFFF0000), jnp.float32
                ).astype(jnp.bfloat16)
                bh = jax.lax.bitcast_convert_type(
                    up << 16, jnp.float32
                ).astype(jnp.bfloat16)
                acc = jnp.concatenate(
                    [
                        acc[:d] + jax.lax.dot_general(
                            ah, ohT, dn,
                            preferred_element_type=jnp.float32),
                        acc[d:] + jax.lax.dot_general(
                            bh, ohT, dn,
                            preferred_element_type=jnp.float32),
                    ],
                    axis=0,
                )
            else:
                # bit-exact f32 accumulation: 3-way bf16 mantissa split
                # (the one-hot factor is exact in bf16; same proof as the
                # expansion)
                w1 = sc.astype(jnp.bfloat16)
                r1 = sc - w1.astype(jnp.float32)
                w2 = r1.astype(jnp.bfloat16)
                w3 = (r1 - w2.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + (
                    jax.lax.dot_general(w1, ohT, dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(w2, ohT, dn,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(w3, ohT, dn,
                                          preferred_element_type=jnp.float32)
                )  # (d, 128)

            @pl.when(c + NB < c1)
            def _():
                dma(g, slot, c + NB).start()

            return c + 1, acc

        d_out = 2 * d if packed_pairs else d
        _, acc = jax.lax.while_loop(
            cond, body, (c0, jnp.zeros((d_out, 128), jnp.float32))
        )
        out_ref[:, g * 128:(g + 1) * 128] = acc


def segsum_rows(packed, bounds, idrow, n_blocks, interpret,
                packed_pairs=False):
    """Per-128-id-block segment sums of id-sorted rows, on the MXU.

    ``packed``: [d, L] attr-major id-sorted rows with the compacted id at
    row ``idrow`` (PAD_ID for padding rows). ``bounds``: int32
    [n_steps*SEG_G + 1] row bounds per id block (block b's rows live in
    [bounds[b], bounds[b+1]), known from the build's cum_i32). Returns
    [d, n_steps*SEG_G*128] block-summed columns in compacted-id order —
    or [2d, ...] when ``packed_pairs`` (rows hold bf16 pairs; output rows
    [0:d] sum the high halves, [d:2d] the low halves). Replaces the CUDA
    backward's atomicAdd scatter (rasterize_to_pixels_bwd.cu:243-274)
    with a deterministic streaming one-hot contraction."""
    d, L = packed.shape
    d_out = 2 * d if packed_pairs else d
    G = SEG_G
    steps = -(-n_blocks // G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (d_out, G * 128), lambda i, b: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((G * SEG_NBUF, d, SEG_SC), jnp.float32),
            pltpu.SemaphoreType.DMA((G * SEG_NBUF,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_segsum_kernel, d, idrow, packed_pairs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (d_out, steps * G * 128), jnp.float32
        ),
        interpret=interpret,
    )(bounds, packed)


CUMSUM_BLK = 8192


def _cumsum_rows_kernel(x_ref, o_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    cs = _cumsum_incl_lane(x_ref[...])  # (R, BLK)
    o_ref[...] = cs + carry[:, 0:1]
    carry[:, 0:1] = carry[:, 0:1] + cs[:, -1:]


def cumsum_rows(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Inclusive cumsum along axis 1 of [R, L] in ONE streaming pass
    (sequential grid + VMEM carry). XLA's multi-pass cumsum re-reads the
    table several times at isect scale; this runs at HBM bandwidth."""
    R, L = x.shape
    blk = CUMSUM_BLK
    while L % blk:
        blk //= 2
    return pl.pallas_call(
        _cumsum_rows_kernel,
        grid=(L // blk,),
        in_specs=[
            pl.BlockSpec((R, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (R, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32)],
        interpret=interpret,
    )(x)


def _reduce_grads(cfg: V2Cfg, gbuf, aux):
    """gbuf [d_g, slot_cap*K] -> (v_flat [M, 6+CH], absgrad [M, 2] | None),
    both in ORIGINAL gaussian order.

    Every in-range intersection appears exactly once in gbuf with its
    compacted-gaussian id (the bwd kernel light-writes skipped chunks), and
    the expansion enumerates intersections in compacted-id-major order, so
    the id-sorted layout is FULLY DETERMINED by the build: rows of compact
    id r occupy [min(cum[r-1], n_isects), min(cum[r], n_isects)). The
    per-id sum is a streaming Pallas one-hot MXU contraction over each
    128-id block's row range (``segsum_rows``), with the block bounds known
    from `aux["cum_i32"]` — no end-detection sort, no gather, and correct
    even when `total > cap` truncates the tail: partial runs reduce to
    partial sums instead of misaligning every later id. A final sort by
    the original id restores input order."""
    M = cfg.C * cfg.n
    na = cfg.n_attr_eff
    gid = cfg.gidrow
    nval = na + (2 if cfg.absgrad else 0)
    L = gbuf.shape[1]
    assert L >= M, "isect capacity too small for the reduction layout"

    n_vrows = gid + (1 if (cfg.grad_packed and cfg.absgrad) else
                     (2 if cfg.absgrad else 0))
    cols = unpack_rows(gbuf, n_vrows + 1, cfg.interpret)
    ids = cols[gid]
    vals = cols[:gid] + cols[gid + 1:]

    if cfg.grad_packed:
        # payloads carry packed bit patterns: ride the sort as int32 so
        # no float canonicalization can touch them
        vals = [jax.lax.bitcast_convert_type(v, jnp.int32) for v in vals]
    so = jax.lax.sort((ids,) + tuple(vals), num_keys=1, is_stable=False)
    vals_s = list(so[1:])
    if cfg.grad_packed:
        vals_s = [
            jax.lax.bitcast_convert_type(v, jnp.float32) for v in vals_s
        ]
    # restore the gbuf row layout (vals..., id, abs...) for the kernel
    rows = vals_s[:gid] + [so[0]] + vals_s[gid:]
    packed = pack_rows(rows, cfg.d_g, cfg.interpret)

    # per-128-id-block row bounds from the build
    G128 = 128 * SEG_G
    nblk = (-(-M // G128)) * SEG_G
    idx = jnp.minimum(
        jnp.arange(1, nblk + 1, dtype=jnp.int32) * 128 - 1, M - 1
    )
    bnd = jnp.minimum(jnp.take(aux["cum_i32"], idx), aux["n_isects"])
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), bnd.astype(jnp.int32)]
    )

    seg = segsum_rows(packed, bounds, gid, nblk, cfg.interpret,
                      packed_pairs=cfg.grad_packed)
    if cfg.grad_packed:
        # seg rows [0:d_g] are high-half sums (even values), [d_g:2*d_g]
        # low-half sums (odd values); value i -> row (i%2)*d_g + i//2
        segrows = unpack_rows(seg, 2 * cfg.d_g, cfg.interpret)

        def val_row(i):
            pair, half = divmod(i, 2)
            return segrows[(cfg.d_g if half else 0) + pair]

        segvals = [val_row(i)[:M] for i in range(na)]
        if cfg.absgrad:
            ar = gid + 1
            segvals += [segrows[ar][:M], segrows[cfg.d_g + ar][:M]]
    else:
        segrows = unpack_rows(seg, n_vrows + 1, cfg.interpret)
        segvals = segrows[:na] + (segrows[gid + 1:] if cfg.absgrad else [])
        segvals = [v[:M] for v in segvals]

    # back to original order
    if cfg.grad_packed:
        # pack the per-gaussian sums as trunc-bf16 pairs for the M-scale
        # unsort too (payloads ~halve; ~2e-3 relative noise on final grads,
        # same budget as the packed rows). int32 so the sort can't
        # canonicalize the pair bit patterns.
        pairs = []
        for i in range(0, nval, 2):
            b_half = (
                segvals[i + 1] if i + 1 < nval
                else jnp.zeros_like(segvals[i])
            )
            pairs.append(jax.lax.bitcast_convert_type(
                _pack_pair(segvals[i], b_half), jnp.int32
            ))
        so3 = jax.lax.sort(
            (aux["origid_s"],) + tuple(pairs), num_keys=1, is_stable=False
        )
        vals = []
        for p in so3[1:]:
            a_half, b_half = _unpack_pair(
                jax.lax.bitcast_convert_type(p, jnp.float32)
            )
            vals += [a_half, b_half]
        vals = vals[:nval]
    else:
        so3 = jax.lax.sort(
            (aux["origid_s"],) + tuple(segvals), num_keys=1, is_stable=False
        )
        vals = list(so3[1 : 1 + nval])
    v_flat = jnp.stack(vals[:na], axis=-1)  # [M, n_attr_eff]
    absg = (
        jnp.stack(vals[na:nval], axis=-1)
        if cfg.absgrad else None
    )
    return v_flat, absg


# ---------------------------------------------------------------------------
# custom-vjp core
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_core(cfg, means2d, conics, colors, opacities, depths, radii,
                 masks, ag_probe):
    out, _ = _raster_core_fwd(
        cfg, means2d, conics, colors, opacities, depths, radii, masks,
        ag_probe,
    )
    return out


def _starts_padded(cfg, starts):
    # pad so tiles beyond n_tiles in the last grid step read empty runs
    pad = cfg.n_steps * cfg.tiles_per_step + 1 - starts.shape[0]
    return jnp.concatenate(
        [starts, jnp.broadcast_to(starts[-1:], (pad,))]
    ) if pad > 0 else starts


def _masks_padded(cfg, masks):
    # real tiles enabled (or user mask); the virtual overflow tile and any
    # grid padding are always masked off (light id-row path only)
    n = cfg.n_steps * cfg.tiles_per_step
    if masks.shape[0] == 0:
        masks = jnp.ones((cfg.n_tiles,), jnp.int32)
    pad = n - masks.shape[0]
    if pad > 0:
        masks = jnp.concatenate([masks, jnp.zeros((pad,), jnp.int32)])
    return masks


def _raster_core_fwd(cfg, means2d, conics, colors, opacities, depths, radii,
                     masks, ag_probe):
    del ag_probe  # its cotangent carries absgrad out of the backward
    S, starts, aux = _build_sorted(
        cfg, means2d, conics, colors, opacities, depths, radii
    )
    sp = _starts_padded(cfg, starts)
    mp = _masks_padded(cfg, masks)
    tiles_out_p = _run_fwd(cfg, S, sp, mp)  # PADDED [n_steps*G, P, CHP]
    res = (S, starts, tiles_out_p, aux, mp, masks.shape, radii.shape)
    return (tiles_out_p[: cfg.n_tiles], aux["n_isects"]), res


def _raster_core_bwd(cfg, res, cot):
    S, starts, tiles_out, aux, mp, mask_shape, radii_shape = res
    vt, _ = cot  # [n_tiles, P, CHP]
    vt = vt.astype(jnp.float32)
    CH = cfg.channels

    # per-tile chunk-span slot bases
    off = starts[:-1]
    end = starts[1:]
    nchunks = jnp.where(end > off, (end + K - 1) // K - off // K, 0)
    slot_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)]
    )
    sp = _starts_padded(cfg, starts)
    slot_pad = sp.shape[0] - slot_base.shape[0]
    if slot_pad > 0:
        slot_base = jnp.concatenate(
            [slot_base, jnp.broadcast_to(slot_base[-1:], (slot_pad,))]
        )

    gbuf_init = jnp.zeros((cfg.d_g, cfg.slot_cap * K), jnp.float32)
    gbuf_init = gbuf_init.at[cfg.gidrow].set(PAD_ID)

    pad_tiles = cfg.n_steps * cfg.tiles_per_step - cfg.n_tiles
    padt = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad_tiles,) + x.shape[1:], x.dtype)]
    ) if pad_tiles else x

    gbuf = _run_bwd(
        cfg, S, sp, slot_base, mp, tiles_out, padt(vt), gbuf_init
    )
    v_flat, absg = _reduce_grads(cfg, gbuf, aux)

    C, N = cfg.C, cfg.n
    v_means2d = v_flat[:, 0:2].reshape(C, N, 2)
    v_conics = v_flat[:, 2:5].reshape(C, N, 3)
    v_opac = v_flat[:, 5].reshape(C, N)
    v_colors = v_flat[:, 6:6 + CH].reshape(C, N, CH)
    v_ag = (
        absg.reshape(C, N, 2) if absg is not None
        else jnp.zeros((C, N, 2), jnp.float32)
    )
    return (
        v_means2d, v_conics, v_colors, v_opac,
        jnp.zeros((C, N), jnp.float32),  # depths (sort order is nondiff)
        np.zeros(radii_shape, jax.dtypes.float0),  # radii (int)
        np.zeros(mask_shape, jax.dtypes.float0),  # masks (int)
        v_ag,  # absgrad surfaced as the probe's cotangent
    )


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels_v2(
    means2d: jnp.ndarray,  # [C, N, 2]
    conics: jnp.ndarray,  # [C, N, 3]
    colors: jnp.ndarray,  # [C, N, CH]
    opacities: jnp.ndarray,  # [C, N]
    depths: jnp.ndarray,  # [C, N]
    radii: jnp.ndarray,  # [C, N] int32
    width: int,
    height: int,
    tile_size: int = 16,
    isect_capacity: int = 1 << 20,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, CH]
    masks: Optional[jnp.ndarray] = None,  # [C, TH, TW] bool
    tiles_per_step: int = 4,
    interpret: Optional[bool] = None,
    absgrad_probe: Optional[jnp.ndarray] = None,  # [C, N, 2] zeros
    cutoff_mode: str = "exact",
    grad_dtype: str = "f32",
    attr_dtype: str = "f32",
    log_composite: bool = False,
    geom_dtype: str = "f32",
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Differentiable fused binning + tile rasterization.

    Returns ([C,H,W,CH] colors, [C,H,W,1] alphas, meta). Equivalent of the
    reference isect_tiles + isect_offset_encode + rasterize_to_pixels chain
    (gsplat/cuda/_wrapper.py:343,417,436) in one call. Gradients flow to
    means2d, conics, colors, opacities (+ backgrounds); deterministic.
    """
    C, N, _ = means2d.shape
    CH = colors.shape[-1]
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    if interpret is None:
        interpret = not _supports_mosaic()
    blk = EXPAND_B * EXPAND_SB
    cap = ((isect_capacity + blk - 1) // blk) * blk
    cfg = V2Cfg(
        C=C, tile_width=TW, tile_height=TH, tile_size=tile_size,
        channels=CH, cap=cap, n=N, tiles_per_step=tiles_per_step,
        interpret=interpret, absgrad=absgrad_probe is not None,
        cutoff=cutoff_mode, grad_dtype=grad_dtype, attr_dtype=attr_dtype,
        log_composite=log_composite, geom_dtype=geom_dtype,
    )
    if masks is not None:
        masks_arr = masks.reshape(C * TH * TW).astype(jnp.int32)
    else:
        masks_arr = jnp.zeros((0,), jnp.int32)
    if absgrad_probe is None:
        absgrad_probe = jnp.zeros((C, N, 2), jnp.float32)
    (tiles_out, n_isects) = _raster_core(
        cfg, means2d.astype(jnp.float32), conics.astype(jnp.float32),
        colors.astype(jnp.float32), opacities.astype(jnp.float32),
        depths.astype(jnp.float32), radii, masks_arr, absgrad_probe,
    )

    # assemble tiles -> image (XLA, differentiable)
    ts = tile_size
    img = tiles_out.reshape(C, TH, TW, ts, ts, cfg.chp)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
        C, TH * ts, TW * ts, cfg.chp
    )[:, :height, :width, :]
    colors_img = img[..., :CH]
    alphas = img[..., CH:CH + 1]
    if backgrounds is not None:
        colors_img = colors_img + (1.0 - alphas) * backgrounds[:, None, None, :]
    meta = {"n_isects": n_isects, "tile_width": TW, "tile_height": TH}
    return colors_img, alphas, meta
