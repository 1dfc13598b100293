"""Fused 2DGS (surfel) tile rasterizer on the v2 pipeline skeleton.

TPU-native equivalent of the reference CUDA 2DGS kernels
(/root/reference/gsplat/cuda/csrc/rasterize_to_pixels_2dgs_fwd.cu:200-360,
rasterize_to_pixels_2dgs_bwd.cu) sharing raster_v2's binning / expansion /
sorted-layout / gradient-reduction machinery. Differences from 3DGS:

  * pair weight: ray-splat intersection via the homogeneous-plane cross
    product (2dgs_fwd.cu:217-260) — ``h_u = px*M_2 - M_0``,
    ``h_v = py*M_2 - M_1``, ``s = cross(h_u, h_v)`` projectively
    flattened; sigma = 0.5 * min(UV Gaussian, 2x-filtered 2D Gaussian);
  * per-gaussian attrs carry the 3x3 ray transform instead of a conic
    (no ellipse culling — AABB binning like the reference);
  * extra per-pixel outputs: accumulated normals (ride as color
    channels), the Mip-NeRF-360-style distortion accumulator, and median
    depth (first crossing of T <= 0.5; not differentiated, matching the
    reference backward);
  * the hand-derived backward VJP adds the distortion chain: per-pair
    ``Dw = 2 v_d (z P - A + SZ - z S)`` folds into the same
    suffix-accumulator machinery the 3DGS kernel uses for colors, with a
    prefix-wz carry ``A`` and the identities ``P = 1 - T_prev``,
    ``S = T_incl - T_fin``, ``SZ = WZ_total - A - w z``.

Sorted attr rows (n_attr = 12 + CB where CB = user channels + z + 3
normals): x, y, m00..m22, op, colors[CB]; grad rows mirror them.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gscodec_studio_tpu.ops.raster_v2 import (
    ALPHA_THRESHOLD,
    EXPAND_B,
    EXPAND_SB,
    K,
    NBUF,
    PAD_ID,
    TRANSMITTANCE_EPS,
    MAX_ALPHA,
    V2Cfg,
    _build_sorted_generic,
    _composite,
    _composite_log,
    _tri_incl_bf16,
    _cumsum_incl_lane,
    _masks_padded,
    _pixel_coords,
    _reduce_grads,
    _shift_lane,
    _starts_padded,
    _supports_mosaic,
)

FILTER_INV_SQUARE = 2.0

# attr-row offsets
_AX = 0
_AY = 1
_AM = 2  # 9 rows m00..m22 (row-major M[r, c] at _AM + 3*r + c)
_AOP = 11
_ACOL = 12  # CB rows: user colors, z, normals[3]


def _cfg_2dgs(C, TW, TH, ts, CB, cap, N, tiles_per_step, interpret, absgrad,
              log_composite=False):
    return V2Cfg(
        C=C, tile_width=TW, tile_height=TH, tile_size=ts, channels=CB,
        cap=cap, n=N, tiles_per_step=tiles_per_step, interpret=interpret,
        absgrad=absgrad, n_attr=12 + CB, cull=False, extra_out=2,
        log_composite=log_composite,
    )


def _chunk_pair_2dgs(cfg, chunk, px, py, c, off, end):
    """2DGS per-chunk pair math in (P, K)."""
    xs, ys = chunk[_AX:_AX + 1, :], chunk[_AY:_AY + 1, :]
    m = [chunk[_AM + i:_AM + i + 1, :] for i in range(9)]
    op = chunk[_AOP:_AOP + 1, :]
    hu_x = px * m[6] - m[0]
    hu_y = px * m[7] - m[1]
    hu_z = px * m[8] - m[2]
    hv_x = py * m[6] - m[3]
    hv_y = py * m[7] - m[4]
    hv_z = py * m[8] - m[5]
    cx = hu_y * hv_z - hu_z * hv_y
    cy = hu_z * hv_x - hu_x * hv_z
    cz = hu_x * hv_y - hu_y * hv_x
    nz = cz != 0.0
    inv_cz = 1.0 / jnp.where(nz, cz, 1.0)
    su = cx * inv_cz
    sv = cy * inv_cz
    gw3d = su * su + sv * sv
    dx = xs - px
    dy = ys - py
    gw2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(gw3d, gw2d)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + c * K
    inr = (lane >= off) & (lane < end)
    alpha_raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    valid = nz & (alpha >= ALPHA_THRESHOLD) & inr
    alpha = jnp.where(valid, alpha, 0.0)
    return dict(
        alpha=alpha, valid=valid, inr=inr, clamped=alpha_raw > MAX_ALPHA,
        su=su, sv=sv, inv_cz=inv_cz, nz=nz, dx=dx, dy=dy,
        hu=(hu_x, hu_y, hu_z), hv=(hv_x, hv_y, hv_z),
        b3=gw3d <= gw2d, op=op,
    )


def _median_update(med, zk, t_prev, w):
    """Depth of the LAST composited splat with T_prev > 0.5 (2dgs_fwd.cu
    median rule). One lane per pixel matches the encoded argmax."""
    sel = (t_prev > 0.5) & (w > 0.0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + 1
    li = jnp.where(sel, lane1, 0)
    m_idx = jnp.max(li, axis=1, keepdims=True)  # (P, 1)
    zpick = jnp.sum(
        jnp.where((li == m_idx) & sel, zk, 0.0), axis=1, keepdims=True
    )
    return jnp.where(m_idx > 0, zpick, med)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel_2dgs(cfg: V2Cfg, zch, starts_ref, masks_ref, s_hbm, out_ref,
                     bufs, sems):
    P = cfg.pixels
    CB = cfg.channels
    G = cfg.tiles_per_step
    step = pl.program_id(0)
    zrow = _ACOL + zch

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
            c, t_cur, _, _, _, _ = carry
            return (c < c1) & (jnp.max(t_cur) > TRANSMITTANCE_EPS)

        def body(carry):
            c, t_cur, acc, accA, dist, med = carry
            slot = (c - c0) % NBUF
            dma(g, slot, c).wait()
            chunk = bufs[NBUF * g + slot]
            pr = _chunk_pair_2dgs(cfg, chunk, px, py, c, off, end)
            if cfg.log_composite:
                w, m_, t_prev, t_new = _composite_log(
                    pr["alpha"], t_cur, _tri_incl_bf16(), cfg.cutoff
                )
            else:
                w, m_, t_prev, t_new = _composite(
                    pr["alpha"], t_cur, cfg.cutoff
                )
            acc = acc + jax.lax.dot_general(
                w, chunk[_ACOL:_ACOL + CB, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, CB)
            zk = chunk[zrow:zrow + 1, :]
            wz = w * zk
            # P_i = 1 - T_prev,i ; A_i = carry + in-chunk exclusive prefix
            A_i = accA + _cumsum_incl_lane(wz) - wz
            dist = dist + jnp.sum(
                2.0 * (wz * (1.0 - t_prev) - w * A_i),
                axis=1, keepdims=True,
            )
            accA = accA + jnp.sum(wz, axis=1, keepdims=True)
            med = _median_update(med, zk, t_prev, w)

            @pl.when(c + NBUF < c1)
            def _():
                dma(g, slot, c + NBUF).start()

            return c + 1, t_new, acc, accA, dist, med

        c_fin, t_fin, acc, _, dist, med = jax.lax.while_loop(
            cond, body,
            (c0, jnp.ones((P, 1), jnp.float32),
             jnp.zeros((P, CB), jnp.float32),
             jnp.zeros((P, 1), jnp.float32),
             jnp.zeros((P, 1), jnp.float32),
             jnp.zeros((P, 1), jnp.float32)),
        )

        for d in range(NBUF):
            @pl.when(c_fin + d < c1)
            def _():
                dma(g, (c_fin + d - c0) % NBUF, c_fin + d).wait()

        out_ref[g, :, :CB] = acc
        out_ref[g, :, CB:CB + 1] = 1.0 - t_fin
        out_ref[g, :, CB + 1:CB + 2] = dist
        out_ref[g, :, CB + 2:CB + 3] = med


def _run_fwd_2dgs(cfg: V2Cfg, zch, S, starts_padded, masks_padded):
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
        functools.partial(_fwd_kernel_2dgs, cfg, zch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.n_steps * G, cfg.pixels, cfg.chp), jnp.float32
        ),
        interpret=cfg.interpret,
    )(starts_padded, masks_padded, S)
    return out[: cfg.n_tiles]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel_2dgs(cfg: V2Cfg, zch, starts_ref, slot_ref, masks_ref, s_hbm,
                     ct_ref, vt_ref, gbuf_in, gbuf_hbm, wbufs, bufs, sems,
                     wsems, wflag):
    del gbuf_in
    P = cfg.pixels
    CB = cfg.channels
    G = cfg.tiles_per_step
    step = pl.program_id(0)
    idrow = cfg.idrow  # == 12 + CB
    zrow = _ACOL + zch

    def dma(g, slot, c):
        return pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(c * K, K)],
            bufs.at[NBUF * g + slot],
            sems.at[NBUF * g + slot],
        )

    idr0 = (idrow // 8) * 8

    def dma_idrow(g, slot, c):
        return pltpu.make_async_copy(
            s_hbm.at[idr0:idr0 + 8, pl.ds(c * K, K)],
            bufs.at[NBUF * g + slot, idr0:idr0 + 8],
            sems.at[NBUF * g + slot],
        )

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

        v_out = vt_ref[g]  # (P, CHP)
        c_out = ct_ref[g]
        v_c = v_out[:, :CB]  # (P, CB) incl z & normal channels
        v_a = v_out[:, CB:CB + 1]
        v_d = v_out[:, CB + 1:CB + 2]  # distortion cotangent (median: none)
        t_final = 1.0 - c_out[:, CB:CB + 1]
        wz_total = c_out[:, zch:zch + 1]  # accumulated w*z (z color channel)
        dist_out = c_out[:, CB + 1:CB + 2]
        # q0 = suffix-sum seed over ALL pairs of u = w*(Gpk + Dw):
        # color part sums to <out, v_c>; the distortion part telescopes to
        # 2*v_d*dist_out (sum_k w_k Dw_k = 2 v_d * distort_total)
        q0 = (
            jnp.sum(c_out[:, :CB] * v_c, axis=1, keepdims=True)
            + 2.0 * v_d * dist_out
        )

        def wait_write(wslot):
            @pl.when(wflag[wslot] == 1)
            def _():
                pltpu.make_async_copy(
                    wbufs.at[wslot], wbufs.at[wslot], wsems.at[wslot]
                ).wait()

        def cond(carry):
            c, t_cur, _, _ = carry
            return (c < c1_full) & (jnp.max(t_cur) > TRANSMITTANCE_EPS)

        def body(carry):
            c, t_cur, q_cur, accA = carry
            rs = (c - c0) % NBUF
            dma(g, rs, c).wait()
            chunk = bufs[NBUF * g + rs]
            pr = _chunk_pair_2dgs(cfg, chunk, px, py, c, off, end)
            alpha = pr["alpha"]
            if cfg.log_composite:
                w, m_, t_prev, t_new = _composite_log(
                    alpha, t_cur, _tri_incl_bf16(), cfg.cutoff
                )
            else:
                w, m_, t_prev, t_new = _composite(alpha, t_cur, cfg.cutoff)
            zk = chunk[zrow:zrow + 1, :]
            wz = w * zk
            A_i = accA + _cumsum_incl_lane(wz) - wz  # prefix wz before k
            P_i = 1.0 - t_prev  # prefix w before k
            t_incl = t_prev * (1.0 - alpha)
            S_i = jnp.maximum(t_incl - t_final, 0.0)  # suffix w after k
            SZ_i = wz_total - A_i - wz  # suffix wz after k

            Gpk = jax.lax.dot_general(
                v_c, chunk[_ACOL:_ACOL + CB, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, K)
            Dw = 2.0 * v_d * (zk * P_i - A_i + SZ_i - zk * S_i)
            GD = Gpk + Dw
            u = w * GD
            s = q_cur - _cumsum_incl_lane(u)  # suffix after k
            oma = 1.0 - alpha
            inv_oma = 1.0 / jnp.where(oma > 0, oma, 1.0)
            v_alpha = t_prev * GD - s * inv_oma + v_a * t_final * inv_oma
            if m_ is not None:
                v_alpha = v_alpha * jnp.where(m_, 1.0, 0.0)
            dvalid = jnp.where(
                pr["valid"] & jnp.logical_not(pr["clamped"]), 1.0, 0.0
            )
            v_sig = -alpha * v_alpha * dvalid  # (P, K)

            # branch split: sigma = 0.5*min(gw3d, gw2d)
            b3 = jnp.where(pr["b3"], 1.0, 0.0)
            v_sig3 = v_sig * b3
            v_sig2 = v_sig * (1.0 - b3)

            rsum = lambda x: jnp.sum(x, axis=0, keepdims=True)  # (1, K)

            wslot = NBUF * g + rs
            wait_write(wslot)

            # 2D-filter branch -> means2d
            dx, dy = pr["dx"], pr["dy"]
            vx_pix = FILTER_INV_SQUARE * dx * v_sig2
            vy_pix = FILTER_INV_SQUARE * dy * v_sig2
            wbufs[wslot, _AX:_AX + 1, :] = rsum(vx_pix)
            wbufs[wslot, _AY:_AY + 1, :] = rsum(vy_pix)

            # 3D (UV) branch -> ray transform rows
            su, sv, inv_cz = pr["su"], pr["sv"], pr["inv_cz"]
            v_su = su * v_sig3
            v_sv = sv * v_sig3
            nzm = jnp.where(pr["nz"], 1.0, 0.0)
            v_cx = v_su * inv_cz * nzm
            v_cy = v_sv * inv_cz * nzm
            v_cz = -(su * v_su + sv * v_sv) * inv_cz * nzm
            hu_x, hu_y, hu_z = pr["hu"]
            hv_x, hv_y, hv_z = pr["hv"]
            v_hu = (
                hv_y * v_cz - hv_z * v_cy,
                hv_z * v_cx - hv_x * v_cz,
                hv_x * v_cy - hv_y * v_cx,
            )
            v_hv = (
                v_cy * hu_z - v_cz * hu_y,
                v_cz * hu_x - v_cx * hu_z,
                v_cx * hu_y - v_cy * hu_x,
            )
            for ccomp in range(3):
                wbufs[wslot, _AM + ccomp:_AM + ccomp + 1, :] = rsum(
                    -v_hu[ccomp]
                )
                wbufs[wslot, _AM + 3 + ccomp:_AM + 4 + ccomp, :] = rsum(
                    -v_hv[ccomp]
                )
                wbufs[wslot, _AM + 6 + ccomp:_AM + 7 + ccomp, :] = rsum(
                    px * v_hu[ccomp] + py * v_hv[ccomp]
                )

            wbufs[wslot, _AOP:_AOP + 1, :] = jnp.where(
                pr["op"] > 0.0,
                -rsum(v_sig) / jnp.where(pr["op"] > 0.0, pr["op"], 1.0),
                0.0,
            )
            # v_color[ch, k] = sum_p w * v_c,ch ; z channel gets the
            # distortion z-chain extra 2 v_d w (P - S)
            vcol = jax.lax.dot_general(
                v_c, w, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CB, K)
            wbufs[wslot, _ACOL:_ACOL + CB, :] = vcol
            wbufs[wslot, _ACOL + zch:_ACOL + zch + 1, :] = (
                vcol[zch:zch + 1, :]
                + rsum(2.0 * v_d * w * (P_i - S_i))
            )
            wbufs[wslot, idrow:idrow + 1, :] = jnp.where(
                pr["inr"], chunk[idrow:idrow + 1, :], PAD_ID
            )
            if cfg.absgrad:
                wbufs[wslot, idrow + 1:idrow + 2, :] = rsum(jnp.abs(vx_pix))
                wbufs[wslot, idrow + 2:idrow + 3, :] = rsum(jnp.abs(vy_pix))

            slot = slot0 + (c - c0)
            pltpu.make_async_copy(
                wbufs.at[wslot], gbuf_hbm.at[:, pl.ds(slot * K, K)],
                wsems.at[wslot],
            ).start()
            wflag[wslot] = 1

            @pl.when(c + NBUF < c1_full)
            def _():
                dma(g, rs, c + NBUF).start()

            q_new = q_cur - jnp.sum(u, axis=1, keepdims=True)
            accA_new = accA + jnp.sum(wz, axis=1, keepdims=True)
            return c + 1, t_new, q_new, accA_new

        start_c = jnp.where(enabled, c0, c1)
        c_fin, _, _, _ = jax.lax.while_loop(
            cond, body,
            (start_c, jnp.ones((P, 1), jnp.float32), q0,
             jnp.zeros((P, 1), jnp.float32)),
        )

        for d in range(NBUF):
            @pl.when(c_fin + d < c1_full)
            def _():
                dma(g, (c_fin + d - c0) % NBUF, c_fin + d).wait()

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
            wbufs[wslot, 0:idrow, :] = jnp.zeros((idrow, K), jnp.float32)
            wbufs[wslot, idrow:idrow + 1, :] = jnp.where(inr, ids, PAD_ID)
            if cfg.absgrad:
                wbufs[wslot, idrow + 1:idrow + 3, :] = jnp.zeros(
                    (2, K), jnp.float32
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

    for ws in range(NBUF * G):
        @pl.when(wflag[ws] == 1)
        def _():
            pltpu.make_async_copy(
                wbufs.at[ws], wbufs.at[ws], wsems.at[ws]
            ).wait()


def _run_bwd_2dgs(cfg: V2Cfg, zch, S, starts_padded, slot_base, masks_padded,
                  ct, vt, gbuf_init):
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
            tb(),  # ct
            tb(),  # vt
            pl.BlockSpec(memory_space=pl.ANY),  # gbuf (aliased)
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
        functools.partial(_bwd_kernel_2dgs, cfg, zch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.d_g, cfg.slot_cap * K), jnp.float32
        ),
        input_output_aliases={6: 0},
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts_padded, slot_base, masks_padded, S, ct, vt, gbuf_init)


# ---------------------------------------------------------------------------
# custom-vjp core
# ---------------------------------------------------------------------------


def _build_sorted_2dgs(cfg, zch, means2d, transforms, colors, opacities,
                       depths, radii):
    C, N = cfg.C, cfg.n
    M = C * N
    CB = cfg.channels
    tr = transforms.reshape(M, 9)
    attr_rows = [
        means2d.reshape(M, 2)[:, 0].astype(jnp.float32),
        means2d.reshape(M, 2)[:, 1].astype(jnp.float32),
    ] + [tr[:, i].astype(jnp.float32) for i in range(9)] + [
        opacities.reshape(M).astype(jnp.float32),
    ] + [
        colors.reshape(M, CB)[:, i].astype(jnp.float32) for i in range(CB)
    ]
    return _build_sorted_generic(cfg, means2d, attr_rows, depths, radii)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _raster_core_2dgs(cfg, zch, means2d, transforms, colors, opacities,
                      depths, radii, masks, ag_probe):
    out, _ = _raster_core_2dgs_fwd(
        cfg, zch, means2d, transforms, colors, opacities, depths, radii,
        masks, ag_probe,
    )
    return out


def _raster_core_2dgs_fwd(cfg, zch, means2d, transforms, colors, opacities,
                          depths, radii, masks, ag_probe):
    del ag_probe
    S, starts, aux = _build_sorted_2dgs(
        cfg, zch, means2d, transforms, colors, opacities, depths, radii
    )
    sp = _starts_padded(cfg, starts)
    mp = _masks_padded(cfg, masks)
    tiles_out = _run_fwd_2dgs(cfg, zch, S, sp, mp)
    res = (S, starts, tiles_out, aux, mp, masks.shape)
    return (tiles_out, aux["n_isects"]), res


def _raster_core_2dgs_bwd(cfg, zch, res, cot):
    S, starts, tiles_out, aux, mp, mask_shape = res
    vt, _ = cot
    vt = vt.astype(jnp.float32)
    CB = cfg.channels

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

    idrow = cfg.idrow
    gbuf_init = jnp.zeros((cfg.d_g, cfg.slot_cap * K), jnp.float32)
    gbuf_init = gbuf_init.at[idrow].set(PAD_ID)

    pad_tiles = cfg.n_steps * cfg.tiles_per_step - cfg.n_tiles
    padt = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad_tiles,) + x.shape[1:], x.dtype)]
    ) if pad_tiles else x

    gbuf = _run_bwd_2dgs(
        cfg, zch, S, sp, slot_base, mp, padt(tiles_out), padt(vt), gbuf_init
    )
    v_flat, absg = _reduce_grads(cfg, gbuf, aux)

    C, N = cfg.C, cfg.n
    v_means2d = v_flat[:, _AX:_AX + 2].reshape(C, N, 2)
    v_transforms = v_flat[:, _AM:_AM + 9].reshape(C, N, 3, 3)
    v_opac = v_flat[:, _AOP].reshape(C, N)
    v_colors = v_flat[:, _ACOL:_ACOL + CB].reshape(C, N, CB)
    v_ag = (
        absg.reshape(C, N, 2) if absg is not None
        else jnp.zeros((C, N, 2), jnp.float32)
    )
    return (
        v_means2d, v_transforms, v_colors, v_opac,
        jnp.zeros((C, N), jnp.float32),  # depths (sort key, nondiff)
        np.zeros((C, N), jax.dtypes.float0),  # radii
        np.zeros(mask_shape, jax.dtypes.float0),  # masks
        v_ag,
    )


_raster_core_2dgs.defvjp(_raster_core_2dgs_fwd, _raster_core_2dgs_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels_2dgs_v2(
    means2d: jnp.ndarray,  # [C, N, 2]
    ray_transforms: jnp.ndarray,  # [C, N, 3, 3]
    colors: jnp.ndarray,  # [C, N, ch] (LAST channel must be depth when
    #                       distortion/median are consumed)
    opacities: jnp.ndarray,  # [C, N]
    normals: jnp.ndarray,  # [C, N, 3]
    depths: jnp.ndarray,  # [C, N] (sort key)
    radii: jnp.ndarray,  # [C, N] int32
    width: int,
    height: int,
    tile_size: int = 16,
    isect_capacity: int = 1 << 20,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, ch]
    masks: Optional[jnp.ndarray] = None,  # [C, TH, TW]
    tiles_per_step: int = 4,
    interpret: Optional[bool] = None,
    absgrad_probe: Optional[jnp.ndarray] = None,
    log_composite: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           dict]:
    """Differentiable fused 2DGS rasterization.

    Returns (colors [C,H,W,ch], alphas [C,H,W,1], normals [C,H,W,3],
    distort [C,H,W,1], median [C,H,W,1], meta). Median depth carries no
    gradient (argmax-like pick, matching the reference backward).
    """
    C, N, CH = colors.shape
    zch = CH - 1  # depth rides as the last user channel
    CB = CH + 3
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    if interpret is None:
        interpret = not _supports_mosaic()
    blk = EXPAND_B * EXPAND_SB
    cap = ((isect_capacity + blk - 1) // blk) * blk
    cfg = _cfg_2dgs(C, TW, TH, tile_size, CB, cap, N, tiles_per_step,
                    interpret, absgrad_probe is not None,
                    log_composite=log_composite)
    if masks is not None:
        masks_arr = masks.reshape(C * TH * TW).astype(jnp.int32)
    else:
        masks_arr = jnp.zeros((0,), jnp.int32)
    if absgrad_probe is None:
        absgrad_probe = jnp.zeros((C, N, 2), jnp.float32)
    colors_full = jnp.concatenate(
        [colors.astype(jnp.float32), normals.astype(jnp.float32)], axis=-1
    )
    (tiles_out, n_isects) = _raster_core_2dgs(
        cfg, zch, means2d.astype(jnp.float32),
        ray_transforms.astype(jnp.float32), colors_full,
        opacities.astype(jnp.float32), depths.astype(jnp.float32), radii,
        masks_arr, absgrad_probe,
    )

    ts = tile_size
    img = tiles_out.reshape(C, TH, TW, ts, ts, cfg.chp)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
        C, TH * ts, TW * ts, cfg.chp
    )[:, :height, :width, :]
    colors_img = img[..., :CH]
    normals_img = img[..., CH:CH + 3]
    alphas = img[..., CB:CB + 1]
    distort = img[..., CB + 1:CB + 2]
    median = jax.lax.stop_gradient(img[..., CB + 2:CB + 3])
    if backgrounds is not None:
        colors_img = colors_img + (1.0 - alphas) * backgrounds[:, None, None, :]
    meta = {"n_isects": n_isects, "tile_width": TW, "tile_height": TH}
    return colors_img, alphas, normals_img, distort, median, meta
