"""Per-stage timing of the rasterization pipeline at bench scale, plus
primitive microbenchmarks (sort/gather/scatter rates) to guide the round-2
perf redesign. Run on the real chip.

Usage: python profiling/stage_profile.py [--quick]
"""

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_scene
    from gscodec_studio_tpu.ops.projection import fully_fused_projection
    from gscodec_studio_tpu.ops.sh import spherical_harmonics
    from gscodec_studio_tpu.ops import isect as isect_mod
    from gscodec_studio_tpu.ops import rasterize_pallas as rp
    from gscodec_studio_tpu.utils.profiling import honest_timer

    width, height = 1297, 840
    cap = 5 << 20
    means, quats, scales, opacities, colors, viewmats, Ks = make_scene(
        width=width, height=height
    )
    C, N = 1, means.shape[0]
    ts = 16
    TW, TH = -(-width // ts), -(-height // ts)

    def t(name, body, args):
        per = honest_timer(body, args, K=8, repeats=2)
        print(f"{name:34s} {per*1e3:8.2f} ms")
        return per

    # ---- stage inputs (computed once, passed as args) ----
    @jax.jit
    def stage_proj(means, quats, scales, viewmats, Ks):
        return fully_fused_projection(
            means, None, quats, scales, viewmats, Ks, width, height
        )

    radii, means2d, depths, conics, comps = stage_proj(
        means, quats, scales, viewmats, Ks
    )
    radii = jnp.where(opacities[None, :] >= 1.0 / 255.0, radii, 0)

    @jax.jit
    def stage_isect(means2d, radii, depths):
        return isect_mod.isect_tiles(
            means2d, radii, depths, ts, TW, TH, cap, need_inv_perm=False
        )

    isect = stage_isect(means2d, radii, depths)
    print("n_isects:", int(isect.n_isects))

    @jax.jit
    def stage_align(isect):
        return isect_mod.align_isects(isect, C, TW, TH, rp.K_CHUNK, False)

    aligned = stage_align(isect)
    cap2 = aligned.ids.shape[0]
    print("cap2:", cap2, "chunks:", cap2 // rp.K_CHUNK)

    # flat attrs
    CH = 3
    cam_pos = -jnp.einsum("cij,cj->ci", viewmats[:, :3, :3], viewmats[:, :3, 3])
    dirs = means[None] - cam_pos[:, None, :]
    cols = spherical_harmonics(3, dirs, jnp.broadcast_to(colors[None], (C,) + colors.shape))
    cols = jnp.clip(cols + 0.5, 0.0, None)
    flat_attrs = jnp.concatenate(
        [
            means2d.reshape(C * N, 2),
            conics.reshape(C * N, 3),
            opacities[None].reshape(C * N, 1) * jnp.ones((C * N, 1)),
            cols.reshape(C * N, CH),
        ],
        axis=-1,
    ).astype(jnp.float32)

    cfg = rp.RasterCfg(
        C=C, tile_width=TW, tile_height=TH, tile_size=ts, channels=CH,
        cap=cap, cap2=cap2, interpret=False, m=C * N,
    )
    chunk_tile = rp._chunk_tile_map(cfg, aligned.starts, aligned.ends)
    packed = rp._pack(cfg, flat_attrs, aligned.ids)
    starts_p = rp._pad_scalar(aligned.starts)
    ends_p = rp._pad_scalar(aligned.ends)
    tile_colors, tile_alphas = rp._run_fwd(cfg, packed, chunk_tile, starts_p, ends_p)
    v_tc = jnp.ones_like(tile_colors[: cfg.n_tiles])
    v_ta = jnp.ones_like(tile_alphas[: cfg.n_tiles])

    quick = "--quick" in sys.argv

    # ---- stage timings ----
    def b_proj(c, means, quats, scales, viewmats, Ks):
        r = stage_proj(means + c, quats, scales, viewmats, Ks)
        return jnp.sum(r[1]) * 1e-20 + 1e-12

    t("projection fwd", b_proj, (means, quats, scales, viewmats, Ks))

    def b_sh(c, means, colors, cam_pos):
        dirs = means[None] - cam_pos[:, None, :] + c
        cols = spherical_harmonics(3, dirs, jnp.broadcast_to(colors[None], (C,) + colors.shape))
        return jnp.sum(cols) * 1e-20 + 1e-12

    t("SH eval (deg 3)", b_sh, (means, colors, cam_pos))

    def b_isect(c, means2d, radii, depths):
        i = stage_isect(means2d + c, radii, depths)
        return jnp.sum(i.tile_keys) * 1e-20 + 1e-12

    t("isect_tiles (expand+sort)", b_isect, (means2d, radii, depths))

    # expansion only (no sort)
    def b_expand(c, means2d, radii, depths):
        C_, N_ = radii.shape
        tm = (means2d + c) / ts
        tr = radii.astype(means2d.dtype) / ts
        tile_min_x = jnp.clip(jnp.floor(tm[..., 0] - tr), 0, TW).astype(jnp.int32)
        tile_min_y = jnp.clip(jnp.floor(tm[..., 1] - tr), 0, TH).astype(jnp.int32)
        tile_max_x = jnp.clip(jnp.ceil(tm[..., 0] + tr), 0, TW).astype(jnp.int32)
        tile_max_y = jnp.clip(jnp.ceil(tm[..., 1] + tr), 0, TH).astype(jnp.int32)
        nx = tile_max_x - tile_min_x
        ny = tile_max_y - tile_min_y
        tpg = jnp.where(radii > 0, nx * ny, 0)
        counts = tpg.reshape(-1)
        cum = jnp.cumsum(counts)
        offsets = cum - counts
        depth_bits = jax.lax.bitcast_convert_type(depths.reshape(-1), jnp.int32)
        base_key = (tile_min_y * TW + tile_min_x).reshape(-1)
        table = jnp.stack([offsets, nx.reshape(-1), base_key, depth_bits], -1)
        src = jnp.repeat(jnp.arange(C_ * N_, dtype=jnp.int32), counts,
                         total_repeat_length=cap)
        g = jnp.take(table, src, axis=0)
        return jnp.sum(g) * 1e-20 + 1e-12

    t("  expansion only (repeat+gather)", b_expand, (means2d, radii, depths))

    def b_align(c, isect):
        a = stage_align(isect)
        return jnp.sum(a.ids) * 1e-20 + c * 0 + 1e-12

    t("align_isects (scatter relayout)", b_align, (isect,))

    def b_pack(c, flat_attrs, ids):
        p = rp._pack(cfg, flat_attrs + c, ids)
        return jnp.sum(p) * 1e-20 + 1e-12

    t("pack gather [cap2,9]", b_pack, (flat_attrs, aligned.ids))

    def b_fwd(c, packed, chunk_tile, starts_p, ends_p):
        tc, ta = rp._run_fwd(cfg, packed + c, chunk_tile, starts_p, ends_p)
        return jnp.sum(tc) * 1e-20 + 1e-12

    t("fwd kernel", b_fwd, (packed, chunk_tile, starts_p, ends_p))

    def b_bwd(c, packed, chunk_tile, starts_p, ends_p, tc, ta, vtc, vta):
        pad = lambda x: jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], 0)
        vp = rp._run_bwd(cfg, packed + c, chunk_tile, starts_p, ends_p,
                         pad(tc), pad(ta), pad(vtc), pad(vta))
        return jnp.sum(vp) * 1e-20 + 1e-12

    t("bwd kernel", b_bwd, (packed, chunk_tile, starts_p, ends_p,
                            tile_colors[: cfg.n_tiles], tile_alphas[: cfg.n_tiles],
                            v_tc, v_ta))

    v_packed = jnp.ones((cap2, cfg.d), jnp.float32)

    def b_segred(c, v_packed, ids, exp_offsets):
        M = cfg.m
        idsx = jnp.where(ids >= 0, ids, M)
        cols_ = tuple(v_packed[:, i] + c * 0 for i in range(v_packed.shape[1]))
        sorted_all = jax.lax.sort((idsx,) + cols_, num_keys=1)
        v_sorted = jnp.stack(sorted_all[1:], axis=-1)
        csum = jnp.concatenate(
            [jnp.zeros((1, v_sorted.shape[1]), v_sorted.dtype),
             jnp.cumsum(v_sorted, axis=0)], 0)
        v_flat = jnp.take(csum, exp_offsets[1:], axis=0) - jnp.take(
            csum, exp_offsets[:-1], axis=0)
        return jnp.sum(v_flat) * 1e-20 + 1e-12

    t("VJP segred (sort mode)", b_segred, (v_packed, aligned.ids, isect.exp_offsets))

    if quick:
        return

    # ---- primitive microbenchmarks ----
    print("\n-- primitives --")
    rng = np.random.default_rng(0)
    M5 = 5 << 20

    k1 = jnp.asarray(rng.integers(0, 4346, M5, dtype=np.int32))
    k2 = jnp.asarray(rng.integers(0, 1 << 30, M5, dtype=np.int32))
    p1 = jnp.asarray(rng.integers(0, 1 << 30, M5, dtype=np.int32))

    def b_sort2k1p(c, k1, k2, p1):
        r = jax.lax.sort((k1 + (c * 0).astype(jnp.int32), k2, p1), num_keys=2)
        return jnp.sum(r[0]) * 1e-20 + 1e-12

    per = t("sort 5M x (2 keys,1 payload)", b_sort2k1p, (k1, k2, p1))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    def b_sort1k1p(c, k2, p1):
        r = jax.lax.sort((k2 + (c * 0).astype(jnp.int32), p1), num_keys=1)
        return jnp.sum(r[0]) * 1e-20 + 1e-12

    per = t("sort 5M x (1 key,1 payload)", b_sort1k1p, (k2, p1))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    # single fused key (int32) sort
    key64 = (k1.astype(jnp.int64) << 32) | k2.astype(jnp.int64)
    def b_sort64(c, key64, p1):
        r = jax.lax.sort((key64 + (c * 0).astype(jnp.int64), p1), num_keys=1)
        return jnp.sum(r[1]) * 1e-20 + 1e-12

    per = t("sort 5M x (1 i64 key,1 payload)", b_sort64, (key64, p1))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    # gathers
    tbl = jnp.asarray(rng.standard_normal((N + 1, 9)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, M5, dtype=np.int32))

    def b_gather9(c, tbl, idx):
        g = jnp.take(tbl + c, idx, axis=0)
        return jnp.sum(g) * 1e-20 + 1e-12

    per = t("gather 5M rows of [N,9] f32", b_gather9, (tbl, idx))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    idx_sorted = jnp.sort(idx)
    per = t("gather 5M sorted rows of [N,9]", b_gather9, (tbl, idx_sorted))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    tbl1 = tbl[:, 0]
    def b_gather1(c, tbl1, idx):
        g = jnp.take(tbl1 + c, idx)
        return jnp.sum(g) * 1e-20 + 1e-12

    per = t("gather 5M scalars of [N] f32", b_gather1, (tbl1, idx))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    # scatter-set permutation
    perm = jnp.asarray(rng.permutation(M5).astype(np.int32))
    val = jnp.asarray(rng.standard_normal(M5).astype(np.float32))

    def b_scatter(c, perm, val):
        out = jnp.zeros((M5,), jnp.float32).at[perm].set(val + c, unique_indices=True)
        return jnp.sum(out) * 1e-20 + 1e-12

    per = t("scatter-set 5M f32 (perm)", b_scatter, (perm, val))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    # cumsum
    def b_cumsum(c, val):
        return jnp.sum(jnp.cumsum(val + c)) * 1e-20 + 1e-12

    per = t("cumsum 5M f32", b_cumsum, (val,))
    print(f"    = {per/M5*1e9:.2f} ns/row")

    big = jnp.asarray(rng.standard_normal((M5, 9)).astype(np.float32))
    def b_cumsum9(c, big):
        return jnp.sum(jnp.cumsum(big + c, axis=0)) * 1e-20 + 1e-12

    per = t("cumsum 5Mx9 f32 axis0", b_cumsum9, (big,))
    print(f"    = {per/M5*1e9:.2f} ns/row")


if __name__ == "__main__":
    main()
