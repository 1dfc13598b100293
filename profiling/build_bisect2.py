"""Bisect the CURRENT (v2/v3) _build_sorted_generic at bench scale.

Stages measured independently on real data:
  1. pre: tile_counts + keys + elementwise
  2. compact sort (full 14 operands)
  3. cumsum(counts) [1-D, M]
  4. pack_rows table [d_t, M_pad]
  5. searchsorted g0s
  6. expansion kernel
  7. tile sort (stable, cap rows, 11 operands)
  8. pack_rows S [d_s, cap]
  9. searchsorted starts
"""

import os
import sys
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from profiling.v2_bench import baseline_scene
    from gscodec_studio_tpu.ops.projection import fully_fused_projection
    from gscodec_studio_tpu.ops import raster_v2 as rv
    from gscodec_studio_tpu.utils.profiling import honest_timer

    ts, g_t = 16, 4
    width, height = 1920, 1080
    cap = 6 << 20
    TW, TH = -(-width // ts), -(-height // ts)

    mg, quats, scales, opac, cg, viewmat, Kmat = baseline_scene(width, height)
    args = tuple(map(jnp.asarray, (mg, quats, scales, opac, cg, viewmat, Kmat)))
    means, quats, scales, opac, colors, viewmats, Ks = args
    C, N = 1, means.shape[0]
    M = C * N

    cfg = rv.V2Cfg(C=C, tile_width=TW, tile_height=TH, tile_size=ts,
                   channels=3, cap=cap, n=N, tiles_per_step=g_t,
                   interpret=False, absgrad=False)

    radii, means2d, depths, conics, comps = jax.jit(
        functools.partial(fully_fused_projection, width=width, height=height)
    )(means, None, quats, scales, viewmats, Ks)
    colors_c = jnp.broadcast_to(colors[None], (C,) + colors.shape)
    opac_c = jnp.broadcast_to(opac[None], (C, N))

    s_ = lambda x, c: jnp.sum(x.astype(jnp.float32)) * 1e-20 + c

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:40s} {per*1e3:8.2f} ms", flush=True)
        return per

    CH = cfg.channels

    def attr_rows_of(means2d, conics, colors_c, opac_c):
        return [
            means2d.reshape(M, 2)[:, 0].astype(jnp.float32),
            means2d.reshape(M, 2)[:, 1].astype(jnp.float32),
            conics.reshape(M, 3)[:, 0].astype(jnp.float32),
            conics.reshape(M, 3)[:, 1].astype(jnp.float32),
            conics.reshape(M, 3)[:, 2].astype(jnp.float32),
            opac_c.reshape(M).astype(jnp.float32),
        ] + [colors_c.reshape(M, CH)[:, i].astype(jnp.float32)
             for i in range(CH)]

    # stage 1: elementwise pre
    def pre(c, means2d, conics, colors_c, opac_c, depths, radii):
        x0, y0, nx, counts = rv.tile_counts(means2d + c * 0.0, radii, ts, TW, TH)
        counts = counts.reshape(M)
        visible = counts > 0
        depth_key = jnp.where(visible, depths.reshape(M), jnp.inf).astype(
            jnp.float32)
        cam = jnp.arange(C, dtype=jnp.int32)[:, None]
        base = (cam * (TW * TH) + y0 * TW + x0).reshape(M).astype(jnp.float32)
        rows = attr_rows_of(means2d, conics, colors_c, opac_c)
        return s_(depth_key, c) + s_(base, 0.0) + sum(s_(r, 0.0) for r in rows)

    t("1 pre elementwise", pre,
      (means2d, conics, colors_c, opac_c, depths, radii))

    # build real sort operands once
    x0, y0, nx, counts = rv.tile_counts(means2d, radii, ts, TW, TH)
    counts = counts.reshape(M)
    depth_key = jnp.where(counts > 0, depths.reshape(M), jnp.inf).astype(
        jnp.float32)
    base = (y0 * TW + x0).reshape(M).astype(jnp.float32)
    origid = jnp.arange(M, dtype=jnp.float32)
    attr_rows = attr_rows_of(means2d, conics, colors_c, opac_c)
    ops14 = (depth_key, counts.astype(jnp.float32), base,
             jnp.maximum(nx.reshape(M), 1).astype(jnp.float32),
             ) + tuple(attr_rows) + (origid,)

    # stage 2: compact sort, 14 operands
    def csort(c, *ops):
        so = jax.lax.sort((ops[0] + c * 0.0,) + ops[1:], num_keys=1,
                          is_stable=False)
        return s_(so[1], c)

    t("2 compact sort (14 ops, M rows)", csort, ops14)

    so = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False))(*ops14)
    counts_s = so[1]

    # stage 3: cumsum over M
    def cs(c, counts_s):
        return s_(jnp.cumsum((counts_s + c * 0.0).astype(jnp.int32)), c)

    t("3 cumsum counts (1-D, M)", cs, (counts_s,))

    cum_i32 = jnp.cumsum(counts_s.astype(jnp.int32))
    total = cum_i32[-1]
    n_isects = jnp.minimum(total, cap)

    # stage 4: pack table
    M_pad = ((M + rv.EXPAND_BW + 4095) // 4096) * 4096
    padv = lambda a, v: jnp.concatenate(
        [a, jnp.full((M_pad - M,), v, jnp.float32)])
    rows = [
        padv(cum_i32.astype(jnp.float32), 3.0e7),
        padv(counts_s, 0.0),
        padv(so[2], 0.0),
        padv(so[3], 1.0),
        padv(jnp.arange(M, dtype=jnp.float32), 0.0),
    ] + [padv(so[4 + i], 0.0) for i in range(cfg.n_attr_eff)]

    def packt(c, *rows):
        return s_(rv.pack_rows([rows[0] + c * 0.0] + list(rows[1:]),
                               cfg.d_t, cfg.interpret), c)

    t("4 pack table rows", packt, tuple(rows))
    table_T = rv.pack_rows(rows, cfg.d_t, cfg.interpret)

    # stage 5: searchsorted g0s
    def ss(c, cum_i32):
        g0s = jnp.searchsorted(
            cum_i32 + jnp.int32(c), jnp.arange(0, cap, rv.EXPAND_B,
                                               dtype=jnp.int32),
            side="right").astype(jnp.int32)
        return s_(g0s, c)

    t("5 searchsorted g0s", ss, (cum_i32,))
    g0s = jnp.searchsorted(
        cum_i32, jnp.arange(0, cap, rv.EXPAND_B, dtype=jnp.int32),
        side="right").astype(jnp.int32)
    g0blk = jnp.minimum(g0s // 128, (M_pad - rv.EXPAND_BW) // 128)

    # stage 6: expansion
    def exp_(c, table_T, g0blk):
        tile, idf, attrs = rv._run_expand(cfg, table_T + c * 0.0, g0blk,
                                          n_isects.reshape(1))
        return s_(tile, c) + s_(idf, 0.0)

    t("6 expansion kernel", exp_, (table_T, g0blk))

    tile, idf, attrs = jax.jit(
        lambda t_, g: rv._run_expand(cfg, t_, g, n_isects.reshape(1))
    )(table_T, g0blk)

    # stage 7: tile sort (stable, 11 operands over cap)
    def tsort(c, tile, idf, *attrs):
        so2 = jax.lax.sort(
            (tile + jnp.int32(c),) + attrs + (idf,), num_keys=1,
            is_stable=True)
        return s_(so2[1], c)

    t("7 tile sort (stable, cap rows)", tsort, (tile, idf) + tuple(attrs))

    # 7b: same but unstable
    def tsortu(c, tile, idf, *attrs):
        so2 = jax.lax.sort(
            (tile + jnp.int32(c), idf) + attrs, num_keys=2,
            is_stable=False)
        return s_(so2[2], c)

    t("7b tile sort (2-key unstable)", tsortu, (tile, idf) + tuple(attrs))

    so2 = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True))(
        *((tile,) + tuple(attrs) + (idf,)))

    # stage 8: pack S
    def packs(c, *rows):
        return s_(rv.pack_rows([rows[0] + c * 0.0] + list(rows[1:]),
                               cfg.d_s, cfg.interpret), c)

    t("8 pack S rows", packs, tuple(so2[1:]))

    # stage 9: searchsorted starts
    def ss2(c, tile_sorted):
        starts = jnp.searchsorted(
            tile_sorted + jnp.int32(c),
            jnp.arange(cfg.n_tiles_v + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        return s_(starts, c)

    t("9 searchsorted starts", ss2, (so2[0],))


if __name__ == "__main__":
    main()
