"""Stages 8/9 + composed-build delta: where do the extra ~67 ms hide?"""

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
        print(f"{name:44s} {per*1e3:8.2f} ms", flush=True)
        return per

    # Recreate tile-sorted operands (post-expansion)
    def upto_expand(means2d, conics, colors_c, opac_c, depths, radii):
        CH = cfg.channels
        attr_rows = [
            means2d.reshape(M, 2)[:, 0], means2d.reshape(M, 2)[:, 1],
            conics.reshape(M, 3)[:, 0], conics.reshape(M, 3)[:, 1],
            conics.reshape(M, 3)[:, 2], opac_c.reshape(M),
        ] + [colors_c.reshape(M, CH)[:, i] for i in range(CH)]
        attr_rows = [a.astype(jnp.float32) for a in attr_rows]
        x0, y0, nx, counts = rv.tile_counts(means2d, radii, ts, TW, TH)
        counts = counts.reshape(M)
        depth_key = jnp.where(counts > 0, depths.reshape(M),
                              jnp.inf).astype(jnp.float32)
        base = (y0 * TW + x0).reshape(M).astype(jnp.float32)
        origid = jnp.arange(M, dtype=jnp.float32)
        ops = (depth_key, counts.astype(jnp.float32), base,
               jnp.maximum(nx.reshape(M), 1).astype(jnp.float32),
               ) + tuple(attr_rows) + (origid,)
        so = jax.lax.sort(ops, num_keys=1, is_stable=False)
        counts_s = so[1]
        cum_i32 = jnp.cumsum(counts_s.astype(jnp.int32))
        n_isects = jnp.minimum(cum_i32[-1], cap)
        M_pad = ((M + rv.EXPAND_BW + 4095) // 4096) * 4096
        padv = lambda a, v: jnp.concatenate(
            [a, jnp.full((M_pad - M,), v, jnp.float32)])
        rows = [padv(cum_i32.astype(jnp.float32), 3.0e7), padv(counts_s, 0.0),
                padv(so[2], 0.0), padv(so[3], 1.0),
                padv(jnp.arange(M, dtype=jnp.float32), 0.0),
                ] + [padv(so[4 + i], 0.0) for i in range(cfg.n_attr_eff)]
        table_T = rv.pack_rows(rows, cfg.d_t, cfg.interpret)
        g0s = jnp.searchsorted(cum_i32, jnp.arange(0, cap, rv.EXPAND_B,
                                                   dtype=jnp.int32),
                               side="right").astype(jnp.int32)
        g0blk = jnp.minimum(g0s // 128, (M_pad - rv.EXPAND_BW) // 128)
        tile, idf, attrs = rv._run_expand(cfg, table_T, g0blk,
                                          n_isects.reshape(1))
        return tile, idf, attrs

    tile, idf, attrs = jax.jit(upto_expand)(
        means2d, conics, colors_c, opac_c, depths, radii)
    so2 = jax.jit(
        lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True)
    )(*((tile,) + tuple(attrs) + (idf,)))

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

    # stage 7+8+9 composed (sort feeding pack: relayout interaction?)
    def s789(c, tile, idf, *attrs):
        so2 = jax.lax.sort((tile + jnp.int32(c),) + attrs + (idf,),
                           num_keys=1, is_stable=True)
        S = rv.pack_rows(list(so2[1:]), cfg.d_s, cfg.interpret)
        starts = jnp.searchsorted(
            so2[0], jnp.arange(cfg.n_tiles_v + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        return s_(S, c) + s_(starts, 0.0)

    t("7+8+9 composed", s789, (tile, idf) + tuple(attrs))

    # expansion + 7+8+9 composed
    def e789(c, means2d, conics, colors_c, opac_c, depths, radii):
        tile, idf, attrs = upto_expand(means2d + c * 0.0, conics, colors_c,
                                       opac_c, depths, radii)
        so2 = jax.lax.sort((tile,) + tuple(attrs) + (idf,),
                           num_keys=1, is_stable=True)
        S = rv.pack_rows(list(so2[1:]), cfg.d_s, cfg.interpret)
        starts = jnp.searchsorted(
            so2[0], jnp.arange(cfg.n_tiles_v + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        return s_(S, c) + s_(starts, 0.0)

    t("full composed (upto_expand+789)", e789,
      (means2d, conics, colors_c, opac_c, depths, radii))

    # the library build for comparison
    def build(c, means2d, conics, colors_c, opac_c, depths, radii):
        S, starts, aux = rv._build_sorted(
            cfg, means2d + c * 0.0, conics, colors_c, opac_c, depths, radii)
        return s_(S, c) + s_(starts, 0.0)

    t("library _build_sorted", build,
      (means2d, conics, colors_c, opac_c, depths, radii))


if __name__ == "__main__":
    main()
