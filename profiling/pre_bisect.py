"""Bisect the expansion 'pre' stage: table build vs repeat vs take vs keys."""

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

    ts = 16
    width, height = 1920, 1080
    cap = 6 << 20
    TW, TH = -(-width // ts), -(-height // ts)

    mg, quats, scales, opac, cg, viewmat, Kmat = baseline_scene(width, height)
    args = tuple(map(jnp.asarray, (mg, quats, scales, opac, cg, viewmat, Kmat)))
    means, quats, scales, opac, colors, viewmats, Ks = args
    C, N = 1, means.shape[0]
    M = C * N

    radii, means2d, depths, conics, comps = jax.jit(
        functools.partial(fully_fused_projection, width=width, height=height)
    )(means, None, quats, scales, viewmats, Ks)
    colors_c = jnp.broadcast_to(colors[None], (C,) + colors.shape)
    opac_c = jnp.broadcast_to(opac[None], (C, N))

    shi = lambda c: jnp.minimum(c, 0.0).astype(jnp.int32)
    s_ = lambda x, c: jnp.sum(x).astype(jnp.float32) * 1e-20 + c

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:44s} {per*1e3:8.2f} ms")
        return per

    def mktable(means2d, conics, colors_c, opac_c, depths, radii):
        x0, y0, nx, counts = rv.tile_counts(means2d, radii, ts, TW, TH)
        counts = counts.reshape(M)
        cum = jnp.cumsum(counts)
        cum_excl = (cum - counts).astype(jnp.float32)
        cam = jnp.arange(C, dtype=jnp.int32)[:, None]
        base = (cam * (TW * TH) + y0 * TW + x0).reshape(M).astype(jnp.float32)
        gid = jnp.arange(M, dtype=jnp.float32)
        table = jnp.concatenate(
            [cum_excl[:, None], base[:, None],
             jnp.maximum(nx.reshape(M), 1)[:, None].astype(jnp.float32),
             depths.reshape(M, 1).astype(jnp.float32),
             means2d.reshape(M, 2).astype(jnp.float32),
             conics.reshape(M, 3).astype(jnp.float32),
             opac_c.reshape(M, 1).astype(jnp.float32),
             colors_c.reshape(M, 3).astype(jnp.float32),
             gid[:, None]], axis=-1)
        return table, counts, cum

    # 1: table build only
    def t1(c, means2d, conics, colors_c, opac_c, depths, radii):
        table, counts, cum = mktable(means2d, conics + c * 0.0, colors_c,
                                     opac_c, depths, radii)
        return s_(table, c) + s_(counts, 0.0)

    t("table build (concat [M,14])", t1,
      (means2d, conics, colors_c, opac_c, depths, radii))

    table, counts, cum = jax.jit(mktable)(
        means2d, conics, colors_c, opac_c, depths, radii)

    # 2: repeat only
    def t2(c, counts):
        src = jnp.repeat(jnp.arange(M, dtype=jnp.int32) + shi(c), counts,
                         total_repeat_length=cap)
        return s_(src, c)

    t("repeat (real counts)", t2, (counts,))

    src = jax.jit(lambda counts: jnp.repeat(
        jnp.arange(M, dtype=jnp.int32), counts, total_repeat_length=cap)
    )(counts)

    # 3: take only
    def t3(c, table, src):
        g = jnp.take(table, src + shi(c), axis=0)
        return s_(g, c)

    t("take [cap,14] from [M,14]", t3, (table, src))

    g = jax.jit(lambda table, src: jnp.take(table, src, axis=0))(table, src)

    # 4: rank/key math only
    def t4(c, g, cum):
        pos = jnp.arange(cap, dtype=jnp.int32)
        total = cum[-1]
        valid = pos < jnp.minimum(total, cap)
        gg = g + c * 0.0
        rank = (pos - gg[:, 0].astype(jnp.int32)).astype(jnp.float32)
        nxr = gg[:, 2]
        dy = jnp.floor(rank / nxr)
        dx = rank - dy * nxr
        tile = (gg[:, 1] + dy * TW + dx).astype(jnp.int32)
        tile = jnp.where(valid, tile, rv.INT32_MAX)
        depth_bits = jax.lax.bitcast_convert_type(gg[:, 3], jnp.int32)
        depth_bits = jnp.where(valid, depth_bits, rv.INT32_MAX)
        return s_(tile.astype(jnp.float32), c) + s_(
            depth_bits.astype(jnp.float32), 0.0)

    t("rank/key math", t4, (g, cum))

    # 5: column slices of g -> payload ops (the implicit unpack)
    def t5(c, g):
        gg = g + c * 0.0
        payload = tuple(gg[:, 4 + i] for i in range(10))
        acc = c
        for p in payload:
            acc = acc + s_(p, 0.0)
        return acc

    t("column unpack [cap,14]->10x[cap]", t5, (g,))


if __name__ == "__main__":
    main()
