"""Bisect the real build_sorted cost at bench scale: which op is slow?"""

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
    print("N =", N)

    cfg = rv.V2Cfg(C=C, tile_width=TW, tile_height=TH, tile_size=ts,
                   channels=3, cap=cap, n=N, tiles_per_step=g_t,
                   interpret=False, absgrad=False)

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

    # Precompute the pre-sort arrays once (real data)
    def pre(means2d, conics, colors_c, opac_c, depths, radii):
        x0, y0, nx, counts = rv.tile_counts(means2d, radii, ts, TW, TH)
        counts = counts.reshape(M)
        cum = jnp.cumsum(counts)
        total = cum[-1]
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
        src = jnp.repeat(jnp.arange(M, dtype=jnp.int32), counts,
                         total_repeat_length=cap)
        g = jnp.take(table, src, axis=0)
        pos = jnp.arange(cap, dtype=jnp.int32)
        valid = pos < jnp.minimum(total, cap)
        rank = (pos - g[:, 0].astype(jnp.int32)).astype(jnp.float32)
        nxr = g[:, 2]
        dy = jnp.floor(rank / nxr)
        dx = rank - dy * nxr
        tile = (g[:, 1] + dy * TW + dx).astype(jnp.int32)
        tile = jnp.where(valid, tile, rv.INT32_MAX)
        depth_bits = jax.lax.bitcast_convert_type(g[:, 3], jnp.int32)
        depth_bits = jnp.where(valid, depth_bits, rv.INT32_MAX)
        payload = tuple(g[:, 4 + i] for i in range(10))
        return (tile, depth_bits) + payload

    pre_j = jax.jit(pre)
    ops = pre_j(means2d, conics, colors_c, opac_c, depths, radii)
    tile, depth_bits = ops[0], ops[1]
    pays = ops[2:]
    nvalid = int(jnp.sum(tile != rv.INT32_MAX))
    print("valid isects:", nvalid, "cap:", cap)

    # 1: the pre-sort part alone
    def prebody(c, means2d, conics, colors_c, opac_c, depths, radii):
        o = pre(means2d, conics + c * 0.0, colors_c, opac_c, depths, radii)
        return s_(o[0], c) + s_(o[5], 0.0)

    t("pre (table+expand+keys)", prebody,
      (means2d, conics, colors_c, opac_c, depths, radii))

    # 2: the sort alone on REAL keys/payloads
    def sortbody(c, tile, depth_bits, *pays):
        so = jax.lax.sort((tile + shi(c), depth_bits) + pays, num_keys=2)
        return s_(so[0], c) + s_(so[2], 0.0)

    t("sort 2-key real data", sortbody, (tile, depth_bits) + pays)

    # 2b: single fused key on real data
    def sortbody1(c, tile, depth_bits, *pays):
        so = jax.lax.sort((tile + shi(c),) + pays, num_keys=1, is_stable=True)
        return s_(so[0], c) + s_(so[1], 0.0)

    t("sort 1-key real tile keys", sortbody1, (tile, depth_bits) + pays)

    # 3: sort + stack + searchsorted (the rest of build)
    def postbody(c, tile, depth_bits, *pays):
        so = jax.lax.sort((tile + shi(c), depth_bits) + pays, num_keys=2)
        rows = jnp.stack(so[2:], axis=0)
        pad = cfg.d_s - rows.shape[0]
        rows = jnp.concatenate([rows, jnp.zeros((pad, cap), jnp.float32)], 0)
        starts = jnp.searchsorted(
            so[0], jnp.arange(cfg.n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return s_(rows, c) + s_(starts, 0.0)

    t("sort + stack + searchsorted", postbody, (tile, depth_bits) + pays)

    # 4: full build_sorted for comparison
    masks0 = jnp.zeros((0,), jnp.int32)

    def build(c, means2d, conics, colors_c, opac_c, depths, radii):
        S, starts, cum, n = rv._build_sorted(
            cfg, means2d + c * 0.0, conics, colors_c, opac_c, depths, radii,
            masks0)
        return s_(S, c) + s_(starts, 0.0)

    t("full _build_sorted", build,
      (means2d, conics, colors_c, opac_c, depths, radii))


if __name__ == "__main__":
    main()
