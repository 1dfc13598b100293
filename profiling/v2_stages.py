"""Per-stage timing of the v3 pipeline at bench scale."""

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

    ts = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    g_t = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    width, height = 1920, 1080
    cap = {16: 6 << 20, 32: 5 << 19}[ts]
    TW, TH = -(-width // ts), -(-height // ts)

    mg, quats, scales, opac, cg, viewmat, Kmat = baseline_scene(width, height)
    args = tuple(map(jnp.asarray, (mg, quats, scales, opac, cg, viewmat, Kmat)))
    means, quats, scales, opac, colors, viewmats, Ks = args

    C, N = 1, means.shape[0]
    cfg = rv.V2Cfg(C=C, tile_width=TW, tile_height=TH, tile_size=ts,
                   channels=3, cap=cap, n=N, tiles_per_step=g_t,
                   interpret=False, absgrad=False,
                   grad_dtype=os.environ.get("GSC_GRAD_DTYPE", "f32"),
                   attr_dtype=os.environ.get("GSC_ATTR_DTYPE", "f32"))
    print("grad_dtype", cfg.grad_dtype, "attr_dtype", cfg.attr_dtype,
          "d_s", cfg.d_s, "d_g", cfg.d_g, flush=True)

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:34s} {per*1e3:8.2f} ms", flush=True)
        return per

    s_ = lambda x, c: jnp.sum(x.astype(jnp.float32)) * 1e-20 + c

    radii, means2d, depths, conics, comps = jax.jit(
        functools.partial(fully_fused_projection, width=width, height=height)
    )(means, None, quats, scales, viewmats, Ks)
    colors_c = jnp.broadcast_to(colors[None], (C,) + colors.shape)
    opac_c = jnp.broadcast_to(opac[None], (C, N))

    # full build
    def build(c, means2d, conics, colors_c, opac_c, depths, radii):
        S, starts, aux = rv._build_sorted(
            cfg, means2d + c * 0.0, conics, colors_c, opac_c, depths, radii)
        return s_(S, c) + s_(starts, 0.0)

    t("build (all)", build,
      (means2d, conics, colors_c, opac_c, depths, radii))

    S, starts, aux = jax.jit(
        lambda *a: rv._build_sorted(cfg, *a)
    )(means2d, conics, colors_c, opac_c, depths, radii)
    sp = jax.jit(lambda s: rv._starts_padded(cfg, s))(starts)
    mp = jax.jit(lambda: rv._masks_padded(cfg, jnp.zeros((0,), jnp.int32)))()
    print("n_isects:", int(aux["n_isects"]))

    # substage: compaction sort only
    M = C * N

    def comp_sort(c, means2d, conics, colors_c, opac_c, depths, radii):
        x0, y0, nx, counts = rv.tile_counts(means2d + c * 0.0, radii, ts, TW, TH)
        counts = counts.reshape(M)
        depth_key = jnp.where(counts > 0, depths.reshape(M), jnp.inf)
        base = (y0 * TW + x0).reshape(M).astype(jnp.float32)
        origid = jnp.arange(M, dtype=jnp.float32)
        attr = [means2d.reshape(M, 2)[:, 0], means2d.reshape(M, 2)[:, 1],
                conics.reshape(M, 3)[:, 0], conics.reshape(M, 3)[:, 1],
                conics.reshape(M, 3)[:, 2], opac_c.reshape(M),
                colors_c.reshape(M, 3)[:, 0], colors_c.reshape(M, 3)[:, 1],
                colors_c.reshape(M, 3)[:, 2]]
        ops = (depth_key, counts.astype(jnp.float32), base,
               jnp.maximum(nx.reshape(M), 1).astype(jnp.float32),
               ) + tuple(attr) + (origid,)
        so = jax.lax.sort(ops, num_keys=1, is_stable=False)
        r = s_(so[0], c)
        for o in so[1:]:
            r = r + s_(o, 0.0)
        return r

    t("  compact sort (14 ops live)", comp_sort,
      (means2d, conics, colors_c, opac_c, depths, radii))

    # fwd kernel
    def fwd(c, S, sp, mp):
        out = rv._run_fwd(cfg, S + c * 0.0, sp, mp)
        return s_(out, c)

    t("fwd kernel", fwd, (S, sp, mp))

    tiles_out = jax.jit(lambda S, sp, mp: rv._run_fwd(cfg, S, sp, mp))(S, sp, mp)

    # bwd kernel
    off, end = starts[:-1], starts[1:]
    nchunks = jnp.where(end > off, (end + rv.K - 1) // rv.K - off // rv.K, 0)
    slot_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)])
    pad = sp.shape[0] - slot_base.shape[0]
    slot_base = jnp.concatenate(
        [slot_base, jnp.broadcast_to(slot_base[-1:], (pad,))])
    vt = jnp.ones_like(tiles_out)
    idrow = cfg.gidrow
    gbuf_init = jnp.zeros((cfg.d_g, cfg.slot_cap * rv.K), jnp.float32)
    gbuf_init = gbuf_init.at[idrow].set(rv.PAD_ID)
    padt = lambda x: jnp.concatenate(
        [x, jnp.zeros((cfg.n_steps * g_t - cfg.n_tiles,) + x.shape[1:],
                      x.dtype)])

    def bwd(c, S, sp, slot_base, mp, tiles_out, vt, gbuf_init):
        # _run_fwd now returns the PADDED [n_steps*G, P, CHP] buffer
        out = rv._run_bwd(cfg, S + c * 0.0, sp, slot_base, mp, tiles_out,
                          vt, gbuf_init)
        return s_(out[0], c)

    t("bwd kernel", bwd, (S, sp, slot_base, mp, tiles_out, vt, gbuf_init))

    gbuf = jax.jit(
        lambda *a: rv._run_bwd(cfg, a[0], a[1], a[2], a[3], a[4],
                               a[5], a[6])
    )(S, sp, slot_base, mp, tiles_out, vt, gbuf_init)

    # reduce
    def red(c, gbuf, cum, origid, vis, n_is):
        aux2 = dict(cum_i32=cum, origid_s=origid, visible_s=vis,
                    n_isects=n_is)
        v_flat, _ = rv._reduce_grads(cfg, gbuf + c * 0.0, aux2)
        return s_(v_flat, c)

    t("reduce (all)", red,
      (gbuf, aux["cum_i32"], aux["origid_s"], aux["visible_s"],
       aux["n_isects"]))

    # substage: id sort of grad rows (ALL outputs consumed — an output
    # consumed only by nothing gets DCE'd out of the sort, which made the
    # round-2 numbers lie)
    nval = idrow

    def red_sort(c, gbuf):
        cols = rv.unpack_rows(gbuf + c * 0.0, idrow + 1, cfg.interpret)
        so = jax.lax.sort((cols[idrow],) + tuple(cols[:idrow]), num_keys=1)
        r = s_(so[0], c)
        for o in so[1:]:
            r = r + s_(o, 0.0)
        return r

    t("  unpack + id sort (live)", red_sort, (gbuf,))

    cols = jax.jit(
        lambda g: rv.unpack_rows(g, idrow + 1, cfg.interpret)
    )(gbuf)
    so = jax.jit(
        lambda *c: jax.lax.sort((c[idrow],) + tuple(c[:idrow]), num_keys=1)
    )(*cols)

    M = cfg.C * cfg.n
    G128 = 128 * rv.SEG_G
    nblk = (-(-M // G128)) * rv.SEG_G
    idx = jnp.minimum(jnp.arange(1, nblk + 1, dtype=jnp.int32) * 128 - 1,
                      M - 1)
    bnd = jnp.minimum(jnp.take(aux["cum_i32"], idx), aux["n_isects"])
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), bnd.astype(jnp.int32)])

    def red_segsum(c, ids_s, *vals):
        rows = list(vals[:nval]) + [ids_s + c * 0.0]
        packed = rv.pack_rows(rows, cfg.d_g, cfg.interpret)
        seg = rv.segsum_rows(packed, bounds, idrow, nblk, cfg.interpret,
                             packed_pairs=cfg.grad_packed)
        return s_(seg, c)

    t("  pack + segsum_rows", red_segsum, (so[0],) + tuple(so[1:]))

    packed = jax.jit(
        lambda ids_s, *vals: rv.pack_rows(
            list(vals) + [ids_s], cfg.d_g, cfg.interpret)
    )(so[0], *so[1:])
    seg = jax.jit(
        lambda p: rv.segsum_rows(p, bounds, idrow, nblk, cfg.interpret,
                                 packed_pairs=cfg.grad_packed)
    )(packed)

    def red_final(c, seg, origid):
        segrows = rv.unpack_rows(seg + c * 0.0, max(idrow, 1), cfg.interpret)
        segvals = [v[:M] for v in segrows[:nval]]
        so3 = jax.lax.sort((origid,) + tuple(segvals), num_keys=1,
                           is_stable=False)
        v_flat = jnp.stack(so3[1:1 + nval], axis=-1)
        return s_(v_flat, c)

    t("  unpack + origid sort + stack", red_final, (seg, aux["origid_s"]))


if __name__ == "__main__":
    main()
