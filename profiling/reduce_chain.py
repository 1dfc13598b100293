"""Cumulative-prefix timing of the real _reduce_grads chain on real gbuf."""

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
    means, quats, scales, opac, colors, viewmats, Ks = map(
        jnp.asarray, (mg, quats, scales, opac, cg, viewmat, Kmat))
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
    S, starts, aux = jax.jit(lambda *a: rv._build_sorted(cfg, *a))(
        means2d, conics, colors_c, opac_c, depths, radii)
    sp = jax.jit(lambda s: rv._starts_padded(cfg, s))(starts)
    mp = jax.jit(lambda: rv._masks_padded(cfg, jnp.zeros((0,), jnp.int32)))()
    tiles_out = jax.jit(lambda S, sp, mp: rv._run_fwd(cfg, S, sp, mp))(S, sp, mp)
    off, end = starts[:-1], starts[1:]
    nchunks = jnp.where(end > off, (end + rv.K - 1) // rv.K - off // rv.K, 0)
    slot_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)])
    pad = sp.shape[0] - slot_base.shape[0]
    slot_base = jnp.concatenate(
        [slot_base, jnp.broadcast_to(slot_base[-1:], (pad,))])
    vt = jnp.ones_like(tiles_out)
    idrow = 9
    gbuf_init = jnp.zeros((cfg.d_g, cfg.slot_cap * rv.K), jnp.float32)
    gbuf_init = gbuf_init.at[idrow].set(rv.PAD_ID)
    padt = lambda x: jnp.concatenate(
        [x, jnp.zeros((cfg.n_steps * g_t - cfg.n_tiles,) + x.shape[1:],
                      x.dtype)])
    gbuf = jax.jit(
        lambda *a: rv._run_bwd(cfg, a[0], a[1], a[2], a[3], padt(a[4]),
                               padt(a[5]), a[6])
    )(S, sp, slot_base, mp, tiles_out, vt, gbuf_init)

    s_ = lambda x, c: jnp.sum(x.astype(jnp.float32)) * 1e-20 + c

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:40s} {per*1e3:8.2f} ms", flush=True)
        return per

    cum = aux["cum_i32"]
    origid = aux["origid_s"]
    vis = aux["visible_s"]

    def chain(stop):
        def body(c, gbuf, origid, vis):
            g = gbuf + c * 0.0
            cols = rv.unpack_rows(g, idrow + 1, False)
            ids = cols[idrow]
            vals = cols[:idrow]
            so = jax.lax.sort((ids,) + tuple(vals), num_keys=1,
                              is_stable=False)
            if stop == 1:
                return s_(so[1], c)
            ids_s = so[0]
            csums = [jnp.cumsum(v) for v in so[1:]]
            if stop == 2:
                return functools.reduce(lambda a, b: a + s_(b, 0.0), csums, c)
            nxt = jnp.concatenate([ids_s[1:],
                                   jnp.full((1,), -1.0, jnp.float32)])
            is_end = (ids_s != nxt) & (ids_s < rv.PAD_ID * 0.5)
            endkey = jnp.where(is_end, ids_s, jnp.inf)
            so2 = jax.lax.sort((endkey,) + tuple(csums), num_keys=1,
                               is_stable=False)
            if stop == 3:
                return s_(so2[1], c)
            at_end = [x[:M] for x in so2[1:]]
            seg = []
            for x in at_end:
                prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), x[:-1]])
                seg.append(jnp.where(vis, x - prev, 0.0))
            if stop == 4:
                return functools.reduce(lambda a, b: a + s_(b, 0.0), seg, c)
            so3 = jax.lax.sort((origid,) + tuple(seg), num_keys=1,
                               is_stable=False)
            if stop == 5:
                return s_(so3[1], c)
            v_flat = jnp.stack(so3[1:], axis=-1)
            return s_(v_flat, c)

        return body

    for stop, name in [(1, "unpack+idsort"), (2, "+cumsums"),
                       (3, "+endsort"), (4, "+seg"), (5, "+unsort"),
                       (6, "+stack (full)")]:
        t(name, chain(stop), (gbuf, origid, vis))


if __name__ == "__main__":
    main()
