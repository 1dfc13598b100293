"""Verify gather-path hypotheses: column-count padding, attr-major gathers,
repeat alternatives — on REAL bench-scene counts."""

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
    means, quats, scales, opac, colors, viewmats, Ks = map(
        jnp.asarray, (mg, quats, scales, opac, cg, viewmat, Kmat))
    C, N = 1, means.shape[0]
    M = C * N

    radii, means2d, depths, conics, comps = jax.jit(
        functools.partial(fully_fused_projection, width=width, height=height)
    )(means, None, quats, scales, viewmats, Ks)

    shi = lambda c: jnp.minimum(c, 0.0).astype(jnp.int32)
    s_ = lambda x, c: jnp.sum(x).astype(jnp.float32) * 1e-20 + c

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:44s} {per*1e3:8.2f} ms", flush=True)
        return per

    x0, y0, nx, counts = jax.jit(
        lambda m2, r: rv.tile_counts(m2, r, ts, TW, TH))(means2d, radii)
    counts = counts.reshape(M)
    rng = np.random.default_rng(0)
    table16 = jnp.asarray(rng.random((M, 16)).astype(np.float32))
    table14 = table16[:, :14]
    table16T = jnp.asarray(np.ascontiguousarray(
        rng.random((16, M)).astype(np.float32)))
    src = jax.jit(lambda counts: jnp.repeat(
        jnp.arange(M, dtype=jnp.int32), counts, total_repeat_length=cap)
    )(counts)

    # 1: take [cap,16] from [M,16] (row-padded table)
    def t16(c, table, src):
        return s_(jnp.take(table, src + shi(c), axis=0), c)

    t("take [cap,16] from [M,16] real src", t16, (table16, src))
    t("take [cap,14] from [M,14] real src", t16, (table14, src))

    # 2: attr-major gather: [16, cap] = table16T[:, src]
    def tT(c, tableT, src):
        return s_(jnp.take(tableT, src + shi(c), axis=1), c)

    t("take axis1 [16,cap] from [16,M]", tT, (table16T, src))

    # 3: repeat alternatives on REAL counts
    def r1(c, counts):
        s = jnp.repeat(jnp.arange(M, dtype=jnp.int32) + shi(c), counts,
                       total_repeat_length=cap)
        return s_(s, c)

    t("repeat real counts", r1, (counts,))

    def r2(c, counts):
        cum = jnp.cumsum(counts + shi(c))
        s = jnp.searchsorted(cum, jnp.arange(cap, dtype=jnp.int32),
                             side="right")
        return s_(s, c)

    t("searchsorted repeat real counts", r2, (counts,))

    def r3(c, counts):
        cum = jnp.cumsum(counts + shi(c))
        ones = jnp.zeros((cap,), jnp.int32).at[jnp.minimum(cum, cap - 1)].add(1)
        s = jnp.cumsum(ones)
        return s_(s, c)

    t("scatter-ones+cumsum repeat real counts", r3, (counts,))


if __name__ == "__main__":
    main()
