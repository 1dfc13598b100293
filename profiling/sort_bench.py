"""Microbenchmark XLA sort formulations at isect scale (v2 binning design).

Findings feed raster_v2: 2-key lex sort vs single-key stable sorts, payload
scaling, cumsum/take costs for the VJP reduction.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gscodec_studio_tpu.utils.profiling import honest_timer

    L = 6 << 20  # isect rows
    M = 1 << 20  # gaussian rows
    NP = 10  # payload operands
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 8160, L).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 1 << 30, L).astype(np.int32))
    fkey = jnp.asarray(rng.random(L).astype(np.float32))
    pays = tuple(jnp.asarray(rng.random(L).astype(np.float32)) for _ in range(NP))
    gtab = jnp.asarray(rng.random((M, 16)).astype(np.float32))
    gsrc = jnp.asarray(np.sort(rng.integers(0, M, L)).astype(np.int32))
    counts = jnp.asarray(rng.integers(0, 12, M).astype(np.int32))

    s_ = lambda x, c: jnp.sum(x).astype(jnp.float32) * 1e-20 + c
    # tie the carry into integer/float inputs so the timed op cannot be
    # hoisted out of the measurement scan
    shi = lambda c: jnp.minimum(c, 0.0).astype(jnp.int32)
    shf = lambda c: jnp.minimum(c, 0.0) * 0.0

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:44s} {per*1e3:8.2f} ms")
        return per

    # A: current build sort — 2 int keys + NP payloads
    def a(c, tile, depth, *pays):
        so = jax.lax.sort((tile + shi(c), depth) + pays, num_keys=2)
        return s_(so[2], c)

    t("A 2-key i32 + 10 payloads", a, (tile, depth) + pays)

    # B: 1 int key + 10 payloads (stable)
    def b(c, tile, *pays):
        so = jax.lax.sort((tile + shi(c),) + pays, num_keys=1, is_stable=True)
        return s_(so[1], c)

    t("B 1-key i32 stable + 10 payloads", b, (tile,) + pays)

    # B2: 1 int key + 10 payloads (unstable)
    def b2(c, tile, *pays):
        so = jax.lax.sort((tile + shi(c),) + pays, num_keys=1, is_stable=False)
        return s_(so[1], c)

    t("B2 1-key i32 unstable + 10 payloads", b2, (tile,) + pays)

    # C: 1 f32 key + 10 payloads
    def cf(c, fkey, *pays):
        so = jax.lax.sort((fkey + shf(c),) + pays, num_keys=1, is_stable=True)
        return s_(so[1], c)

    t("C 1-key f32 stable + 10 payloads", cf, (fkey,) + pays)

    # D: 1 int key + 3 payloads
    def d(c, tile, *pays):
        so = jax.lax.sort((tile + shi(c),) + pays[:3], num_keys=1, is_stable=True)
        return s_(so[1], c)

    t("D 1-key i32 stable + 3 payloads", d, (tile,) + pays)

    # E: gaussian-table depth sort (M rows, 16 payload cols as operands)
    def e(c, fk, gtab):
        ops = (fk + shf(c),) + tuple(gtab[:, i] for i in range(16))
        so = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return s_(so[1], c)

    t("E gauss depth sort M + 16 payloads", e, (fkey[:M], gtab))

    # F: cumsum [L, 9] axis 0
    v9 = jnp.stack(pays[:9], axis=-1)

    def f(c, v9):
        cs = jnp.cumsum(v9 + c * 0.0, axis=0)
        return s_(cs, c)

    t("F cumsum [L,9] axis0", f, (v9,))

    # F2: cumsum attr-major [9, L] axis 1
    v9t = jnp.stack(pays[:9], axis=0)

    def f2(c, v9t):
        cs = jnp.cumsum(v9t + c * 0.0, axis=1)
        return s_(cs, c)

    t("F2 cumsum [9,L] axis1", f2, (v9t,))

    # G: monotone row take (expansion-style): L rows from [M,16]
    def g(c, gtab, gsrc):
        out = jnp.take(gtab, gsrc + shi(c), axis=0)
        return s_(out, c) + s_(gsrc, 0.0)

    t("G monotone row-take L from [M,16]", g, (gtab, gsrc))

    # G2: random row take
    gsrc_r = jnp.asarray(rng.integers(0, M, L).astype(np.int32))
    t("G2 random row-take L from [M,16]", g, (gtab, gsrc_r))

    # H: bounds-take: M+1 rows from [L, 9] (sorted indices)
    bounds = jnp.asarray(np.sort(rng.integers(0, L, M + 1)).astype(np.int32))

    def h(c, v9, bounds):
        out = jnp.take(v9, bounds + shi(c), axis=0)
        return s_(out, c)

    t("H sorted bounds row-take M+1 from [L,9]", h, (v9, bounds))

    # I: repeat via jnp.repeat vs scatter+cumsum
    def i1(c, counts):
        src = jnp.repeat(jnp.arange(M, dtype=jnp.int32) + shi(c), counts,
                         total_repeat_length=L)
        return s_(src, c)

    t("I1 jnp.repeat total_repeat_length", i1, (counts,))

    def i2(c, counts):
        cum = jnp.cumsum(counts + shi(c))
        ones = jnp.zeros((L,), jnp.int32).at[jnp.minimum(cum, L - 1)].add(1)
        src = jnp.cumsum(ones)
        return s_(src, c)

    t("I2 repeat via scatter-ones+cumsum", i2, (counts,))

    # J: searchsorted L queries into M
    def j(c, counts):
        cum = jnp.cumsum(counts + shi(c))
        src = jnp.searchsorted(cum, jnp.arange(L, dtype=jnp.int32), side="right")
        return s_(src, c)

    t("J searchsorted L into M", j, (counts,))


if __name__ == "__main__":
    main()
