"""Microbenchmarks of the index-plumbing primitives on the real chip.

These numbers drive the round-2 rasterizer pipeline redesign: the round-1
profile showed the XLA gather/sort/scatter plumbing around the Pallas kernel
costs more than the kernel itself (ROADMAP).

Every body depends on the scan carry ``c`` (via an index shift that is 0 at
runtime but opaque to XLA) so nothing is hoisted out of the timing loop.

Run: python profiling/prim_bench.py
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

    rng = np.random.default_rng(0)
    M = 1 << 20  # 1M gaussians
    CAP = 5 << 20  # 5M isects

    table16 = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))
    table8 = table16[:, :8]
    table4 = table16[:, :4]
    ids = jnp.asarray(rng.integers(0, M, CAP).astype(np.int32))
    ids_sorted = jnp.sort(ids)
    perm = jnp.asarray(rng.permutation(CAP).astype(np.int32))
    rows16 = jnp.asarray(rng.standard_normal((CAP, 16)).astype(np.float32))
    rows8 = rows16[:, :8]
    keys = jnp.asarray(rng.integers(0, 1 << 30, CAP).astype(np.int32))
    fcols = [rows16[:, i] for i in range(11)]

    def sh(c):
        # runtime 0, opaque to the compiler
        return jnp.minimum(c, 0.0).astype(jnp.int32)

    def t(name, body, args, K=4, per_row=CAP):
        try:
            per = honest_timer(body, args, K=K, repeats=2)
        except Exception as e:  # pragma: no cover
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}")
            return None
        print(f"{name:44s} {per*1e3:9.3f} ms   {per/per_row*1e9:7.2f} ns/row")
        return per

    def s(x, c):
        return jnp.sum(x).astype(jnp.float32) * 1e-20 + c

    # --- gathers ---
    t("take rows [5M] from [1M,16]",
      lambda c, tb, i: s(jnp.take(tb, i + sh(c), axis=0), c), (table16, ids))
    t("take rows [5M] from [1M,8]",
      lambda c, tb, i: s(jnp.take(tb, i + sh(c), axis=0), c), (table8, ids))
    t("take rows [5M] from [1M,4]",
      lambda c, tb, i: s(jnp.take(tb, i + sh(c), axis=0), c), (table4, ids))
    t("take 1 col  [5M] from [1M]",
      lambda c, tb, i: s(jnp.take(tb[:, 0], i + sh(c)), c), (table16, ids))
    t("take 8 cols separately",
      lambda c, tb, i: sum(
          s(jnp.take(tb[:, k], i + sh(c)), 0.0) for k in range(8)) + c,
      (table16, ids))
    t("take rows sorted-ids [5M] from [1M,8]",
      lambda c, tb, i: s(jnp.take(tb, i + sh(c), axis=0), c),
      (table8, ids_sorted))
    t("take [5M] from small [4096]",
      lambda c, tb, i: s(jnp.take(tb[:4096, 0], (i + sh(c)) % 4096), c),
      (table16, ids))

    # --- scatters ---
    t("perm scatter-set [5M,16]",
      lambda c, r, p: s(jnp.zeros((CAP, 16), jnp.float32)
                        .at[p + sh(c)].set(r), c), (rows16, perm))
    t("perm scatter-set [5M,8]",
      lambda c, r, p: s(jnp.zeros((CAP, 8), jnp.float32)
                        .at[p + sh(c)].set(r), c), (rows8, perm))
    t("perm scatter-set 1 col [5M]",
      lambda c, r, p: s(jnp.zeros((CAP,), jnp.float32)
                        .at[p + sh(c)].set(r[:, 0]), c), (rows16, perm))
    t("scatter-ADD dup ids [5M,8] -> [1M,8]",
      lambda c, r, i: s(jnp.zeros((M, 8), jnp.float32)
                        .at[i + sh(c)].add(r), c), (rows8, ids), K=2)

    # --- sorts ---
    t("sort 2 ops (key + 1 payload)",
      lambda c, k, a: s(jax.lax.sort((k + sh(c), a), num_keys=1)[1], c),
      (keys, fcols[0]))
    t("sort 4 ops (key + 3 payload)",
      lambda c, k, *a: s(jax.lax.sort((k + sh(c),) + a, num_keys=1)[1], c),
      (keys,) + tuple(fcols[:3]))
    t("sort 11 ops (key + 10 payload)",
      lambda c, k, *a: s(jax.lax.sort((k + sh(c),) + a, num_keys=1)[1], c),
      (keys,) + tuple(fcols[:10]))
    t("sort 2key lex + 2 payload",
      lambda c, k, d, a, b: s(jax.lax.sort((k + sh(c), d, a, b),
                                           num_keys=2)[2], c),
      (keys, fcols[0], fcols[1], fcols[2]))

    # --- scans / misc ---
    t("cumsum [5M,8] axis0",
      lambda c, r: s(jnp.cumsum(r + c * 1e-30, axis=0), c), (rows8,))
    t("cumsum [5M] 1col",
      lambda c, r: s(jnp.cumsum(r[:, 0] + c * 1e-30), c), (rows16,))
    t("elementwise a*b+c [5M,8] (BW floor)",
      lambda c, r: s(r * (1.5 + c) + 0.3, c), (rows8,))


if __name__ == "__main__":
    main()
