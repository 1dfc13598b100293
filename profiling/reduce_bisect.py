"""Bisect _reduce_grads internals at isect scale."""

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

    L = 7 << 20
    M = 2794625
    rng = np.random.default_rng(0)
    ids = jnp.asarray(np.sort(rng.integers(0, M, L)).astype(np.float32))
    vals = tuple(jnp.asarray(rng.random(L).astype(np.float32))
                 for _ in range(9))
    origid = jnp.asarray(rng.permutation(M).astype(np.float32))
    segs = tuple(jnp.asarray(rng.random(M).astype(np.float32))
                 for _ in range(9))

    shf = lambda c: jnp.minimum(c, 0.0)
    s_ = lambda x, c: jnp.sum(x).astype(jnp.float32) * 1e-20 + c

    def t(name, body, a, K=4):
        per = honest_timer(body, a, K=K, repeats=2)
        print(f"{name:40s} {per*1e3:8.2f} ms", flush=True)
        return per

    # 1: nine 1-D cumsums
    def c1(c, *vals):
        acc = c
        for v in vals:
            acc = acc + s_(jnp.cumsum(v + shf(c)), 0.0)
        return acc

    t("9x 1-D cumsum [L]", c1, vals)

    # 2: end-compact sort (1 key + 9 payloads, L rows)
    def c2(c, ids, *vals):
        so = jax.lax.sort((ids + shf(c),) + vals, num_keys=1, is_stable=False)
        return s_(so[1], c)

    t("end sort 1key+9 [L]", c2, (ids,) + vals)

    # 3: unsort sort (M rows, 1 key + 9 payloads)
    def c3(c, origid, *segs):
        so = jax.lax.sort((origid + shf(c),) + segs, num_keys=1,
                          is_stable=False)
        return s_(so[1], c)

    t("unsort 1key+9 [M]", c3, (origid,) + segs)

    # 4: final stack [M, 9]
    def c4(c, *segs):
        v = jnp.stack([s + shf(c) for s in segs], axis=-1)
        return s_(v, c)

    t("stack 9x[M] -> [M,9]", c4, segs)

    # 5: slice [:M] from [L] x9
    def c5(c, *vals):
        acc = c
        for v in vals:
            acc = acc + s_((v + shf(c))[:M], 0.0)
        return acc

    t("9x slice [:M]", c5, vals)

    # 6: is_end / where / concat glue
    def c6(c, ids):
        idsc = ids + shf(c)
        nxt = jnp.concatenate([idsc[1:], jnp.full((1,), -1.0, jnp.float32)])
        is_end = (idsc != nxt) & (idsc < 1.5e7)
        endkey = jnp.where(is_end, idsc, jnp.inf)
        return s_(endkey, c)

    t("is_end glue", c6, (ids,))


if __name__ == "__main__":
    main()
