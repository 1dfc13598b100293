"""Skeleton validation + cost measurement for the round-2 rasterizer kernel
structure:

  * sorted per-isect attributes stored ATTR-MAJOR [16, cap] in HBM;
  * global 128-wide chunks (lane-aligned DMA windows [:, cK:(c+1)K]);
  * grid over tiles, inner while-loop double-buffering chunk DMAs,
    masking rows outside the tile's [start, end) run;
  * pair math in (P, K) layout: pixels on sublanes, gaussians on lanes,
    front-to-back scan along lanes via pltpu.roll;
  * chunk-level early exit.

Measures per-tile / per-isect cost to size the real kernel.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gscodec_studio_tpu.utils.profiling import honest_timer

    K = 128
    D = 16
    P = 256
    CH = 3

    def make(T, avg_len, term_after=None, seed=0):
        rng = np.random.default_rng(seed)
        lens = rng.poisson(avg_len, T).astype(np.int32)
        starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        cap = ((int(starts[-1]) + K - 1) // K + 1) * K
        rows = rng.standard_normal((D, cap)).astype(np.float32)
        op = np.full(cap, 0.02, np.float32)
        if term_after is not None:
            op[:] = 1.0 - (1e-4) ** (1.0 / term_after)
        rows[5] = op
        return (jnp.asarray(rows), jnp.asarray(starts[:-1]),
                jnp.asarray(starts[:-1] + lens), cap)

    def _shifted_lane(x, sh, fill):
        rolled = pltpu.roll(x, sh, 1)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(idx < sh, fill, rolled)

    def _cumprod_excl_lane(x):
        y = _shifted_lane(x, 1, 1.0)
        sh = 1
        while sh < x.shape[1]:
            y = y * _shifted_lane(y, sh, 1.0)
            sh *= 2
        return y

    def kernel(starts_ref, ends_ref, rows_hbm, out_ref, buf, t_scr, sem):
        t = pl.program_id(0)
        off = starts_ref[t]
        end = ends_ref[t]
        c0 = off // K
        c1 = (end + K - 1) // K  # exclusive

        def dma(slot, c):
            return pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds(c * K, K)],
                buf.at[slot], sem.at[slot],
            )

        t_scr[:] = jnp.ones_like(t_scr)
        out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(c1 > c0)
        def _():
            dma(0, c0).start()

            def cond(c):
                return (c < c1) & (jnp.max(t_scr[:]) > 1e-4)

            def body(c):
                @pl.when(c + 1 < c1)
                def _():
                    dma((c + 1 - c0) % 2, c + 1).start()

                dma((c - c0) % 2, c).wait()
                chunk = buf[(c - c0) % 2]  # (D, K)
                # realistic pair math in (P, K)
                xs = chunk[0:1, :]  # (1, K)
                ys = chunk[1:2, :]
                ca, cb, cc = chunk[2:3, :], chunk[3:4, :], chunk[4:5, :]
                op = chunk[5:6, :]
                pxy = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
                px = (pxy % 16).astype(jnp.float32)
                py = (pxy // 16).astype(jnp.float32)
                dx = xs - px  # (P, K)
                dy = ys - py
                sigma = (0.5 * ca) * (dx * dx) + (0.5 * cc) * (dy * dy) \
                    + cb * (dx * dy)
                idx = c * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                inr = (idx >= off) & (idx < end)
                alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))
                valid = (sigma >= 0.0) & (alpha >= 1.0 / 255.0) & inr
                alpha = jnp.where(valid, alpha, 0.0)
                oma = 1.0 - alpha
                t_prev = _cumprod_excl_lane(oma) * t_scr[:]
                w = alpha * t_prev
                t_scr[:] = t_prev[:, K - 1:K] * oma[:, K - 1:K]
                # (P, K) @ (CH, K) -> (P, CH)
                out_ref[0] += jax.lax.dot_general(
                    w, chunk[6:6 + CH, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return c + 1

            c_final = jax.lax.while_loop(cond, body, c0)

            @pl.when(c_final < c1)
            def _():
                dma((c_final - c0) % 2, c_final).wait()

    def run(rows, starts, ends, T):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, P, CH), lambda i, s, e: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, D, K), jnp.float32),
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, P, CH), jnp.float32),
        )(starts, ends, rows)

    for (T, avg_len, term, label) in [
        (8160, 640, None, "8160 tiles x 640 rows, no term"),
        (8160, 640, 24.0, "8160 tiles x 640 rows, term@24"),
        (8160, 640, 100.0, "8160 tiles x 640 rows, term@100"),
        (8160, 64, None, "8160 tiles x 64 rows, no term"),
    ]:
        rows, starts, ends, cap = make(T, avg_len, term)
        n_isect = float(jnp.sum(ends - starts))

        def body(c, rows, starts, ends):
            sh = jnp.minimum(c, 0.0).astype(jnp.int32)
            out = run(rows, starts + sh, ends, T)
            return jnp.sum(out).astype(jnp.float32) * 1e-20 + c

        per = honest_timer(body, (rows, starts, ends), K=4, repeats=2)
        print(f"{label:38s} {per*1e3:8.2f} ms  "
              f"{per/T*1e6:6.2f} us/tile  {per/n_isect*1e9:6.2f} ns/isect")


if __name__ == "__main__":
    main()
