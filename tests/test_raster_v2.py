"""raster_v2 (fused binning + Pallas tile kernels) vs the pure-jnp oracle.

Forward allclose and the hand-derived deterministic backward vs jax.grad of
the oracle — the TPU analog of the reference's CUDA-vs-torch dual
implementation tests (tests/test_basic.py:477-576). Runs in interpret mode
on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.raster_v2 import rasterize_to_pixels_v2
from gscodec_studio_tpu.ops.rasterize_ref import rasterize_to_pixels_ref

from tests.test_rasterize_pallas import make_2d_scene


def _run_both(rng, C=1, N=200, W=48, H=32, CH=3, **kw):
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=C, N=N, W=W, H=H, CH=CH
    )
    args = tuple(
        map(jnp.asarray, (means2d, conics, colors, opacities, depths, radii))
    )
    bg = jnp.asarray(bg)
    img, alp, meta = rasterize_to_pixels_v2(
        *args, W, H, tile_size=16, isect_capacity=8192, backgrounds=bg, **kw
    )
    img_ref, alp_ref = rasterize_to_pixels_ref(
        *args, W, H, 16, backgrounds=bg
    )
    return img, alp, img_ref, alp_ref, args, bg


@pytest.mark.parametrize("CH", [3, 8])
@pytest.mark.parametrize("C", [1, 2])
def test_v2_forward_matches_oracle(rng, C, CH):
    img, alp, img_ref, alp_ref, _, _ = _run_both(rng, C=C, CH=CH)
    np.testing.assert_allclose(img, img_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(alp, alp_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("grad_dtype,atol", [("f32", 5e-3), ("bf16", 1.5e-2)])
def test_v2_backward_matches_oracle(rng, grad_dtype, atol):
    # f32 grad rows must stay tight vs the oracle; the production bf16
    # packed rows (V2Cfg.grad_dtype) add ~4e-3 relative noise per
    # per-isect contribution (truncated-bf16 pair packing).
    C, W, H, CH = 1, 48, 32, 3
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=C, N=150, W=W, H=H, CH=CH
    )
    args = tuple(
        map(jnp.asarray, (means2d, conics, colors, opacities))
    )
    depths, radii, bg = jnp.asarray(depths), jnp.asarray(radii), jnp.asarray(bg)
    tgt = jnp.asarray(np.random.default_rng(7).random((C, H, W, CH), np.float32))

    def loss_v2(means2d, conics, colors, opacities):
        img, alp, _ = rasterize_to_pixels_v2(
            means2d, conics, colors, opacities, depths, radii, W, H,
            tile_size=16, isect_capacity=8192, backgrounds=bg,
            grad_dtype=grad_dtype,
        )
        return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)

    def loss_ref(means2d, conics, colors, opacities):
        img, alp = rasterize_to_pixels_ref(
            means2d, conics, colors, opacities, depths, radii, W, H, 16,
            backgrounds=bg,
        )
        return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)

    np.testing.assert_allclose(loss_v2(*args), loss_ref(*args), rtol=1e-4)

    gv = jax.grad(loss_v2, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["means2d", "conics", "colors", "opacities"], gv, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=atol, err_msg=name
        )


def test_v2_attr_packed_close_to_exact(rng):
    """attr_dtype="bf16" packs opacity/color table rows as trunc-bf16
    pairs (geometry stays f32): forward must track the f32 path within
    bf16 resolution (~2e-3 relative on colors/alpha) and gradients must
    stay finite and close."""
    img_p, alp_p, img_ref, alp_ref, args, bg = _run_both(
        rng, C=2, CH=3, attr_dtype="bf16"
    )
    np.testing.assert_allclose(img_p, img_ref, rtol=0, atol=2e-2)
    np.testing.assert_allclose(alp_p, alp_ref, rtol=0, atol=2e-2)

    W, H = 48, 32
    depths, radii = args[4], args[5]
    tgt = jnp.asarray(
        np.random.default_rng(7).random(np.asarray(img_p).shape, np.float32)
    )

    def loss(attr_dtype):
        def f(means2d, conics, colors, opacities):
            img, alp, _ = rasterize_to_pixels_v2(
                means2d, conics, colors, opacities, depths, radii, W, H,
                tile_size=16, isect_capacity=8192, backgrounds=bg,
                attr_dtype=attr_dtype,
            )
            return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)
        return f

    gv = jax.grad(loss("bf16"), argnums=(0, 1, 2, 3))(*args[:4])
    gr = jax.grad(loss("f32"), argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(["means2d", "conics", "colors", "opacities"], gv, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=3e-2, err_msg=name
        )


def test_v2_geom_u16_close_to_exact(rng):
    """geom_dtype="u16" packs (x, y) into one fixed-point row (1/8 px):
    forward must track f32 within the quantization-induced alpha noise
    (a few 1e-2 max on px-scale splats) and gradients must stay finite
    and directionally close. Opt-in perf knob; f32 stays the default."""
    img_p, alp_p, img_ref, alp_ref, args, bg = _run_both(
        rng, C=2, CH=3, geom_dtype="u16"
    )
    np.testing.assert_allclose(img_p, img_ref, rtol=0, atol=8e-2)
    np.testing.assert_allclose(alp_p, alp_ref, rtol=0, atol=8e-2)

    W, H = 48, 32
    depths, radii = args[4], args[5]
    tgt = jnp.asarray(
        np.random.default_rng(7).random(np.asarray(img_p).shape, np.float32)
    )

    def loss(geom_dtype):
        def f(means2d, conics, colors, opacities):
            img, alp, _ = rasterize_to_pixels_v2(
                means2d, conics, colors, opacities, depths, radii, W, H,
                tile_size=16, isect_capacity=8192, backgrounds=bg,
                geom_dtype=geom_dtype,
            )
            return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)
        return f

    gv = jax.grad(loss("u16"), argnums=(0, 1, 2, 3))(*args[:4])
    gr = jax.grad(loss("f32"), argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(["means2d", "conics", "colors", "opacities"],
                          gv, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=1e-1, err_msg=name
        )


@pytest.mark.parametrize("cutoff", ["exact", "soft"])
def test_v2_log_composite_matches(rng, cutoff):
    """log-space MXU transmittance must match the roll-multiply scan to
    ~1e-4 (2-way bf16 split keeps ~16 mantissa bits of each log term)."""
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=1, N=200, W=48, H=32, CH=3
    )
    args = tuple(
        map(jnp.asarray, (means2d, conics, colors, opacities, depths, radii))
    )
    outs = {}
    for lc in (False, True):
        img, alp, _ = rasterize_to_pixels_v2(
            *args, 48, 32, tile_size=16, isect_capacity=8192,
            backgrounds=jnp.asarray(bg), cutoff_mode=cutoff,
            log_composite=lc,
        )
        outs[lc] = (np.asarray(img), np.asarray(alp))
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=0, atol=5e-4)

    tgt = jnp.asarray(np.random.default_rng(3).random(
        outs[False][0].shape, np.float32))

    def loss(lc):
        def f(means2d, conics, colors, opacities):
            img, alp, _ = rasterize_to_pixels_v2(
                means2d, conics, colors, opacities, args[4], args[5],
                48, 32, tile_size=16, isect_capacity=8192,
                cutoff_mode=cutoff, log_composite=lc,
            )
            return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)
        return f

    gv = jax.grad(loss(True), argnums=(0, 1, 2, 3))(*args[:4])
    gr = jax.grad(loss(False), argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(["means2d", "conics", "colors", "opacities"],
                          gv, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=2e-3,
                                   err_msg=name)


def test_v2_empty_scene(rng):
    C, N, W, H, CH = 1, 16, 32, 32, 3
    means2d = jnp.zeros((C, N, 2))
    conics = jnp.tile(jnp.asarray([0.1, 0.0, 0.1]), (C, N, 1))
    colors = jnp.ones((C, N, CH))
    opacities = jnp.ones((C, N))
    depths = jnp.ones((C, N))
    radii = jnp.zeros((C, N), jnp.int32)
    bg = jnp.asarray([[0.25, 0.5, 0.75]])
    img, alp, meta = rasterize_to_pixels_v2(
        means2d, conics, colors, opacities, depths, radii, W, H,
        tile_size=16, isect_capacity=1024, backgrounds=bg,
    )
    assert int(meta["n_isects"]) == 0
    np.testing.assert_allclose(alp, 0.0)
    np.testing.assert_allclose(
        img, np.broadcast_to(np.asarray(bg)[:, None, None, :], img.shape)
    )


def test_v2_tile_masks(rng):
    """Disabled tiles render nothing (reference rasterize masks arg)."""
    C, W, H, CH = 1, 32, 32, 3
    img, alp, img_ref, alp_ref, args, bg = _run_both(
        rng, C=C, N=100, W=W, H=H, CH=CH
    )
    tw = th = 2
    masks = jnp.zeros((C, th, tw), bool).at[:, 0, 0].set(True)
    img_m, alp_m, _ = rasterize_to_pixels_v2(
        *args, W, H, tile_size=16, isect_capacity=8192, backgrounds=bg,
        masks=masks,
    )
    # top-left tile matches the unmasked render; the rest is background
    np.testing.assert_allclose(img_m[:, :16, :16], img[:, :16, :16], atol=1e-5)
    np.testing.assert_allclose(alp_m[:, 16:, :], 0.0)
    np.testing.assert_allclose(
        img_m[:, 16:, 16:],
        np.broadcast_to(np.asarray(bg)[:, None, None, :], (C, 16, 16, CH)),
        atol=1e-6,
    )


def test_v2_culling_grad_invariant(rng):
    """Elongated splats spanning many tiles trigger the ellipse tile
    culling; gradients must still match the oracle exactly (the culled
    intersections are routed to the virtual overflow tile so the
    reduction's rank==id alignment holds)."""
    C, W, H, CH, N = 1, 96, 64, 3, 60
    means2d = np.stack(
        [rng.random((C, N)) * W, rng.random((C, N)) * H], axis=-1
    ).astype(np.float32)
    # strongly anisotropic conics: thin diagonal ellipses with big radii
    th = rng.random((C, N)) * np.pi
    l1 = np.full((C, N), 0.005, np.float32)   # long axis (var ~200)
    l2 = np.full((C, N), 2.0, np.float32)     # short axis
    ct, st = np.cos(th), np.sin(th)
    a = l1 * ct * ct + l2 * st * st
    c = l1 * st * st + l2 * ct * ct
    b = (l1 - l2) * ct * st
    conics = np.stack([a, b, c], -1).astype(np.float32)
    colors = rng.random((C, N, CH)).astype(np.float32)
    opacities = (0.2 + 0.7 * rng.random((C, N))).astype(np.float32)
    depths = (0.5 + rng.random((C, N))).astype(np.float32)
    radii = np.full((C, N), 45, np.int32)  # AABB covers most of the image
    args = tuple(map(jnp.asarray, (means2d, conics, colors, opacities)))
    depths, radii = jnp.asarray(depths), jnp.asarray(radii)
    tgt = jnp.asarray(np.random.default_rng(5).random((C, H, W, CH), np.float32))

    def loss_v2(means2d, conics, colors, opacities):
        img, alp, _ = rasterize_to_pixels_v2(
            means2d, conics, colors, opacities, depths, radii, W, H,
            tile_size=16, isect_capacity=1 << 14,
        )
        return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)

    def loss_ref(means2d, conics, colors, opacities):
        img, alp = rasterize_to_pixels_ref(
            means2d, conics, colors, opacities, depths, radii, W, H, 16,
        )
        return jnp.sum((img - tgt) ** 2) + 0.3 * jnp.sum(alp**2)

    np.testing.assert_allclose(loss_v2(*args), loss_ref(*args), rtol=1e-4)
    gv = jax.grad(loss_v2, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["means2d", "conics", "colors", "opacities"], gv, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=5e-3, err_msg=name
        )


def test_v2_absgrad(rng):
    """absgrad = per-gaussian sum of |per-pixel xy gradient contribution|
    (reference bwd.cu:232-234): it upper-bounds the |signed| gradient and
    differs from it whenever per-pixel contributions cancel."""
    C, W, H, CH, N = 1, 48, 32, 3, 120
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=C, N=N, W=W, H=H, CH=CH
    )
    args = tuple(map(jnp.asarray, (means2d, conics, colors, opacities)))
    depths, radii = jnp.asarray(depths), jnp.asarray(radii)
    tgt = jnp.asarray(np.random.default_rng(3).random((C, H, W, CH), np.float32))

    def loss(means2d, conics, colors, opacities, ag_probe):
        img, alp, _ = rasterize_to_pixels_v2(
            means2d, conics, colors, opacities, depths, radii, W, H,
            tile_size=16, isect_capacity=8192, absgrad_probe=ag_probe,
        )
        return jnp.sum((img - tgt) ** 2)

    ag_probe = jnp.zeros((C, N, 2), jnp.float32)
    gm, gab = jax.grad(loss, argnums=(0, 4))(*args, ag_probe)
    gm, gab = np.asarray(gm), np.asarray(gab)
    assert np.all(np.isfinite(gab))
    # upper bound property (up to float tolerance)
    assert np.all(gab >= np.abs(gm) - 1e-5)
    # and strictly larger somewhere (cancellation happens in real scenes)
    assert np.any(gab > np.abs(gm) + 1e-6)


def test_reduce_grads_layout_and_truncation(rng):
    """_reduce_grads in isolation: per-id sums from a crafted gbuf that
    respects the build invariant (rows of compact id r occupy
    [min(cum[r-1], ni), min(cum[r], ni)) after the id sort), including a
    capacity-truncated tail — the case end-detection reductions misalign."""
    from gscodec_studio_tpu.ops import raster_v2 as rv

    CH = 3
    nval = 6 + CH
    counts = np.array([3, 1, 4, 2, 5, 0, 0, 1], np.int32)  # compact order
    M = counts.size
    cum = np.cumsum(counts)
    total = int(cum[-1])
    for ni in (total, 7):  # exact fit and a truncating capacity
        kept = np.minimum(cum, ni) - np.minimum(
            np.concatenate([[0], cum[:-1]]), ni
        )
        cfg = rv.V2Cfg(
            C=1, tile_width=1, tile_height=1, tile_size=16, channels=CH,
            cap=4096, n=M, tiles_per_step=1, interpret=True, absgrad=False,
        )
        L = cfg.slot_cap * rv.K
        gbuf = np.zeros((cfg.d_g, L), np.float32)
        gbuf[6 + CH] = rv.PAD_ID
        # scatter each id's kept rows at arbitrary distinct columns
        cols = rng.permutation(L)[: int(kept.sum())]
        vals = rng.standard_normal((nval, int(kept.sum()))).astype(np.float32)
        ids_for_rows = np.repeat(np.arange(M), kept)
        gbuf[:nval, cols] = vals
        gbuf[6 + CH, cols] = ids_for_rows.astype(np.float32)
        # original-id mapping: compact id r came from original id perm[r]
        perm = rng.permutation(M).astype(np.float32)
        aux = dict(
            cum_i32=jnp.asarray(cum, jnp.int32),
            origid_s=jnp.asarray(perm),
            visible_s=jnp.asarray(counts > 0),
            n_isects=jnp.asarray(ni, jnp.int32),
        )
        v_flat, _ = rv._reduce_grads(cfg, jnp.asarray(gbuf), aux)
        v_flat = np.asarray(v_flat)
        expect = np.zeros((M, nval), np.float32)
        for r in range(M):
            sel = ids_for_rows == r
            expect[r] = vals[:, sel].sum(axis=1)
        # v_flat is in ORIGINAL order: original id perm[r] holds compact r
        np.testing.assert_allclose(
            v_flat[perm.astype(np.int64)], expect, rtol=1e-5, atol=1e-5
        )


def test_v2_soft_cutoff_close_to_exact(rng):
    """cutoff_mode='soft' (chunk-granular early-out, production default in
    the trainer) stays within the sub-1e-4-transmittance tail of the exact
    CUDA rule — fwd and grads (round-1 ADVICE: both modes need oracle
    coverage)."""
    C, W, H, CH = 1, 48, 32, 3
    means2d, conics, colors, opacities, depths, radii, bg = make_2d_scene(
        rng, C=C, N=200, W=W, H=H, CH=CH
    )
    args = tuple(map(jnp.asarray, (means2d, conics, colors, opacities)))
    depths, radii, bg = jnp.asarray(depths), jnp.asarray(radii), jnp.asarray(bg)
    # push opacities up so early termination actually engages
    args = args[:3] + (jnp.clip(args[3] * 1.6, 0, 1),)

    def loss(mode):
        def f(means2d, conics, colors, opacities):
            img, alp, _ = rasterize_to_pixels_v2(
                means2d, conics, colors, opacities, depths, radii, W, H,
                tile_size=16, isect_capacity=8192, backgrounds=bg,
                cutoff_mode=mode,
            )
            return jnp.sum(img * img) + 0.3 * jnp.sum(alp)

        return f

    le = loss("exact")(*args)
    ls = loss("soft")(*args)
    np.testing.assert_allclose(float(ls), float(le), rtol=2e-3)
    ge = jax.grad(loss("exact"), argnums=(0, 1, 2, 3))(*args)
    gs = jax.grad(loss("soft"), argnums=(0, 1, 2, 3))(*args)
    # grads of sub-eps-tail pairs are exactly what soft mode admits: a
    # <=1e-4-transmittance weight across a 256-pixel tile -> a few percent
    # of the max gradient at worst
    for name, a, b in zip(["means2d", "conics", "colors", "opac"], gs, ge):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=5e-2, err_msg=name
        )
