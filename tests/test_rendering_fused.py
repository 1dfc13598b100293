"""rasterization() through the fused backend: render modes and channel
chunking (the paths the trainer doesn't exercise)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.rendering import rasterization


def _scene(rng, N=160):
    means = jnp.asarray(((rng.random((N, 3)) - 0.5) * 3).astype(np.float32))
    quats = jnp.asarray(rng.standard_normal((N, 4)).astype(np.float32))
    scales = jnp.asarray(
        (0.02 + 0.06 * rng.random((N, 3))).astype(np.float32)
    )
    opac = jnp.asarray((0.2 + 0.7 * rng.random(N)).astype(np.float32))
    vm = np.eye(4, dtype=np.float32)
    vm[:3, 3] = [0, 0, 4.0]
    viewmats = jnp.asarray(vm[None])
    W, H = 64, 48
    f = 1.1 * W
    Ks = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    return means, quats, scales, opac, viewmats, Ks, W, H


@pytest.mark.parametrize("mode", ["D", "ED", "RGB+D", "RGB+ED"])
def test_fused_depth_render_modes(rng, mode):
    means, quats, scales, opac, viewmats, Ks, W, H = _scene(rng)
    colors = jnp.asarray(rng.random((160, 3)).astype(np.float32))
    kw = dict(
        sh_degree=None, isect_capacity=8192, render_mode=mode,
    )
    img_f, alp_f, _ = rasterization(
        means, quats, scales, opac, colors, viewmats, Ks, W, H,
        rasterizer="fused", **kw,
    )
    img_r, alp_r, _ = rasterization(
        means, quats, scales, opac, colors, viewmats, Ks, W, H,
        rasterizer="reference", **kw,
    )
    want_ch = {"D": 1, "ED": 1, "RGB+D": 4, "RGB+ED": 4}[mode]
    assert img_f.shape[-1] == want_ch
    np.testing.assert_allclose(img_f, img_r, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(alp_f, alp_r, rtol=1e-3, atol=1e-4)


def test_fused_channel_chunking(rng, monkeypatch):
    """Wide feature renders (sandwich STG at 35-40ch) BIN ONCE on the
    fused path — the v2 kernel parametrizes the channel count, unlike the
    reference's COLOR_DIM-templated CUDA that chunks at 32
    (rendering.py:528-556). Counts the kernel invocations to prove it."""
    from gscodec_studio_tpu.ops import raster_v2 as rv

    calls = []
    orig = rv.rasterize_to_pixels_v2

    def counted(*a, **k):
        calls.append(a[2].shape[-1])  # channel width per invocation
        return orig(*a, **k)

    monkeypatch.setattr(rv, "rasterize_to_pixels_v2", counted)

    means, quats, scales, opac, viewmats, Ks, W, H = _scene(rng, N=80)
    D = 40  # one call now (two chunks in the reference's scheme)
    colors = jnp.asarray(rng.random((80, D)).astype(np.float32))
    img_f, alp_f, _ = rasterization(
        means, quats, scales, opac, colors, viewmats, Ks, W, H,
        sh_degree=None, isect_capacity=8192, rasterizer="fused",
    )
    assert calls == [D], calls  # ONE build+rasterize at D=40
    img_r, alp_r, _ = rasterization(
        means, quats, scales, opac, colors, viewmats, Ks, W, H,
        sh_degree=None, isect_capacity=8192, rasterizer="reference",
    )
    assert img_f.shape[-1] == D
    np.testing.assert_allclose(img_f, img_r, rtol=1e-3, atol=1e-3)
