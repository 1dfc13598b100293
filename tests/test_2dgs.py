"""2DGS parity tests vs the upstream torch oracle
(_torch_impl_2dgs.py; model: reference tests/test_2dgs.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gscodec_studio_tpu.ops.rasterize_ref_2dgs import rasterize_to_pixels_2dgs_ref

from tests.reference_oracle import get_torch_impl_2dgs

ref2 = get_torch_impl_2dgs()
needs_ref = pytest.mark.skipif(ref2 is None, reason="reference oracle unavailable")


def t(x):
    import torch

    return torch.from_numpy(np.asarray(x))


@needs_ref
def test_projection_2dgs_parity(rng, test_scene):
    s = test_scene
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        jnp.asarray(s["means"]), jnp.asarray(s["quats"]),
        jnp.asarray(s["scales"]), jnp.asarray(s["viewmats"]),
        jnp.asarray(s["Ks"]), s["width"], s["height"],
    )
    radii_ref, means2d_ref, depths_ref, M_ref, normals_ref = (
        ref2._fully_fused_projection_2dgs(
            t(s["means"]), t(s["quats"]), t(s["scales"]), t(s["viewmats"]),
            t(s["Ks"]), s["width"], s["height"],
        )
    )
    valid = (np.asarray(radii) > 0) & (radii_ref.numpy() > 0)
    assert valid.sum() > 100
    np.testing.assert_allclose(
        np.asarray(means2d)[valid], means2d_ref.numpy()[valid], rtol=1e-3,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(depths)[valid], depths_ref.numpy()[valid], rtol=1e-4,
        atol=1e-4,
    )
    # the torch oracle returns (KWH)^T; CUDA (and we) store KWH rows
    np.testing.assert_allclose(
        np.asarray(M)[valid],
        M_ref.permute(0, 1, 3, 2).numpy()[valid],
        rtol=1e-3, atol=1e-3,
    )
    # The torch oracle's normals carry the (ignored) z-scale; the CUDA kernel
    # (and we) use the unit surfel axis — compare directions.
    a = np.asarray(normals)[valid]
    b = normals_ref.numpy()[valid]
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_rasterize_2dgs_outputs_sane(rng, test_scene):
    """Shape/AD sanity for the 2DGS oracle rasterizer on a small scene."""
    s = test_scene
    W, H = 40, 32
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        jnp.asarray(s["means"][:300]), jnp.asarray(s["quats"][:300]),
        jnp.asarray(s["scales"][:300]), jnp.asarray(s["viewmats"][:1]),
        jnp.asarray(s["Ks"][:1]), W, H,
    )
    opac = jnp.asarray((0.3 + 0.6 * rng.random((1, 300))).astype(np.float32))
    rgb = jnp.asarray(rng.random((1, 300, 3)).astype(np.float32))
    colors = jnp.concatenate([rgb, depths[..., None]], axis=-1)

    def render(colors, opac, M):
        out, alpha, out_n, distort, med = rasterize_to_pixels_2dgs_ref(
            means2d, M, colors, opac, normals, depths, radii, W, H
        )
        return out, alpha, out_n, distort, med

    out, alpha, out_n, distort, med = render(colors, opac, M)
    assert out.shape == (1, H, W, 4)
    assert alpha.shape == (1, H, W, 1)
    assert out_n.shape == (1, H, W, 3)
    assert float(alpha.max()) <= 1.0 + 1e-5
    assert float(alpha.max()) > 0.1
    assert np.isfinite(np.asarray(distort)).all()
    # median depth positive where opacity accumulated
    a = np.asarray(alpha[..., 0])
    m = np.asarray(med[..., 0])
    assert (m[a > 0.6] > 0).mean() > 0.9

    g = jax.grad(
        lambda c, o, M: jnp.sum(render(c, o, M)[0] ** 2)
        + jnp.sum(render(c, o, M)[3])
    )(colors, opac, M)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_rasterization_2dgs_api(rng, test_scene):
    from gscodec_studio_tpu.rendering import rasterization_2dgs

    s = test_scene
    W, H = 40, 32
    N = 200
    out = rasterization_2dgs(
        jnp.asarray(s["means"][:N]), jnp.asarray(s["quats"][:N]),
        jnp.asarray(s["scales"][:N]),
        jnp.asarray((0.3 + 0.5 * rng.random(N)).astype(np.float32)),
        jnp.asarray(rng.random((N, 1, 3)).astype(np.float32)),
        jnp.asarray(s["viewmats"][:1]), jnp.asarray(s["Ks"][:1]), W, H,
        sh_degree=0, render_mode="RGB+ED",
    )
    colors, alphas, normals, surf_normals, distort, median, meta = out
    assert colors.shape == (1, H, W, 4)
    assert normals.shape == (1, H, W, 3)
    assert surf_normals.shape == (1, H, W, 3)
    assert np.isfinite(np.asarray(colors)).all()


def test_2dgs_trainer_descends(rng):
    from tests.test_trainer import FakeParser, FakeDataset
    from gscodec_studio_tpu.training.trainer_2dgs import Config2DGS, Runner2DGS

    parser = FakeParser(rng, n_views=4, width=40, height=32, n_gt=80)
    cfg = Config2DGS(
        result_dir="/tmp/gsc_2dgs_test", max_steps=90, sh_degree=0,
        sh_degree_interval=1, capacity=120, isect_capacity=8192,
        steps_per_dispatch=15, normal_start_iter=5, dist_start_iter=5,
        normal_lambda=1e-3, dist_lambda=1e-4,
        rasterizer="reference",  # oracle: interpret-mode fused is slow
        # in-suite; the fused 2DGS kernel is covered by test_raster_v2_2dgs
    )
    runner = Runner2DGS(
        cfg, parser=parser, trainset=FakeDataset(parser, "train"),
        valset=FakeDataset(parser, "val"),
    )
    object.__setattr__(runner.strategy, "refine_start_iter", 1 << 30)
    losses = runner.train(log_every=0)
    # compare whole epochs (3 train views) to cancel per-view variance
    assert np.mean(losses[-30:]) < np.mean(losses[:30]) - 0.005
