"""Camera/appearance opt + bilateral grid + traj + gsc metrics smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gscodec_studio_tpu.utils.camera_opt import (
    camera_opt_init, camera_opt_apply, rotation_6d_to_matrix,
    appearance_opt_init, appearance_opt_apply,
)
from gscodec_studio_tpu.utils.bilagrid import (
    bilagrid_init, bilagrid_slice, bilagrid_tv_loss,
)
from gscodec_studio_tpu.datasets.traj import (
    generate_interpolated_path, generate_ellipse_path, generate_spiral_path,
)
from gscodec_studio_tpu.utils.gsc_metrics import gsc_metrics


def test_camera_opt_identity(rng):
    params = camera_opt_init(4)
    c2w = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)))
    out = camera_opt_apply(params, c2w, jnp.asarray([0, 1]))
    np.testing.assert_allclose(out, c2w, atol=1e-6)
    R = rotation_6d_to_matrix(jnp.asarray([[1.0, 0, 0, 0, 1, 0]]))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_appearance_opt_shapes(rng):
    key = jax.random.PRNGKey(0)
    p = appearance_opt_init(key, n_images=3, feature_dim=8, sh_degree=2)
    feats = jnp.asarray(rng.random((10, 8)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((2, 10, 3)).astype(np.float32))
    out = appearance_opt_apply(p, feats, jnp.asarray([0, 2]), dirs, 2)
    assert out.shape == (2, 10, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_bilagrid_identity_and_tv(rng):
    grids = bilagrid_init(2)
    rgb = jnp.asarray(rng.random((24, 32, 3)).astype(np.float32))
    out = bilagrid_slice(grids, 0, rgb)
    np.testing.assert_allclose(out, rgb, atol=1e-5)
    assert float(bilagrid_tv_loss(grids)) == 0.0
    g2 = grids + 0.1 * jax.random.normal(jax.random.PRNGKey(0), grids.shape)
    assert float(bilagrid_tv_loss(g2)) > 0


def test_trajectories(rng):
    c2w = np.tile(np.eye(4, dtype=np.float64), (6, 1, 1))
    c2w[:, 0, 3] = np.linspace(0, 5, 6)
    c2w[:, 2, 3] = 4.0
    for path in (
        generate_interpolated_path(c2w, 3),
        generate_ellipse_path(c2w, 24),
        generate_spiral_path(c2w, 24),
    ):
        assert path.shape[1:] == (4, 4)
        R = path[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(path), 1, 1)), atol=1e-6)


def test_gsc_metrics(rng):
    a = rng.random((32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal((32, 32, 3)), 0, 1).astype(np.float32)
    m = gsc_metrics(a, b)
    assert set(m) == {"psnr_rgb", "psnr_y", "psnr_cb", "psnr_cr",
                      "ssim_y", "msssim_y"}
    assert m["psnr_rgb"] > 20
    m_same = gsc_metrics(a, a)
    assert m_same["psnr_rgb"] > 100 and m_same["ssim_y"] > 0.999


def test_splat_viewer_serves(rng):
    """Self-contained HTTP viewer: page + rendered JPEG round trip."""
    import urllib.request

    from gscodec_studio_tpu.utils.viewer import SplatViewer

    calls = []

    def render_fn(c2w, K, w, h):
        calls.append(np.asarray(c2w))
        return rng.random((h, w, 3)).astype(np.float32)

    v = SplatViewer(render_fn, width=64, height=48)
    port = v.start(port=0)
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read()
        assert b"gscodec viewer" in page
        jpg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?theta=0.5&phi=0.2&radius=3",
            timeout=30,
        ).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
        assert len(calls) == 1 and calls[0].shape == (4, 4)
    finally:
        v.stop()
