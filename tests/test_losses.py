"""SSIM/L1/PSNR tests — SSIM cross-checked against skimage (independent
implementation of the same Wang et al. formulation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gscodec_studio_tpu.training.losses import ssim, l1, psnr, combined_loss


def test_ssim_identity(rng):
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_vs_numpy(rng):
    """Independent numpy/scipy transcription of the Wang et al. SSIM with an
    11x11 (sigma 1.5) Gaussian window, truncated-SAME like ours."""
    from scipy.signal import convolve2d

    a = rng.random((96, 96)).astype(np.float64)
    b = np.clip(a + 0.1 * rng.standard_normal((96, 96)), 0, 1)

    x = np.arange(11) - 5
    g1 = np.exp(-(x**2) / (2 * 1.5**2))
    g1 /= g1.sum()
    win = np.outer(g1, g1)

    def blur(img):
        return convolve2d(img, win, mode="same", boundary="fill")

    c1, c2 = 0.01**2, 0.03**2
    mu0, mu1 = blur(a), blur(b)
    s00 = blur(a * a) - mu0**2
    s11 = blur(b * b) - mu1**2
    s01 = blur(a * b) - mu0 * mu1
    ref = np.mean(
        ((2 * mu0 * mu1 + c1) * (2 * s01 + c2))
        / ((mu0**2 + mu1**2 + c1) * (s00 + s11 + c2))
    )
    ours = float(
        ssim(jnp.asarray(a[None, :, :, None], jnp.float32),
             jnp.asarray(b[None, :, :, None], jnp.float32))
    )
    assert ours == pytest.approx(ref, abs=2e-3)


def test_psnr(rng):
    a = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    assert float(psnr(a, a)) > 100
    b = jnp.clip(a + 0.1, 0, 1)
    assert 15 < float(psnr(a, b)) < 30


def test_combined_loss_zero_for_identical(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    assert float(combined_loss(img, img)) == pytest.approx(0.0, abs=1e-5)


def test_lpips_architecture(rng, tmp_path):
    """LPIPS plumbing with random weights: zero for identical inputs,
    positive for different ones, jit-safe (real numbers need the
    converted AlexNet weights, gated by design in this zero-egress env)."""
    import jax
    import jax.numpy as jnp

    from gscodec_studio_tpu.training import lpips as L

    w = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(L._ALEX):
        w[f"conv{i}_w"] = jnp.asarray(
            0.1 * rng.standard_normal((k, k, cin, cout)).astype(np.float32)
        )
        w[f"conv{i}_b"] = jnp.zeros((cout,), jnp.float32)
        w[f"lin{i}_w"] = jnp.asarray(
            rng.random(cout).astype(np.float32)
        )
        cin = cout
    a = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    f = jax.jit(lambda x, y: L.lpips(x, y, w))
    assert float(f(a, a)) < 1e-6
    assert float(f(a, b)) > 0.0

    # weights-gating raises a clear error
    import pytest

    with pytest.raises(FileNotFoundError):
        L.load_lpips_weights(str(tmp_path / "missing.npz"))


def test_ms_ssim(rng):
    import jax.numpy as jnp

    from gscodec_studio_tpu.training.losses import ms_ssim

    a = jnp.asarray(rng.random((1, 96, 128, 1)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 96, 128, 1)).astype(np.float32))
    assert float(ms_ssim(a, a)) > 0.999
    assert float(ms_ssim(a, b)) < float(ms_ssim(a, a))
    # small images drop scales instead of failing
    s_ = float(ms_ssim(a[:, :24, :24], a[:, :24, :24]))
    assert s_ > 0.999
