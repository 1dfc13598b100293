"""Training losses: L1 + SSIM (+PSNR metric).

The reference uses the external ``fused_ssim`` CUDA package for the loss
(simple_trainer.py:30,950-952) and torchmetrics for eval. Here SSIM is
implemented directly in JAX with an 11x11 Gaussian window (the standard
Wang et al. formulation both of those implement); XLA fuses the depthwise
convolutions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur on [B, H, W, C] (SAME padding).

    precision=HIGHEST is load-bearing: TPU convs default to bf16 passes, and
    SSIM's variance terms E[x^2] - E[x]^2 catastrophically cancel at bf16 —
    the metric (and its gradients) silently collapse at real image sizes.
    """
    C = img.shape[-1]
    k = win.shape[0]
    x = jnp.moveaxis(img, -1, 1)  # [B, C, H, W]
    kern_h = jnp.tile(win.reshape(1, 1, k, 1), (C, 1, 1, 1))
    kern_w = jnp.tile(win.reshape(1, 1, 1, k), (C, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NCHW", "OIHW", "NCHW"))
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=C, precision=hi,
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=C, precision=hi,
    )
    return jnp.moveaxis(x, 1, -1)


def _ssim_cs(img0, img1, max_val, win_size, sigma):
    """Per-pixel (ssim_map, contrast-structure_map)."""
    win = jnp.asarray(_gaussian_window(win_size, sigma))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu0 = _filter2d(img0, win)
    mu1 = _filter2d(img1, win)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = _filter2d(img0 * img0, win) - mu00
    s11 = _filter2d(img1 * img1, win) - mu11
    s01 = _filter2d(img0 * img1, win) - mu01
    cs = (2 * s01 + c2) / (s00 + s11 + c2)
    lum = (2 * mu01 + c1) / (mu00 + mu11 + c1)
    return lum * cs, cs


def ssim(
    img0: jnp.ndarray,  # [B, H, W, C] in [0, 1]
    img1: jnp.ndarray,
    max_val: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over the batch (differentiable)."""
    sm, _ = _ssim_cs(img0, img1, max_val, win_size, sigma)
    return jnp.mean(sm)


# Wang et al. 2003 per-scale weights
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    img0: jnp.ndarray,  # [B, H, W, C] in [0, 1]
    img1: jnp.ndarray,
    max_val: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    weights=_MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM (the structural-similarity family member QMIV's
    IVSSIM builds on; reported by utils/gsc_metrics as msssim_y). Uses as
    many scales as the image size supports."""
    n = len(weights)
    h, w = img0.shape[1:3]
    while n > 1 and min(h, w) // (2 ** (n - 1)) < win_size:
        n -= 1
    ws = jnp.asarray(weights[:n]) / sum(weights[:n])
    vals = []
    a, b = img0, img1
    for i in range(n):
        sm, cs = _ssim_cs(a, b, max_val, win_size, sigma)
        vals.append(jnp.mean(sm if i == n - 1 else cs))
        if i + 1 < n:
            pool = lambda x: jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            a, b = pool(a), pool(b)
    v = jnp.stack(vals)
    return jnp.prod(jnp.sign(v) * jnp.abs(v) ** ws)


def l1(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img0 - img1))


def psnr(img0: jnp.ndarray, img1: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((img0 - img1) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def combined_loss(render, target, ssim_lambda: float = 0.2):
    """(1-l)*L1 + l*(1-SSIM) — the 3DGS loss (simple_trainer.py:949-952)."""
    return (1.0 - ssim_lambda) * l1(render, target) + ssim_lambda * (
        1.0 - ssim(render, target)
    )
