"""MPEG GSC quality metrics: RGB/YUV PSNR and SSIM.

Equivalent of the reference's QMIV-binary wrapper
(/root/reference/mpeg_gsc_utils/gsc_metric.py:8-60, which shells out to the
proprietary QMIV executable) — implemented directly: BT.709 RGB->YCbCr,
per-component PSNR, and the standard SSIM (training.losses.ssim).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float in [0,1] -> YCbCr (BT.709, full range)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    cb = (b - y) / 1.8556 + 0.5
    cr = (r - y) / 1.5748 + 0.5
    return np.stack([y, cb, cr], axis=-1)


def psnr_np(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(max_val**2 / max(mse, 1e-12))


def gsc_metrics(ref: np.ndarray, dist: np.ndarray) -> Dict[str, float]:
    """Per-pair metric set mirroring QMIV's report: RGB-PSNR, per-component
    YCbCr PSNR, and luma SSIM."""
    import jax.numpy as jnp

    from gscodec_studio_tpu.training.losses import ms_ssim, ssim

    out = {"psnr_rgb": psnr_np(ref, dist)}
    ry, dy = rgb_to_ycbcr(ref), rgb_to_ycbcr(dist)
    for i, comp in enumerate("y cb cr".split()):
        out[f"psnr_{comp}"] = psnr_np(ry[..., i], dy[..., i])
    a = jnp.asarray(ry[None, ..., :1], jnp.float32)
    b = jnp.asarray(dy[None, ..., :1], jnp.float32)
    out["ssim_y"] = float(ssim(a, b))
    # multi-scale structural similarity — the IVSSIM-slot metric in the
    # QMIV report
    out["msssim_y"] = float(ms_ssim(a, b))
    return out
