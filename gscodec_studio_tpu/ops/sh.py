"""Spherical-harmonics color evaluation (Sloan fast basis, degree <= 4).

Behavioral spec: /root/reference/gsplat/cuda/include/spherical_harmonics.cuh:12-101
(same constants/sign convention, so trained checkpoints interchange). The
reference evaluates per-thread scalar chains; here we build the full basis
matrix [..., K] and contract against coeffs [..., K, 3] with one einsum — the
contraction lands on the MXU for large N.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH basis values. dirs [..., 3] (not necessarily unit) ->
    [..., (degree+1)^2]."""
    if not 0 <= degree <= 4:
        raise ValueError(f"degree must be in [0, 4], got {degree}")
    shape = dirs.shape[:-1]
    ones = jnp.ones(shape, dtype=dirs.dtype)
    out = [0.2820947917738781 * ones]
    if degree >= 1:
        inorm = 1.0 / jnp.maximum(jnp.linalg.norm(dirs, axis=-1), 1e-12)
        x = dirs[..., 0] * inorm
        y = dirs[..., 1] * inorm
        z = dirs[..., 2] * inorm
        out += [-0.48860251190292 * y, 0.48860251190292 * z, -0.48860251190292 * x]
    if degree >= 2:
        z2 = z * z
        fTmp0B = -1.092548430592079 * z
        fC1 = x * x - y * y
        fS1 = 2.0 * x * y
        out += [
            0.5462742152960395 * fS1,  # pSH4
            fTmp0B * y,  # pSH5
            0.9461746957575601 * z2 - 0.3153915652525201,  # pSH6
            fTmp0B * x,  # pSH7
            0.5462742152960395 * fC1,  # pSH8
        ]
    if degree >= 3:
        fTmp0C = -2.285228997322329 * z2 + 0.4570457994644658
        fTmp1B = 1.445305721320277 * z
        fC2 = x * fC1 - y * fS1
        fS2 = x * fS1 + y * fC1
        out += [
            -0.5900435899266435 * fS2,  # pSH9
            fTmp1B * fS1,  # pSH10
            fTmp0C * y,  # pSH11
            z * (1.865881662950577 * z2 - 1.119528997770346),  # pSH12
            fTmp0C * x,  # pSH13
            fTmp1B * fC1,  # pSH14
            -0.5900435899266435 * fC2,  # pSH15
        ]
    if degree >= 4:
        pSH6 = out[6]
        pSH12 = out[12]
        fTmp0D = z * (-4.683325804901025 * z2 + 2.007139630671868)
        fTmp1C = 3.31161143515146 * z2 - 0.47308734787878
        fTmp2B = -1.770130769779931 * z
        fC3 = x * fC2 - y * fS2
        fS3 = x * fS2 + y * fC2
        out += [
            0.6258357354491763 * fS3,  # pSH16
            fTmp2B * fS2,  # pSH17
            fTmp1C * fS1,  # pSH18
            fTmp0D * y,  # pSH19
            1.984313483298443 * z * pSH12 - 1.006230589874905 * pSH6,  # pSH20
            fTmp0D * x,  # pSH21
            fTmp1C * fC1,  # pSH22
            fTmp2B * fC2,  # pSH23
            0.6258357354491763 * fC3,  # pSH24
        ]
    basis = [jnp.broadcast_to(b, shape).astype(dirs.dtype) for b in out]
    return jnp.stack(basis, axis=-1)


def spherical_harmonics(
    degrees_to_use: int,
    dirs: jnp.ndarray,  # [..., 3]
    coeffs: jnp.ndarray,  # [..., K, 3]
    masks: Optional[jnp.ndarray] = None,  # [...] bool
) -> jnp.ndarray:
    """SH -> RGB colors (reference op ``_wrapper.py:47``). K may exceed
    (degrees_to_use+1)^2; extra coefficients are ignored. ``masks`` zeroes
    hidden Gaussians (skips work in the reference; here it keeps grads clean).
    """
    k_used = num_sh_bases(degrees_to_use)
    assert coeffs.shape[-2] >= k_used, (coeffs.shape, k_used)
    basis = sh_basis(degrees_to_use, dirs)  # [..., k_used]
    colors = jnp.einsum("...k,...kc->...c", basis, coeffs[..., :k_used, :])
    if masks is not None:
        colors = jnp.where(masks[..., None], colors, 0.0)
    return colors
