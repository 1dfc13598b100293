"""Quaternion / covariance math.

TPU-native equivalent of the reference's ``quat_scale_to_covar_preci`` op
(behavioral spec: /root/reference/gsplat/cuda/include/quat_scale_to_covar_preci.cuh:10-41
and the torch oracle /root/reference/gsplat/cuda/_torch_impl.py:41).

All functions are batched over arbitrary leading dims and fully differentiable
via JAX autodiff (the reference needs a hand-derived VJP; XLA fuses the
elementwise chain for free).

Quaternion convention: (w, x, y, z), not necessarily normalized on input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 3x3 covariance algebra must not go through bf16 MXU passes.
_HI = jax.lax.Precision.HIGHEST


def normalize_quat(quats: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis."""
    norm = jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return quats / jnp.maximum(norm, eps)


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] wxyz quaternions -> [..., 3, 3] rotation matrices.

    Input is normalized internally (matches reference behavior).
    """
    q = normalize_quat(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2),
        ],
        axis=-1,
    )
    return rot.reshape(quats.shape[:-1] + (3, 3))


def quat_scale_to_covar(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T.  quats [..., 4], scales [..., 3] -> [..., 3, 3]."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=_HI)


def quat_scale_to_preci(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Precision (inverse covariance) = R S^-2 R^T."""
    R = quat_to_rotmat(quats)
    P = R / scales[..., None, :]  # R @ diag(1/s)
    return jnp.matmul(P, jnp.swapaxes(P, -1, -2), precision=_HI)


def quat_scale_to_covar_preci(
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    compute_covar: bool = True,
    compute_preci: bool = True,
    triu: bool = False,
):
    """Covariance and/or precision from quaternion + scale.

    Mirrors the reference API (``gsplat/cuda/_wrapper.py:76``): returns
    (covars, precis); either may be None. With ``triu=True`` returns the upper
    triangle packed as [..., 6] in row-major order (xx, xy, xz, yy, yz, zz).
    """
    covars = precis = None
    if compute_covar:
        covars = quat_scale_to_covar(quats, scales)
        if triu:
            covars = _triu_pack(covars)
    if compute_preci:
        precis = quat_scale_to_preci(quats, scales)
        if triu:
            precis = _triu_pack(precis)
    return covars, precis


def _triu_pack(mat: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper triangle (row-major)."""
    return jnp.stack(
        [mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2],
         mat[..., 1, 1], mat[..., 1, 2], mat[..., 2, 2]],
        axis=-1,
    )


def triu_unpack(t: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (t[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
