"""EWA splat projection: world-space 3D Gaussians -> per-camera 2D Gaussians.

TPU-native equivalent of the reference's fused projection kernels
(/root/reference/gsplat/cuda/csrc/fully_fused_projection_fwd.cu:60-190 and
include/proj.cuh). One fully vectorized [C, N] elementwise pass; XLA fuses the
whole chain and autodiff supplies the VJP (the reference hand-derives it in
fully_fused_projection_bwd.cu only because torch won't fuse).

Conventions (identical to the reference):
  - viewmats [C,4,4] are world->cam (OpenCV, +z forward).
  - conics are the upper triangle (a, b, c) of the inverse 2D covariance.
  - radii [C,N] int32; 0 marks a culled (invisible) Gaussian.
  - ``eps2d`` low-pass blur is added to the 2D covariance; with
    ``calc_compensations`` the opacity compensation
    sqrt(det(cov)/det(cov+eps2d I)) is returned (antialiased mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.quat import quat_scale_to_covar
from gscodec_studio_tpu.ops.transforms import pos_world_to_cam, covar_world_to_cam

CAMERA_MODELS = ("pinhole", "ortho", "fisheye")


def persp_proj(
    means: jnp.ndarray,  # [..., 3] camera-space
    covars: jnp.ndarray,  # [..., 3, 3] camera-space
    Ks: jnp.ndarray,  # [..., 3, 3]
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective EWA projection (proj.cuh:81-120): returns (means2d [...,2],
    covars2d [...,2,2]). The Jacobian is evaluated at a frustum-clamped point
    to bound the linearization error outside the view."""
    x, y, z = means[..., 0], means[..., 1], means[..., 2]
    fx, fy = Ks[..., 0, 0], Ks[..., 1, 1]
    cx, cy = Ks[..., 0, 2], Ks[..., 1, 2]

    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy

    rz = 1.0 / z
    rz2 = rz * rz
    tx = z * jnp.clip(x * rz, -lim_x_neg, lim_x_pos)
    ty = z * jnp.clip(y * rz, -lim_y_neg, lim_y_pos)

    # J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]  (2x3)
    zeros = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([fx * rz, zeros, -fx * tx * rz2], axis=-1),
            jnp.stack([zeros, fy * rz, -fy * ty * rz2], axis=-1),
        ],
        axis=-2,
    )  # [..., 2, 3]
    covars2d = jnp.einsum("...ij,...jk,...lk->...il", J, covars, J, precision=jax.lax.Precision.HIGHEST)
    means2d = jnp.stack([fx * x * rz + cx, fy * y * rz + cy], axis=-1)
    return means2d, covars2d


def ortho_proj(
    means: jnp.ndarray,
    covars: jnp.ndarray,
    Ks: jnp.ndarray,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthographic projection (proj.cuh:9-36)."""
    x, y = means[..., 0], means[..., 1]
    fx, fy = Ks[..., 0, 0], Ks[..., 1, 1]
    cx, cy = Ks[..., 0, 2], Ks[..., 1, 2]
    covars2d = covars[..., :2, :2] * (
        jnp.stack([fx, fy], axis=-1)[..., :, None]
        * jnp.stack([fx, fy], axis=-1)[..., None, :]
    )
    means2d = jnp.stack([fx * x + cx, fy * y + cy], axis=-1)
    return means2d, covars2d


def fisheye_proj(
    means: jnp.ndarray,
    covars: jnp.ndarray,
    Ks: jnp.ndarray,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equidistant fisheye projection (proj.cuh:200-240)."""
    x, y, z = means[..., 0], means[..., 1], means[..., 2]
    fx, fy = Ks[..., 0, 0], Ks[..., 1, 1]
    cx, cy = Ks[..., 0, 2], Ks[..., 1, 2]

    eps = 1e-7
    xy_len = jnp.sqrt(x * x + y * y) + eps
    theta = jnp.arctan2(xy_len, z + eps)
    means2d = jnp.stack(
        [x * fx * theta / xy_len + cx, y * fy * theta / xy_len + cy], axis=-1
    )

    x2 = x * x + eps
    y2 = y * y
    xy = x * y
    x2y2 = x2 + y2
    x2y2z2_inv = 1.0 / (x2y2 + z * z)
    b = jnp.arctan2(xy_len, z) / xy_len / x2y2
    a = z * x2y2z2_inv / x2y2
    J = jnp.stack(
        [
            jnp.stack([fx * (x2 * a + y2 * b), fx * xy * (a - b), -fx * x * x2y2z2_inv], axis=-1),
            jnp.stack([fy * xy * (a - b), fy * (y2 * a + x2 * b), -fy * y * x2y2z2_inv], axis=-1),
        ],
        axis=-2,
    )
    covars2d = jnp.einsum("...ij,...jk,...lk->...il", J, covars, J, precision=jax.lax.Precision.HIGHEST)
    return means2d, covars2d


_PROJ_FNS = {"pinhole": persp_proj, "ortho": ortho_proj, "fisheye": fisheye_proj}


def proj(
    means: jnp.ndarray,  # [C, N, 3] camera-space
    covars: jnp.ndarray,  # [C, N, 3, 3] camera-space
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    camera_model: str = "pinhole",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-parity standalone op (``_wrapper.py:141``): camera-space 3D ->
    image-space 2D. Returns (means2d [C,N,2], covars2d [C,N,2,2])."""
    if camera_model not in _PROJ_FNS:
        raise ValueError(f"unknown camera_model {camera_model!r}")
    return _PROJ_FNS[camera_model](means, covars, Ks[:, None], width, height)


def _inverse2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Stable closed-form inverse of [..., 2, 2] (utils.cuh ``inverse``)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 1, 1]
    det = a * c - b * b
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    inv = jnp.stack(
        [
            jnp.stack([c, -b], axis=-1),
            jnp.stack([-b, a], axis=-1),
        ],
        axis=-2,
    ) * inv_det[..., None, None]
    return jnp.where(det[..., None, None] == 0, jnp.zeros_like(inv), inv)


def _covar6_from_quat_scale(quats, scales):
    """Upper-triangular covariance components (xx,xy,xz,yy,yz,zz), fully
    elementwise — no 3x3 matmuls (TPU: keeps everything on the VPU with no
    tiny-matrix layout shuffles)."""
    q = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0, s1, s2 = scales[..., 0] ** 2, scales[..., 1] ** 2, scales[..., 2] ** 2
    xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return xx, xy, xz, yy, yz, zz


def _rotate_covar6(R, c6):
    """R Sigma R^T for per-camera R [C,3,3] and shared Sigma components
    [N] -> camera-frame components [C,N] — elementwise broadcasting of
    [C,1]x[1,N] products."""
    xx, xy, xz, yy, yz, zz = (v[None, :] for v in c6)
    r = [[R[:, i, j, None] for j in range(3)] for i in range(3)]

    def row(i):
        # (R Sigma) row i components
        a = r[i][0] * xx + r[i][1] * xy + r[i][2] * xz
        b = r[i][0] * xy + r[i][1] * yy + r[i][2] * yz
        c = r[i][0] * xz + r[i][1] * yz + r[i][2] * zz
        return a, b, c

    rows = [row(i) for i in range(3)]

    def entry(i, j):
        a, b, c = rows[i]
        return a * r[j][0] + b * r[j][1] + c * r[j][2]

    return (entry(0, 0), entry(0, 1), entry(0, 2),
            entry(1, 1), entry(1, 2), entry(2, 2))


def fully_fused_projection(
    means: jnp.ndarray,  # [N, 3]
    covars: Optional[jnp.ndarray],  # [N, 3, 3] or None
    quats: Optional[jnp.ndarray],  # [N, 4]
    scales: Optional[jnp.ndarray],  # [N, 3]
    viewmats: jnp.ndarray,  # [C, 4, 4]
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    opacities: Optional[jnp.ndarray] = None,  # [N] linear opacity
    elliptical: bool = False,  # radii as per-axis AABB half-widths [C,N,2]
):
    """Fused world->2D projection with culling, matching the reference op
    (``_wrapper.py:203`` / fully_fused_projection_fwd.cu).

    Returns (radii [C,N] int32, means2d [C,N,2], depths [C,N], conics [C,N,3],
    compensations [C,N] or None). radii==0 marks culled Gaussians; their other
    outputs are zeroed (the reference leaves them uninitialized — we zero for
    determinism).

    TPU note: instead of the packed [nnz] variant (reference
    fully_fused_projection_packed_fwd.cu) we always produce dense [C,N] with a
    radii mask — downstream tile binning compacts via the static-capacity
    intersection buffer, which is the idiomatic static-shape design. For the
    pinhole path everything is expanded into elementwise component math (no
    3x3 einsums) so XLA emits one fused VPU loop.
    """
    if camera_model == "pinhole" and covars is None:
        return _fused_projection_pinhole(
            means, quats, scales, viewmats, Ks, width, height, eps2d,
            near_plane, far_plane, radius_clip, calc_compensations,
            opacities, elliptical,
        )
    if covars is None:
        assert quats is not None and scales is not None
        covars = quat_scale_to_covar(quats, scales)  # [N, 3, 3]

    means_c = pos_world_to_cam(viewmats, means)  # [C, N, 3]
    covars_c = covar_world_to_cam(viewmats, covars)  # [C, N, 3, 3]
    depths = means_c[..., 2]  # [C, N]

    means2d, covars2d = proj(means_c, covars_c, Ks, width, height, camera_model)

    # Low-pass blur + antialiasing compensation (utils.cuh add_blur:30-37).
    det_orig = (
        covars2d[..., 0, 0] * covars2d[..., 1, 1]
        - covars2d[..., 0, 1] * covars2d[..., 1, 0]
    )
    covars2d = covars2d + eps2d * jnp.eye(2, dtype=covars2d.dtype)
    det = (
        covars2d[..., 0, 0] * covars2d[..., 1, 1]
        - covars2d[..., 0, 1] * covars2d[..., 1, 0]
    )
    compensations = jnp.sqrt(jnp.maximum(0.0, det_orig / jnp.maximum(det, 1e-30)))

    covars2d_inv = _inverse2x2(covars2d)
    conics = jnp.stack(
        [covars2d_inv[..., 0, 0], covars2d_inv[..., 0, 1], covars2d_inv[..., 1, 1]],
        axis=-1,
    )  # [C, N, 3]

    # 3-sigma radius from the max eigenvalue (fwd.cu:163-168); with
    # opacities given, tightened to the EXACT alpha-threshold extent
    # min(3, sqrt(2 ln(255 op))) * sigma — every pair beyond it satisfies
    # alpha = op*exp(-d^2/(2 v1)) < 1/255 and would be zeroed by the
    # rasterizer anyway, so this only removes dead intersections (the fix
    # for low-opacity ballooned splats flooding the isect buffer).
    b = 0.5 * (covars2d[..., 0, 0] + covars2d[..., 1, 1])
    v1 = b + jnp.sqrt(jnp.maximum(0.01, b * b - det))
    nsig = 3.0
    if opacities is not None:
        nsig = jnp.minimum(
            3.0,
            jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-30))),
        )[None, :]
        nsig = jnp.maximum(nsig, 0.0)
    if elliptical:
        # exact AABB of the nsig iso-ellipse: half-width along x is
        # nsig*sqrt(Sigma_00) (max |dx| on {d: 0.5 d^T Sigma^-1 d <=
        # nsig^2/2}) — far tighter than the circumscribed circle's square
        # for elongated splats, directly cutting binned tile count
        rx = jnp.ceil(nsig * jnp.sqrt(jnp.maximum(covars2d[..., 0, 0], 0.0)))
        ry = jnp.ceil(nsig * jnp.sqrt(jnp.maximum(covars2d[..., 1, 1], 0.0)))
    else:
        rx = ry = jnp.ceil(nsig * jnp.sqrt(v1))

    # Culling (fwd.cu:74-77, 155-183): near/far, det>0, radius_clip, image bounds.
    valid = (depths > near_plane) & (depths < far_plane) & (det > 0)
    valid &= jnp.maximum(rx, ry) > radius_clip
    x2d, y2d = means2d[..., 0], means2d[..., 1]
    valid &= (x2d + rx > 0) & (x2d - rx < width)
    valid &= (y2d + ry > 0) & (y2d - ry < height)

    if elliptical:
        radii = jnp.where(
            valid[..., None], jnp.stack([rx, ry], axis=-1), 0.0
        ).astype(jnp.int32)
    else:
        radii = jnp.where(valid, rx, 0.0).astype(jnp.int32)
    zero = jnp.zeros((), dtype=means2d.dtype)
    means2d = jnp.where(valid[..., None], means2d, zero)
    depths = jnp.where(valid, depths, zero)
    conics = jnp.where(valid[..., None], conics, zero)
    if calc_compensations:
        compensations = jnp.where(valid, compensations, zero)
        return radii, means2d, depths, conics, compensations
    return radii, means2d, depths, conics, None


def _fused_projection_pinhole(
    means, quats, scales, viewmats, Ks, width, height, eps2d, near_plane,
    far_plane, radius_clip, calc_compensations, opacities=None,
    elliptical=False,
):
    """Pinhole fast path: the entire chain as elementwise component math."""
    R = viewmats[:, :3, :3]  # [C, 3, 3]
    t = viewmats[:, :3, 3]  # [C, 3]
    mx, my, mz = means[:, 0][None], means[:, 1][None], means[:, 2][None]  # [1,N]
    xc = R[:, 0, 0, None] * mx + R[:, 0, 1, None] * my + R[:, 0, 2, None] * mz + t[:, 0, None]
    yc = R[:, 1, 0, None] * mx + R[:, 1, 1, None] * my + R[:, 1, 2, None] * mz + t[:, 1, None]
    zc = R[:, 2, 0, None] * mx + R[:, 2, 1, None] * my + R[:, 2, 2, None] * mz + t[:, 2, None]
    depths = zc  # [C, N]

    c6 = _covar6_from_quat_scale(quats, scales)  # [N] x6
    cxx, cxy, cxz, cyy, cyz, czz = _rotate_covar6(R, c6)  # [C, N] x6

    fx, fy = Ks[:, 0, 0, None], Ks[:, 1, 1, None]
    cx, cy = Ks[:, 0, 2, None], Ks[:, 1, 2, None]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    rz = 1.0 / zc
    rz2 = rz * rz
    tx = zc * jnp.clip(xc * rz, -lim_x_neg, lim_x_pos)
    ty = zc * jnp.clip(yc * rz, -lim_y_neg, lim_y_pos)

    # J = [[a0, 0, c0], [0, b1, c1]]
    a0 = fx * rz
    c0 = -fx * tx * rz2
    b1 = fy * rz
    c1 = -fy * ty * rz2
    cov00 = a0 * a0 * cxx + 2 * a0 * c0 * cxz + c0 * c0 * czz
    cov01 = a0 * b1 * cxy + a0 * c1 * cxz + c0 * b1 * cyz + c0 * c1 * czz
    cov11 = b1 * b1 * cyy + 2 * b1 * c1 * cyz + c1 * c1 * czz

    det_orig = cov00 * cov11 - cov01 * cov01
    cov00 = cov00 + eps2d
    cov11 = cov11 + eps2d
    det = cov00 * cov11 - cov01 * cov01
    compensations = jnp.sqrt(
        jnp.maximum(0.0, det_orig / jnp.maximum(det, 1e-30))
    )
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    conic_a = cov11 * inv_det
    conic_b = -cov01 * inv_det
    conic_c = cov00 * inv_det

    x2d = fx * xc * rz + cx
    y2d = fy * yc * rz + cy

    b = 0.5 * (cov00 + cov11)
    v1 = b + jnp.sqrt(jnp.maximum(0.01, b * b - det))
    nsig = 3.0
    if opacities is not None:
        # exact alpha-threshold extent (see fully_fused_projection)
        nsig = jnp.maximum(jnp.minimum(
            3.0,
            jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-30))),
        ), 0.0)[None, :]
    if elliptical:
        # per-axis AABB of the nsig iso-ellipse (see fully_fused_projection)
        rx = jnp.ceil(nsig * jnp.sqrt(jnp.maximum(cov00, 0.0)))
        ry = jnp.ceil(nsig * jnp.sqrt(jnp.maximum(cov11, 0.0)))
    else:
        rx = ry = jnp.ceil(nsig * jnp.sqrt(v1))

    valid = (depths > near_plane) & (depths < far_plane) & (det > 0)
    valid &= jnp.maximum(rx, ry) > radius_clip
    valid &= (x2d + rx > 0) & (x2d - rx < width)
    valid &= (y2d + ry > 0) & (y2d - ry < height)

    zero = jnp.zeros((), depths.dtype)
    if elliptical:
        radii = jnp.where(
            valid[..., None], jnp.stack([rx, ry], axis=-1), 0.0
        ).astype(jnp.int32)
    else:
        radii = jnp.where(valid, rx, 0.0).astype(jnp.int32)
    means2d = jnp.stack(
        [jnp.where(valid, x2d, zero), jnp.where(valid, y2d, zero)], axis=-1
    )
    conics = jnp.stack(
        [
            jnp.where(valid, conic_a, zero),
            jnp.where(valid, conic_b, zero),
            jnp.where(valid, conic_c, zero),
        ],
        axis=-1,
    )
    depths = jnp.where(valid, depths, zero)
    if calc_compensations:
        return radii, means2d, depths, conics, jnp.where(valid, compensations, zero)
    return radii, means2d, depths, conics, None
