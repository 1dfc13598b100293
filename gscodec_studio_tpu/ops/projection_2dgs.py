"""2DGS (surfel) projection: world-space 2D Gaussian disks -> per-camera
ray-transform matrices.

Behavioral spec: /root/reference/gsplat/cuda/csrc/fully_fused_projection_2dgs_fwd.cu:120-245
and the torch oracle _torch_impl_2dgs.py. Instead of a 2D covariance, each
surfel yields M = (KWH)^T where WH = [R s_x e_x, R s_y e_y, mean_cam]: applying
M^T to UV-homogeneous [u, v, -1] gives the camera ray hitting the surfel at
(u, v). Fully vectorized jnp; autodiff supplies the VJP (the reference
hand-writes it in fully_fused_projection_2dgs_bwd.cu).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops.quat import quat_to_rotmat
from gscodec_studio_tpu.ops.transforms import pos_world_to_cam

_HI = jax.lax.Precision.HIGHEST


def fully_fused_projection_2dgs(
    means: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3] (z ignored)
    viewmats: jnp.ndarray,  # [C, 4, 4]
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    opacities=None,  # [N] linear opacity -> exact alpha-threshold extent
    elliptical: bool = False,  # radii as per-axis AABB half-widths [C,N,2]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (radii [C,N] i32, means2d [C,N,2], depths [C,N],
    ray_transforms [C,N,3,3] (rows = KWH rows), normals [C,N,3])."""
    C = viewmats.shape[0]
    N = means.shape[0]

    R_wc = viewmats[:, :3, :3]  # [C, 3, 3]
    mean_c = pos_world_to_cam(viewmats, means)  # [C, N, 3]
    depths = mean_c[..., 2]

    R_g = quat_to_rotmat(quats)  # [N, 3, 3]
    # RS_camera = R_wc @ R_g @ diag(sx, sy, 1)  [C, N, 3, 3]
    RS = jnp.einsum("cij,njk->cnik", R_wc, R_g, precision=_HI)
    sdiag = jnp.stack(
        [scales[:, 0], scales[:, 1], jnp.ones_like(scales[:, 0])], axis=-1
    )  # [N, 3]
    RS = RS * sdiag[None, :, None, :]

    # WH columns: [RS[:,0], RS[:,1], mean_c]
    WH = jnp.stack([RS[..., :, 0], RS[..., :, 1], mean_c], axis=-1)  # [C,N,3,3]

    # K^T in the reference's column-major trick == standard K here:
    # M_rowmajor = (K @ WH)^T rows; equivalently M[i] = column i of (K WH).
    KWH = jnp.einsum("cij,cnjk->cnik", Ks, WH, precision=_HI)  # [C,N,3,3]
    M = KWH  # rows M0, M1, M2 = rows of KWH (the CUDA storage convention,
    #          fully_fused_projection_2dgs_fwd.cu:228-237)

    M0, M1, M2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    temp = jnp.asarray([1.0, 1.0, -1.0], M.dtype)
    distance = jnp.sum(temp * M2 * M2, axis=-1)  # [C, N]
    safe_dist = jnp.where(distance == 0, 1.0, distance)
    f = temp / safe_dist[..., None]
    mean2d = jnp.stack(
        [jnp.sum(f * M0 * M2, -1), jnp.sum(f * M1 * M2, -1)], axis=-1
    )
    tmp2 = jnp.stack(
        [jnp.sum(f * M0 * M0, -1), jnp.sum(f * M1 * M1, -1)], axis=-1
    )
    half_extend = mean2d * mean2d - tmp2
    nsig = 3.0
    if opacities is not None:
        # alpha = op * exp(-sigma) with sigma quadratic in the per-axis
        # extent, so pairs beyond nsig = sqrt(2 ln(255 op)) sigma are
        # provably below the 1/255 threshold (same proof as 3DGS; the
        # min() with the ray kernel only lowers alpha further)
        nsig = jnp.maximum(jnp.minimum(
            3.0,
            jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-30))),
        ), 0.0)[None, :]
    he = jnp.sqrt(jnp.maximum(1e-4, half_extend))  # [C, N, 2] per-axis
    if elliptical:
        rx = jnp.ceil(nsig * he[..., 0])
        ry = jnp.ceil(nsig * he[..., 1])
    else:
        rx = ry = jnp.ceil(nsig * jnp.max(he, axis=-1))

    valid = (depths > near_plane) & (depths < far_plane) & (distance != 0)
    valid &= jnp.maximum(rx, ry) > radius_clip
    x2d, y2d = mean2d[..., 0], mean2d[..., 1]
    valid &= (x2d + rx > 0) & (x2d - rx < width)
    valid &= (y2d + ry > 0) & (y2d - ry < height)

    # Normal = third column of RS_camera, flipped toward the camera.
    normal = RS[..., :, 2]  # [C, N, 3]
    flip = jnp.where(jnp.sum(-normal * mean_c, axis=-1) > 0, 1.0, -1.0)
    normal = normal * flip[..., None]

    if elliptical:
        radii = jnp.where(
            valid[..., None], jnp.stack([rx, ry], axis=-1), 0.0
        ).astype(jnp.int32)
    else:
        radii = jnp.where(valid, rx, 0.0).astype(jnp.int32)
    zero = jnp.zeros((), M.dtype)
    mean2d = jnp.where(valid[..., None], mean2d, zero)
    depths = jnp.where(valid, depths, zero)
    M = jnp.where(valid[..., None, None], M, zero)
    normal = jnp.where(valid[..., None], normal, zero)
    return radii, mean2d, depths, M, normal
