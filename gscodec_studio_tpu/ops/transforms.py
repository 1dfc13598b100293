"""World <-> camera rigid transforms.

Behavioral spec: /root/reference/gsplat/cuda/include/transform.cuh (pos/covar
world-to-cam) and the op wrapper /root/reference/gsplat/cuda/_wrapper.py:174.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pos_world_to_cam(viewmats: jnp.ndarray, means: jnp.ndarray) -> jnp.ndarray:
    """Transform points into camera frames.

    viewmats: [C, 4, 4] world->cam; means: [N, 3]  ->  [C, N, 3].
    """
    R = viewmats[:, :3, :3]  # [C, 3, 3]
    t = viewmats[:, :3, 3]  # [C, 3]
    # [C, N, 3] = means [N,3] @ R^T [C,3,3] + t
    return jnp.einsum("cij,nj->cni", R, means, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]


def covar_world_to_cam(viewmats: jnp.ndarray, covars: jnp.ndarray) -> jnp.ndarray:
    """Rotate covariances into camera frames: R Sigma R^T.

    viewmats: [C, 4, 4]; covars: [N, 3, 3]  ->  [C, N, 3, 3].
    """
    R = viewmats[:, :3, :3]
    return jnp.einsum("cij,njk,clk->cnil", R, covars, R, precision=jax.lax.Precision.HIGHEST)


def world_to_cam(means: jnp.ndarray, covars: jnp.ndarray, viewmats: jnp.ndarray):
    """Reference-parity op (``_wrapper.py:174``): transform means and covars.

    means [N,3], covars [N,3,3], viewmats [C,4,4] ->
    (means_c [C,N,3], covars_c [C,N,3,3]).
    """
    return pos_world_to_cam(viewmats, means), covar_world_to_cam(viewmats, covars)
