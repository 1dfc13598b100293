"""Per-image camera pose refinement and appearance modules.

Behavioral spec: /root/reference/examples/utils.py —
CameraOptModule (:13-50): learned per-image SE(3) deltas with the 6D
rotation parameterization (Zhou et al.); AppearanceOptModule (:52-116):
per-image embedding + view-direction MLP producing per-Gaussian color
offsets. Functional JAX modules: (init_params, apply).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt on two learned axes."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def camera_opt_init(n_images: int) -> jnp.ndarray:
    """Identity deltas: [n, 9] = 3 translation + 6D rotation (identity)."""
    base = jnp.zeros((n_images, 9))
    return base.at[:, 3].set(1.0).at[:, 7].set(1.0)


def camera_opt_apply(
    params: jnp.ndarray, camtoworlds: jnp.ndarray, image_ids: jnp.ndarray
) -> jnp.ndarray:
    """Apply per-image deltas: c2w' = c2w @ [R|t] (utils.py:38-50)."""
    p = params[image_ids]  # [B, 9]
    t = p[..., :3]
    R = rotation_6d_to_matrix(p[..., 3:])
    delta = jnp.zeros(p.shape[:-1] + (4, 4)).at[..., 3, 3].set(1.0)
    delta = delta.at[..., :3, :3].set(R).at[..., :3, 3].set(t)
    return jnp.matmul(camtoworlds, delta, precision=_HI)


def appearance_opt_init(
    key: jax.Array,
    n_images: int,
    feature_dim: int = 32,
    embed_dim: int = 16,
    sh_degree: int = 3,
    mlp_width: int = 64,
    mlp_depth: int = 2,
) -> Dict:
    """Per-image embeddings + MLP head (utils.py:52-80)."""
    from gscodec_studio_tpu.ops.sh import num_sh_bases

    in_dim = embed_dim + feature_dim + num_sh_bases(sh_degree)
    params = {"embeds": jnp.zeros((n_images, embed_dim))}
    dims = [in_dim] + [mlp_width] * (mlp_depth - 1) + [3]
    layers = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        scale = (2.0 / dims[i]) ** 0.5
        layers.append(
            {
                "w": scale * jax.random.normal(k, (dims[i], dims[i + 1])),
                "b": jnp.zeros(dims[i + 1]),
            }
        )
    params["mlp"] = layers
    return params


def appearance_opt_apply(
    params: Dict,
    features: jnp.ndarray,  # [N, feature_dim]
    image_ids: jnp.ndarray,  # [C]
    dirs: jnp.ndarray,  # [C, N, 3]
    sh_degree: int,
    sh_degree_max: Optional[int] = None,
) -> jnp.ndarray:
    """Returns per-(camera, gaussian) colors [C, N, 3] (utils.py:82-116).

    The MLP input width is fixed at ``sh_degree_max``; when training warms
    up the active ``sh_degree``, the unused higher bases are zero
    (utils.py:105-109)."""
    from gscodec_studio_tpu.ops.sh import num_sh_bases, sh_basis

    C, N = dirs.shape[:2]
    embeds = params["embeds"][image_ids]  # [C, e]
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
    )
    basis = sh_basis(sh_degree, dirs)  # [C, N, K_use]
    if sh_degree_max is not None and sh_degree_max != sh_degree:
        K_full = num_sh_bases(sh_degree_max)
        basis = jnp.concatenate(
            [basis,
             jnp.zeros((C, N, K_full - basis.shape[-1]), basis.dtype)],
            axis=-1,
        )
    h = jnp.concatenate(
        [
            jnp.broadcast_to(embeds[:, None, :], (C, N, embeds.shape[-1])),
            jnp.broadcast_to(features[None], (C, N, features.shape[-1])),
            basis,
        ],
        axis=-1,
    )
    for i, layer in enumerate(params["mlp"]):
        h = jnp.einsum("cnd,de->cne", h, layer["w"], precision=_HI) + layer["b"]
        if i + 1 < len(params["mlp"]):
            h = jax.nn.relu(h)
    return h
