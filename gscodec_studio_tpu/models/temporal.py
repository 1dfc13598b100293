"""Dynamic (temporal) Gaussian splats — SpacetimeGaussian-style
parameterization.

Behavioral spec: /root/reference/examples/simple_trainer_dyngs.py:231-261
(params), :506-569 (forward): per-splat temporal radial basis opacity
o(t) = o * exp(-((t - trbf_center) / (sqrt(2) * trbf_scale))^2), cubic
polynomial motion mu(t) = mu + m1 dt + m2 dt^2 + m3 dt^3, and linear
rotation q(t) = normalize(q + omega dt). Slicing at a fixed t produces an
ordinary static splat dict, so the whole static rasterizer/codec stack
applies unchanged (per-frame extraction for the video codec,
dyngs:1158-1271).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import (
    create_splats,
    DEAD_OPACITY_LOGIT,
)


def create_dyn_splats(
    points: np.ndarray,
    rgbs: Optional[np.ndarray] = None,
    cap: Optional[int] = None,
    feature_dim: int = 9,
    seed: int = 0,
    init_opacity: float = 0.1,
    init_scale: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Static base + temporal params (dyngs:231-261): trbf_center/scale,
    motion [9] (3 polynomial degrees x 3), omega [4], plus feature channels
    for the view/time-dependent color head (colors, features_dir,
    features_time)."""
    base = create_splats(
        points, rgbs, cap=cap, sh_degree=0, init_opacity=init_opacity,
        init_scale=init_scale, feature_dim=None, seed=seed,
    )
    cap = base["means"].shape[0]
    rng = np.random.default_rng(seed + 1)
    splats = {
        "means": base["means"],
        "scales": base["scales"],
        "quats": base["quats"],
        "opacities": base["opacities"],
        "trbf_center": jnp.asarray(rng.random(cap).astype(np.float32)),
        "trbf_scale": jnp.zeros((cap,), jnp.float32),  # exp() -> 1
        "motion": jnp.zeros((cap, 9), jnp.float32),
        "omega": jnp.zeros((cap, 4), jnp.float32),
        "colors": base["sh0"].reshape(cap, 3),
        "features_dir": jnp.zeros((cap, 3), jnp.float32),
        "features_time": jnp.zeros((cap, 3), jnp.float32),
    }
    return splats


def trbf(dt: jnp.ndarray, trbf_scale: jnp.ndarray) -> jnp.ndarray:
    """Temporal radial basis (dyngs trbfunction, :509-514)."""
    s = jnp.exp(trbf_scale)
    x = dt / (jnp.sqrt(2.0) * jnp.maximum(s, 1e-6))
    return jnp.exp(-(x * x))


def slice_at_time(
    splats: Dict[str, jnp.ndarray], t: jnp.ndarray
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Evaluate the temporal model at ``t`` in [0, 1]:
    returns (static-like params {means, quats, scales, opacities(logit)},
    trbf output [cap] for visibility masking/features)."""
    dt = t - splats["trbf_center"]  # [cap]
    tw = trbf(dt, splats["trbf_scale"])

    m = splats["motion"]
    dt1 = dt[:, None]
    means_t = (
        splats["means"]
        + m[:, 0:3] * dt1
        + m[:, 3:6] * (dt1 * dt1)
        + m[:, 6:9] * (dt1 * dt1 * dt1)
    )
    quats_t = splats["quats"] + splats["omega"] * dt1

    # Temporal opacity: sigmoid(logit) * trbf -> fold into the logit domain
    # is impossible exactly; the renderer consumes linear opacity, so return
    # the modulation separately and let callers multiply after sigmoid.
    out = {
        "means": means_t,
        "quats": quats_t,
        "scales": splats["scales"],
        "opacities": splats["opacities"],
    }
    return out, tw


def dyn_colors(
    splats: Dict[str, jnp.ndarray],
    dirs: jnp.ndarray,  # [cap, 3] normalized view dirs (gauss - campos)
    tw: jnp.ndarray,  # [cap] trbf output
) -> jnp.ndarray:
    """Time/view-conditioned per-splat features (dyngs rasterize_splats
    :506-524): base color + dir feature * <dir> + time feature * trbf."""
    d = dirs * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-12)
    )
    return (
        splats["colors"]
        + splats["features_dir"] * d
        + splats["features_time"] * tw[:, None]
    )


def dyn_features(
    splats: Dict[str, jnp.ndarray], dt: jnp.ndarray
) -> jnp.ndarray:
    """9-channel per-splat feature vector for the CNN color decoder
    (STG path: colors_precomp = cat(color, dir, dt * time),
    simple_trainer_STG.py:531). ``dt`` = t - trbf_center [cap]."""
    return jnp.concatenate(
        [
            splats["colors"],
            splats["features_dir"],
            jax.lax.stop_gradient(dt)[:, None] * splats["features_time"],
        ],
        axis=-1,
    )


def sandwich_init(key: jax.Array) -> Dict[str, jnp.ndarray]:
    """'Sandwich' rgb decoder (helper/STG/helper_model.py Sandwich):
    two 1x1 convs (12 -> 6 -> 3, no bias) on the specular branch."""
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (12, 6)) * (2.0 / 12.0) ** 0.5,
        "w2": jax.random.normal(k2, (6, 3)) * (2.0 / 6.0) ** 0.5,
    }


def sandwich_apply(
    params: Dict[str, jnp.ndarray],
    feat: jnp.ndarray,  # [C, H, W, 9] rendered feature map
    rays: jnp.ndarray,  # [C, H, W, 6] per-pixel (origin, dir)
) -> jnp.ndarray:
    """result = sigmoid(albedo + mlp2(relu(mlp1(cat(spec, time, rays)))))
    — 1x1 convs are per-pixel matmuls (channel-last einsum on the MXU)."""
    albedo, spec, timef = feat[..., 0:3], feat[..., 3:6], feat[..., 6:9]
    h = jnp.concatenate([spec, timef, rays], axis=-1)  # [C, H, W, 12]
    h = jax.nn.relu(jnp.einsum("chwi,ij->chwj", h, params["w1"]))
    h = jnp.einsum("chwi,ij->chwj", h, params["w2"])
    return jax.nn.sigmoid(albedo + h)


def get_rays(
    camtoworld: jnp.ndarray,  # [4, 4]
    K: jnp.ndarray,  # [3, 3]
    width: int,
    height: int,
) -> jnp.ndarray:
    """Per-pixel (origin, normalized direction) [H, W, 6] in world space
    (simple_trainer_STG.py get_rays :959-1005)."""
    x = (jnp.arange(width, dtype=jnp.float32) + 0.5 - K[0, 2]) / K[0, 0]
    y = (jnp.arange(height, dtype=jnp.float32) + 0.5 - K[1, 2]) / K[1, 1]
    xx = jnp.broadcast_to(x[None, :], (height, width))
    yy = jnp.broadcast_to(y[:, None], (height, width))
    d_cam = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # [H, W, 3]
    d_world = jnp.einsum("ij,hwj->hwi", camtoworld[:3, :3], d_cam)
    d_world = d_world / jnp.maximum(
        jnp.linalg.norm(d_world, axis=-1, keepdims=True), 1e-12
    )
    o = jnp.broadcast_to(camtoworld[:3, 3], (height, width, 3))
    return jnp.concatenate([o, d_world], axis=-1)


def extract_frame(splats: Dict[str, jnp.ndarray], t: float,
                  visibility_eps: float = 0.05) -> Dict[str, np.ndarray]:
    """Per-frame static splats for the sequence codec (dyngs:1158-1271):
    bake motion/rotation at t, fold the temporal opacity into the logit, and
    keep only temporally-visible splats."""
    params, tw = slice_at_time(splats, jnp.asarray(t, jnp.float32))
    op_lin = jax.nn.sigmoid(splats["opacities"]) * tw
    keep = np.asarray(op_lin > visibility_eps) & np.asarray(
        splats["opacities"] > DEAD_OPACITY_LOGIT + 1.0
    )
    op_lin = np.clip(np.asarray(op_lin), 1e-7, 1 - 1e-7)
    logit = np.log(op_lin / (1 - op_lin)).astype(np.float32)
    out = {
        "means": np.asarray(params["means"]),
        "quats": np.asarray(params["quats"]),
        "scales": np.asarray(params["scales"]),
        "opacities": logit,
        "sh0": np.asarray(splats["colors"]).reshape(-1, 1, 3),
        "shN": np.zeros((len(logit), 0, 3), np.float32),
    }
    return {k: v[keep] for k, v in out.items()}
