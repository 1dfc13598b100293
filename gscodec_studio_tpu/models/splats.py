"""Gaussian-splat model: a plain pytree (dict) of parameter arrays.

Equivalent of the reference's ``torch.nn.ParameterDict`` creation
(/root/reference/examples/simple_trainer.py:329-412), with one structural
difference dictated by XLA: the arrays are allocated at a **static capacity**
``cap`` with per-slot liveness expressed through opacity (dead slots have
opacity logit ~ -inf, so they render as nothing and strategies may recycle
them). This is what makes densification recompile-free on TPU.

Parameterization (identical to the reference):
  means     [cap, 3]   world positions
  quats     [cap, 4]   wxyz (unnormalized)
  scales    [cap, 3]   log-scales
  opacities [cap]      logits
  sh0       [cap, 1, 3]  DC spherical harmonics
  shN       [cap, K-1, 3] higher-order SH
(or ``features``/``colors`` for the feature-rendering path.)
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

C0 = 0.28209479177387814  # SH DC basis


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """(examples/utils.py rgb_to_sh)"""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


DEAD_OPACITY_LOGIT = -15.0  # sigmoid(-15) ~ 3e-7 -> culled by opacity filter


def knn_mean_dist(points: np.ndarray, k: int = 4) -> np.ndarray:
    """sqrt(mean squared distance to the k-1 nearest neighbors), host-side
    (init only; replaces torch-based examples/utils.py knn)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k)
    return np.sqrt((d[:, 1:] ** 2).mean(axis=-1))


def create_splats(
    points: np.ndarray,  # [N, 3]
    rgbs: Optional[np.ndarray] = None,  # [N, 3] in [0, 1]
    cap: Optional[int] = None,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_scale: float = 1.0,
    feature_dim: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Build the splat param pytree from an SfM/random point cloud
    (simple_trainer.py:329-412 semantics). ``cap`` >= N allocates extra dead
    slots for densification; defaults to N (no headroom)."""
    N = points.shape[0]
    if cap is None:
        cap = N
    assert cap >= N
    rng = np.random.default_rng(seed)
    if rgbs is None:
        rgbs = rng.random((N, 3))

    dist = np.maximum(knn_mean_dist(points, 4), 1e-7)
    scales = np.log(dist * init_scale)[:, None].repeat(3, axis=1)

    def padded(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=np.float32)
        out[:N] = x
        return jnp.asarray(out)

    opacities = np.full(N, math.log(init_opacity / (1 - init_opacity)), np.float32)
    quats = rng.random((cap, 4)).astype(np.float32)  # live+dead slots

    splats = {
        "means": padded(points.astype(np.float32)),
        "scales": padded(scales.astype(np.float32), fill=-10.0),
        "quats": jnp.asarray(quats),
        "opacities": padded(opacities, fill=DEAD_OPACITY_LOGIT),
    }
    if feature_dim is None:
        K = (sh_degree + 1) ** 2
        sh0 = np.zeros((cap, 1, 3), np.float32)
        sh0[:N, 0] = np.asarray(rgb_to_sh(jnp.asarray(rgbs.astype(np.float32))))
        splats["sh0"] = jnp.asarray(sh0)
        splats["shN"] = jnp.zeros((cap, K - 1, 3), jnp.float32)
    else:
        splats["features"] = jnp.asarray(
            rng.random((cap, feature_dim)).astype(np.float32)
        )
        colors = np.zeros((cap, 3), np.float32)
        colors[:N] = np.log(np.clip(rgbs, 1e-4, 1 - 1e-4) / (1 - np.clip(rgbs, 1e-4, 1 - 1e-4)))
        splats["colors"] = jnp.asarray(colors)
    return splats


# Per-param learning rates (simple_trainer.py:370-376); means is additionally
# multiplied by scene_scale by the trainer.
PARAM_LRS = {
    "means": 1.6e-4,
    "scales": 5e-3,
    "quats": 1e-3,
    "opacities": 5e-2,
    "sh0": 2.5e-3,
    "shN": 2.5e-3 / 20,
    "features": 2.5e-3,
    "colors": 2.5e-3,
}


LOG_SCALE_FLOOR = -15.0  # exp(-15) ~ 3e-7 scene units: invisibly
# sub-pixel at any working distance. Round-5 forensics: scale_reg's
# always-positive gradient decays every render-unconstrained axis at
# constant Adam rate (~5e-3 logit/step), and by step 4000 of the 8k
# garden ladder ALL 360k splats carried a collapsed axis (log-scale
# -38, anisotropy up to 1e16), which drove reproducible non-finite
# means/quats/scales gradients (results/garden_ladder_r5/skips.jsonl).
# Flooring INSIDE the activation both keeps degenerate needles out of
# the projection/raster grad chain and zeroes the pointless decay
# gradient below the floor (clip has zero grad there).


def splat_activations(splats: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
    """(means, quats, exp(scales), sigmoid(opacities)) — the linear-domain
    arrays the renderer consumes (simple_trainer.py:752-762)."""
    return (
        splats["means"],
        splats["quats"],
        jnp.exp(jnp.maximum(splats["scales"], LOG_SCALE_FLOOR)),
        jax.nn.sigmoid(splats["opacities"]),
    )


def num_live(splats: Dict[str, jnp.ndarray], eps: float = 0.005) -> jnp.ndarray:
    """Count slots whose opacity exceeds the liveness threshold."""
    return jnp.sum(jax.nn.sigmoid(splats["opacities"]) > eps)
