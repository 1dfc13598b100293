"""LPIPS perceptual metric (reference: torchmetrics LPIPS with AlexNet
features, simple_trainer.py:699-713).

JAX implementation of the LPIPS-linear architecture (Zhang et al. 2018):
AlexNet conv features at 5 taps, channel-wise unit-normalized, squared
difference, learned 1x1 linear heads, spatial mean, summed over taps.

This environment has no network egress and ships no pretrained weights, so
the metric is **weights-gated**: pass ``weights`` loaded from an `.npz`
(convert once with ``convert_torch_lpips`` on a machine that has
torchvision + lpips) or call ``lpips_available()`` first. Everything else
— architecture, normalization, scaling — matches the reference metric so
numbers are comparable once weights are supplied.

npz layout: conv{i}_w [kh, kw, cin, cout], conv{i}_b [cout] for the 5
AlexNet feature convs, lin{i}_w [ci] for the 5 linear heads.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature extractor config: (out_ch, kernel, stride, pad), with
# taps after each ReLU and 3x3/2 max-pools after taps 0, 1 and 4.
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}
# ImageNet-style input scaling used by LPIPS (shift/scale in [-1, 1] space)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS_PATH = os.environ.get(
    "GSC_LPIPS_WEIGHTS", os.path.expanduser("~/.cache/gsc/lpips_alex.npz")
)


def lpips_available(path: str = DEFAULT_WEIGHTS_PATH) -> bool:
    return os.path.exists(path)


def load_lpips_weights(path: str = DEFAULT_WEIGHTS_PATH) -> Dict:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {path}. This zero-egress image "
            "ships no pretrained nets; convert them once elsewhere with "
            "gscodec_studio_tpu.training.lpips.convert_torch_lpips and "
            "point GSC_LPIPS_WEIGHTS at the npz."
        )
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def _features(weights: Dict, x: jnp.ndarray):
    """x: [B, H, W, 3] in [0, 1] -> list of 5 tap activations."""
    h = (x * 2.0 - 1.0 - _SHIFT) / _SCALE
    taps = []
    for i, (cout, k, stride, pad) in enumerate(_ALEX):
        h = jax.lax.conv_general_dilated(
            h, weights[f"conv{i}_w"], (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + weights[f"conv{i}_b"]
        h = jax.nn.relu(h)
        taps.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID",
            )
    return taps


def lpips(
    img0: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
    img1: jnp.ndarray,
    weights: Dict,
) -> jnp.ndarray:
    """Scalar LPIPS distance averaged over the batch."""
    t0 = _features(weights, img0)
    t1 = _features(weights, img1)
    total = jnp.float32(0.0)
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a * jax.lax.rsqrt(
            jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10
        )
        nb = b * jax.lax.rsqrt(
            jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10
        )
        d = (na - nb) ** 2  # [B, h, w, c]
        w = jnp.maximum(weights[f"lin{i}_w"], 0.0)  # lpips clamps to >= 0
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def convert_torch_lpips(out_path: str) -> None:
    """One-time converter (needs `lpips` + torchvision with downloaded
    weights — run OUTSIDE this container): dumps the AlexNet feature convs
    and LPIPS linear heads to the npz layout above."""
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="alex")
    feats = net.net.slice1, net.net.slice2, net.net.slice3, net.net.slice4, \
        net.net.slice5
    out = {}
    conv_idx = 0
    for sl in feats:
        for m in sl:
            if m.__class__.__name__ == "Conv2d":
                w = m.weight.detach().numpy()  # [cout, cin, kh, kw]
                out[f"conv{conv_idx}_w"] = np.transpose(w, (2, 3, 1, 0))
                out[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
                conv_idx += 1
    for i, lin in enumerate(net.lins):
        out[f"lin{i}_w"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1)
        )
    np.savez(out_path, **out)
