"""Differentiable quantization ops (STE).

Behavioral spec: /root/reference/gsplat/compression_simulation/ops.py —
``fake_quantize_ste`` (:39-54, round STE or additive-uniform-noise mode),
``log_transform``/``inverse_log_transform`` (:8-12), ``STE_binary`` (:78-95).
In JAX the straight-through estimator is the stop_gradient identity trick —
no custom autograd class needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def log_transform(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def inverse_log_transform(y):
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def fake_quantize_ste(
    x: jnp.ndarray,
    lower_bd: float,
    upper_bd: float,
    bitwidth: int = 8,
    q_type: str = "round",
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, float]:
    """Uniform fake quantization onto 2^bitwidth levels in [lower, upper].

    Returns (quantized value with straight-through gradients, q_step).
    ``q_type='noise'`` adds U(-q/2, q/2) instead (needs ``key``).
    """
    q_step = (upper_bd - lower_bd) / (2**bitwidth - 1)
    xc = jnp.clip(x, lower_bd, upper_bd)
    if q_type == "round":
        level = jnp.round((xc - lower_bd) / q_step)
        fq = level * q_step + lower_bd
        out = x + jax.lax.stop_gradient(fq - x)
    elif q_type == "noise":
        assert key is not None
        noise = jax.random.uniform(key, x.shape, minval=-0.5, maxval=0.5)
        out = xc + noise * q_step
    else:
        raise ValueError(q_type)
    return out, q_step


def ste_binary(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) in {-1, +1} with pass-through gradients inside [-1, 1]."""
    out = jnp.where(x >= 0, 1.0, -1.0)
    mask = (jnp.abs(x) <= 1.0).astype(x.dtype)
    return x * mask + jax.lax.stop_gradient(out - x * mask)
