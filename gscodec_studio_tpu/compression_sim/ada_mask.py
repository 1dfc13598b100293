"""Temperature-annealed learnable sparsity mask over shN.

Behavioral spec: /root/reference/gsplat/compression_simulation/ada_mask.py
AnnealingMask:6-61 — sigmoid(mask_logits / T) with T decaying exponentially
from start_temp to end_temp after annealing_start_iter; sparsity loss =
l1*mean(mask) + target-BCE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def annealing_temperature(
    step, total_iters=30_000, start_temp=5.0, end_temp=0.1,
    annealing_start_iter=10_000,
):
    progress = jnp.clip(
        (step - annealing_start_iter) / (total_iters - annealing_start_iter),
        0.0, 1.0,
    )
    temp = start_temp * jnp.exp(jnp.log(end_temp / start_temp) * progress)
    return jnp.where(step < annealing_start_iter, start_temp, temp)


def annealing_mask_apply(mask_logits, x, step, training=True, **temp_kw):
    """x [N, K, 3] * soft (train) or hard (eval) mask [N, 1, 1]."""
    if training:
        t = annealing_temperature(step, **temp_kw)
        mask = jax.nn.sigmoid(mask_logits / t)
    else:
        mask = (jax.nn.sigmoid(mask_logits) >= 0.5).astype(x.dtype)
    return x * mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))


def annealing_mask_sparsity_loss(
    mask_logits, step, lambda_l1=0.01, lambda_target=0.1,
    target_sparsity=0.2, **temp_kw,
):
    t = annealing_temperature(step, **temp_kw)
    mask = jax.nn.sigmoid(mask_logits / t)
    l1 = lambda_l1 * jnp.mean(mask)
    s = jnp.clip(jnp.mean(mask), 1e-6, 1 - 1e-6)
    bce = -(
        target_sparsity * jnp.log(s) + (1 - target_sparsity) * jnp.log(1 - s)
    )
    return l1 + lambda_target * bce


def binary_mask(mask_logits):
    return (jax.nn.sigmoid(mask_logits) >= 0.5).astype(jnp.float32)
