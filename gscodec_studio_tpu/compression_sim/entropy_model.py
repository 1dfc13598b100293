"""Learned entropy models for rate estimation.

Fully-factorized prior (Balle et al., "Variational image compression with a
scale hyperprior", appendix 6.1) — behavioral spec:
/root/reference/gsplat/compression_simulation/entropy_model.py:11-254. The
per-channel logit-CDF chain (softplus matrices, biases, tanh-gated factors)
gives P(x in [x-Q/2, x+Q/2]) = sigmoid(c(x+Q/2)) - sigmoid(c(x-Q/2)); bits =
-log2. The reference batches via a x32 reshape trick to feed its GPU bmm;
here one vmapped einsum over channels suffices — XLA maps it onto the MXU.

Also the conditional Gaussian model (``gaussian_bits``) used by the
hash-grid-conditioned variant (entropy_model.py Entropy_gaussian:313-345).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LIKELIHOOD_BOUND = 1e-6


def init_factorized(
    key: jax.Array,
    channel: int,
    filters: Sequence[int] = (3, 3, 3),
    init_scale: float = 10.0,
) -> Dict:
    """Parameters of the factorized CDF chain (entropy_model.py:24-47)."""
    dims = (1,) + tuple(filters) + (1,)
    scale = init_scale ** (1.0 / (len(filters) + 1))
    matrices, biases, factors = [], [], []
    for i in range(len(filters) + 1):
        init = math.log(math.expm1(1.0 / scale / dims[i + 1]))
        matrices.append(jnp.full((channel, dims[i + 1], dims[i]), init, jnp.float32))
        key, k = jax.random.split(key)
        biases.append(
            jax.random.uniform(k, (channel, dims[i + 1], 1), minval=-0.5, maxval=0.5)
        )
        if i < len(filters):
            factors.append(jnp.zeros((channel, dims[i + 1], 1), jnp.float32))
    return {"matrices": matrices, "biases": biases, "factors": factors}


def _logits_cumulative(params: Dict, logits: jnp.ndarray) -> jnp.ndarray:
    """logits: [C, 1, N] -> [C, 1, N] through the monotone chain."""
    n_layers = len(params["matrices"])
    for i in range(n_layers):
        m = jax.nn.softplus(params["matrices"][i])  # [C, f_out, f_in]
        logits = jnp.einsum("cij,cjn->cin", m, logits) + params["biases"][i]
        if i < len(params["factors"]):
            f = jnp.tanh(params["factors"][i])
            logits = logits + f * jnp.tanh(logits)
    return logits


def factorized_bits(params: Dict, x: jnp.ndarray, q_step: float) -> jnp.ndarray:
    """x: [N, C] quantized values -> estimated bits [N, C]."""
    xt = x.T[:, None, :]  # [C, 1, N]
    half = 0.5 * q_step
    lower = _logits_cumulative(params, xt - half)
    upper = _logits_cumulative(params, xt + half)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    likelihood = jnp.abs(
        jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
    )
    likelihood = _lower_bound(likelihood, LIKELIHOOD_BOUND)
    bits = -jnp.log2(likelihood)  # [C, 1, N]
    return bits[:, 0, :].T


def factorized_likelihood_table(
    params: Dict, symbols: jnp.ndarray, q_step: float, lower_bd: float
) -> jnp.ndarray:
    """PMF over integer symbol levels for test-time arithmetic coding
    (entropy_coding_compression.py uses the learned CDF the same way).

    symbols: [L] integer levels; returns [C, L] probabilities."""
    x = lower_bd + symbols.astype(jnp.float32) * q_step  # [L]
    C = params["matrices"][0].shape[0]
    xt = jnp.broadcast_to(x[None, None, :], (C, 1, x.shape[0]))
    lower = _logits_cumulative(params, xt - 0.5 * q_step)
    upper = _logits_cumulative(params, xt + 0.5 * q_step)
    sign = -jnp.sign(lower + upper)
    likelihood = jnp.abs(
        jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
    )
    return jnp.maximum(likelihood[:, 0, :], LIKELIHOOD_BOUND)


@jax.custom_vjp
def _lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    # Pass gradients that push x up even when clamped (entropy_model.py
    # LowerBound:347-390).
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


_lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def gaussian_bits(
    x: jnp.ndarray, mean: jnp.ndarray, scale: jnp.ndarray, q_step: float
) -> jnp.ndarray:
    """Bits under a per-element Normal(mean, scale) (Entropy_gaussian
    :313-345): P = Phi((x+Q/2-mu)/s) - Phi((x-Q/2-mu)/s)."""
    scale = jnp.clip(scale, 1e-5, None)
    upper = jax.scipy.stats.norm.cdf(x + 0.5 * q_step, mean, scale)
    lower = jax.scipy.stats.norm.cdf(x - 0.5 * q_step, mean, scale)
    likelihood = _lower_bound(jnp.abs(upper - lower), LIKELIHOOD_BOUND)
    return -jnp.log2(likelihood)
