"""MCMC Gaussian relocation (Eq. 9 of "3DGS as Markov Chain Monte Carlo").

Behavioral spec: /root/reference/gsplat/cuda/csrc/compute_relocation.cu:22-37
and its wrapper /root/reference/gsplat/relocation.py:10-49. The reference runs
a per-thread double loop over binomial terms; here the inner sums are
precomputed into a cumulative table so the op is one gather + one small
contraction — fully vectorized and jit-safe at a static ``n_max``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=8)
def _cum_binom_table(n_max: int) -> np.ndarray:
    """cum[n, k] = sum_{i=1..n} binom(i-1, k) * (-1)^k / sqrt(k+1).

    With this, denom(n, op) = sum_k cum[n, k] * op^(k+1) reproduces the
    reference's double loop exactly.
    """
    import math

    binoms = np.zeros((n_max, n_max), dtype=np.float64)
    for i in range(n_max):
        for k in range(i + 1):
            binoms[i, k] = math.comb(i, k)
    inner = binoms * ((-1.0) ** np.arange(n_max))[None, :] / np.sqrt(
        np.arange(1, n_max + 1)
    )[None, :]
    cum = np.zeros((n_max + 1, n_max), dtype=np.float64)
    cum[1:] = np.cumsum(inner, axis=0)
    return cum.astype(np.float32)


def compute_relocation(
    opacities: jnp.ndarray,  # [N] in (0, 1)
    scales: jnp.ndarray,  # [N, 3]
    ratios: jnp.ndarray,  # [N] int32 in [1, n_max]
    n_max: int = 51,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a Gaussian into ``ratios`` copies, preserving the rendered
    density: new opacity 1-(1-o)^(1/n), scales shrunk by the Eq. 9 factor.

    Returns (new_opacities [N], new_scales [N,3]).
    """
    cum = jnp.asarray(_cum_binom_table(n_max))  # [n_max+1, n_max]
    ratios = jnp.clip(ratios, 1, n_max)
    new_op = 1.0 - jnp.power(1.0 - opacities, 1.0 / ratios)
    # op^(k+1) for k = 0..n_max-1
    powers = jnp.power(new_op[:, None], jnp.arange(1, n_max + 1)[None, :])
    denom = jnp.sum(cum[ratios] * powers, axis=-1)
    coeff = opacities / jnp.where(denom == 0, 1.0, denom)
    new_scales = coeff[:, None] * scales
    return new_op, new_scales
