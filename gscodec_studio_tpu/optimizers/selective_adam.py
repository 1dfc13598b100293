"""SelectiveAdam: Adam whose update/moment step only applies to Gaussians
visible in the current batch (Taming-3DGS).

Equivalent of the reference's fused CUDA kernel
(/root/reference/gsplat/cuda/csrc/adam.cu:30-41 wrapped by
gsplat/optimizers/selective_adam.py:6-88). On TPU this is a ~10-line optax
transformation: the masking fuses into the update elementwise chain, no
custom kernel needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SelectiveAdamState(NamedTuple):
    count: jnp.ndarray
    mu: object
    nu: object


def selective_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam where moments and updates are frozen for rows whose
    ``visibility`` (passed via update's extra arg) is 0.

    Usage: ``opt.update(grads, state, params, visibility=vis)`` where ``vis``
    is [N] (broadcast over trailing dims).
    """

    def init_fn(params):
        # mu and nu must be DISTINCT buffers: the jitted train step donates
        # optimizer state, and donating one buffer twice (aliased pytrees)
        # is an XLA error.
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return SelectiveAdamState(jnp.zeros((), jnp.int32), mu, nu)

    def update_fn(updates, state, params=None, *, visibility=None):
        del params
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def vis_mask(g):
            if visibility is None:
                return jnp.ones((), g.dtype)
            return visibility.reshape(
                visibility.shape + (1,) * (g.ndim - visibility.ndim)
            ).astype(g.dtype)

        def upd(g, mu, nu):
            v = vis_mask(g)
            new_mu = jnp.where(v > 0, b1 * mu + (1 - b1) * g, mu)
            new_nu = jnp.where(v > 0, b2 * nu + (1 - b2) * g * g, nu)
            # Raw moments, no bias correction: the reference CUDA kernel
            # (gsplat/cuda/csrc/adam.cu:35-37) applies the update with the
            # raw mu/nu, so we match its training dynamics exactly.
            step = -lr * new_mu / (jnp.sqrt(new_nu) + eps)
            return jnp.where(v > 0, step, 0.0), new_mu, new_nu

        out = jax.tree_util.tree_map(upd, updates, state.mu, state.nu)
        steps = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda t: isinstance(t, tuple))
        mus = jax.tree_util.tree_map(lambda t: t[1], out,
                                     is_leaf=lambda t: isinstance(t, tuple))
        nus = jax.tree_util.tree_map(lambda t: t[2], out,
                                     is_leaf=lambda t: isinstance(t, tuple))
        return steps, SelectiveAdamState(count, mus, nus)

    return optax.GradientTransformation(init_fn, update_fn)
