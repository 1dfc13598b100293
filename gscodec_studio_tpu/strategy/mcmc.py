"""MCMC densification strategy ("3DGS as MCMC"), slot-based.

Behavioral spec: /root/reference/gsplat/strategy/mcmc.py — relocate dead
(opacity <= 0.005) Gaussians onto opacity-sampled live ones (:148-166), grow
the live set by 5% per refine up to cap_max (:169-187), and inject
covariance-shaped position noise each step (ops.py:360-386).

Slot translation: arrays are allocated at cap_max from the start; an explicit
``allocated`` mask tracks which slots correspond to the reference's growing
tensor. "Growth" allocates 5% more slots and relocates them onto live
Gaussians — the tensor never changes shape, so MCMC is the natural primary
strategy on TPU (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.strategy.base import Strategy
from gscodec_studio_tpu.strategy import ops


@dataclass(frozen=True)
class MCMCStrategy(Strategy):
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    refine_every: int = 100
    min_opacity: float = 0.005
    grow_factor: float = 1.05

    def initialize_state(self, cap: int, scene_scale: float, n_init: int = None):
        if n_init is None:
            n_init = cap
        allocated = jnp.arange(cap) < n_init
        return {
            "allocated": allocated,
            "scene_scale": jnp.asarray(scene_scale, jnp.float32),
        }

    def update_state(self, state, info, v_means2d):
        return state

    def refine(self, params, opt_states, state, step, key):
        """Relocate dead allocated slots + grow the allocated set by 5%
        (mcmc.py:103-187). Both reduce to one relocation pass over the union
        of (dead allocated) and (newly allocated) slots."""
        cap = params["opacities"].shape[0]
        allocated = state["allocated"]
        op = jax.nn.sigmoid(params["opacities"])
        dead_alloc = allocated & (op <= self.min_opacity)

        n_alloc = jnp.sum(allocated).astype(jnp.int32)
        n_target = jnp.minimum(
            jnp.asarray(cap, jnp.int32),
            jnp.ceil(n_alloc.astype(jnp.float32) * self.grow_factor).astype(
                jnp.int32
            ),
        )
        n_grow = jnp.maximum(n_target - n_alloc, 0)
        unalloc = ~allocated
        grow_rank = jnp.cumsum(unalloc) - 1
        grow = unalloc & (grow_rank < n_grow)

        relocate_set = dead_alloc | grow
        params, opt_states = ops.relocate_dead(
            params, opt_states, key, relocate_set, self.min_opacity
        )
        state = dict(state)
        state["allocated"] = allocated | grow
        return params, opt_states, state

    def inject_noise(self, params, key, lr, state=None):
        """Per-step position noise (mcmc.py step_post_backward:137-145)."""
        return ops.inject_noise_to_position(
            params, key, lr, self.noise_lr, self.min_opacity
        )
