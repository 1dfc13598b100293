"""SpacetimeGaussian densification strategy (slot-based).

Behavioral spec: /root/reference/gsplat/strategy/STG_Strategy.py (:74-240)
and modified_stg.py: the Default grow/prune machinery plus
  * a densification-count cap (``desicnt``) per Gaussian — STG limits how
    often each splat may be densified (STG_Strategy emaxxxx counters);
  * post-refine temporal freezing: once refinement stops, omega (rotation
    velocity) gradients are masked for low-motion splats and rotation
    gradients for the rest (:106-111);
  * periodic z-bounds pruning (:112-118) and min/max world-bounds pruning.

Gradient masking is expressed functionally: ``mask_gradients`` is applied by
the trainer to the grads before the optimizer step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import DEAD_OPACITY_LOGIT
from gscodec_studio_tpu.strategy.default import DefaultStrategy
from gscodec_studio_tpu.strategy import ops


@dataclass(frozen=True)
class STGStrategy(DefaultStrategy):
    desicnt: int = 6  # max densifications per splat
    zmask_every: int = 1000
    z_far: float = 4.5
    motion_threshold: float = 0.3  # |motion| below which omega freezes

    def initialize_state(self, cap: int, scene_scale: float):
        state = super().initialize_state(cap, scene_scale)
        state["densify_count"] = jnp.zeros(cap, jnp.int32)
        return state

    def refine(self, params, opt_states, state, step, key):
        # Respect the per-splat densification budget (STG desicnt): splats
        # that hit the cap no longer register high gradients.
        budget_ok = state["densify_count"] < self.desicnt
        state = dict(state)
        grads_masked = jnp.where(budget_ok, state["grad2d"], 0.0)
        densified = (
            grads_masked / jnp.maximum(state["count"], 1.0) > self.grow_grad2d
        )
        inner = dict(state, grad2d=grads_masked)
        params, opt_states, inner = super().refine(
            params, opt_states, inner, step, key
        )
        state.update(
            {k: inner[k] for k in ("grad2d", "count", "radii")}
        )
        state["densify_count"] = state["densify_count"] + densified.astype(
            jnp.int32
        )
        return params, opt_states, state

    def mask_gradients(self, params, grads, step):
        """Post-refine temporal freezing (STG_Strategy.py:106-111): freeze
        omega for low-motion splats, rotation for the others."""
        if "omega" not in grads:
            return grads
        low_motion = (
            jnp.linalg.norm(params.get("motion", jnp.zeros((1, 9)))[:, :3], axis=-1)
            < self.motion_threshold
        )
        frozen = jax.lax.select(
            jnp.asarray(step >= self.refine_stop_iter),
            jnp.ones((), jnp.bool_),
            jnp.zeros((), jnp.bool_),
        )
        grads = dict(grads)
        omega_mask = jnp.where(frozen & low_motion, 0.0, 1.0 * jnp.ones_like(low_motion, jnp.float32))
        quat_mask = jnp.where(frozen & (~low_motion), 0.0, 1.0 * jnp.ones_like(low_motion, jnp.float32))
        grads["omega"] = grads["omega"] * omega_mask[:, None]
        grads["quats"] = grads["quats"] * quat_mask[:, None]
        return grads

    def prune_bounds(self, params, opt_states, maxbounds=None, minbounds=None,
                     z_far=None):
        """z / world-bounds pruning (STG_Strategy.py:112-118,
        removeminmax)."""
        kill = params["means"][:, 2] > (z_far or self.z_far)
        if maxbounds is not None:
            kill |= jnp.any(params["means"] > jnp.asarray(maxbounds), axis=-1)
        if minbounds is not None:
            kill |= jnp.any(params["means"] < jnp.asarray(minbounds), axis=-1)
        alive = params["opacities"] > DEAD_OPACITY_LOGIT + 1.0
        return ops.remove_slots(params, opt_states, kill & alive)
