"""3DGS default densification strategy (slot-based, static shapes).

Behavioral spec: /root/reference/gsplat/strategy/default.py — screen-space
gradient accumulation (:203-261), duplicate/split growth (:264-310), opacity/
scale pruning (:313-340), periodic opacity reset (:195-201). Thresholds and
schedules match the reference defaults; the mechanics use the slot ops of
strategy/ops.py so everything jits at a fixed capacity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import DEAD_OPACITY_LOGIT
from gscodec_studio_tpu.strategy.base import Strategy
from gscodec_studio_tpu.strategy import ops


@dataclass(frozen=True)
class DefaultStrategy(Strategy):
    prune_opa: float = 0.005
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.15
    refine_scale2d_stop_iter: int = 0
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3000
    refine_every: int = 100
    pause_refine_after_reset: int = 0
    absgrad: bool = False
    revised_opacity: bool = False

    def initialize_state(self, cap: int, scene_scale: float):
        return {
            "grad2d": jnp.zeros(cap, jnp.float32),
            "count": jnp.zeros(cap, jnp.float32),
            "radii": jnp.zeros(cap, jnp.float32),
            "scene_scale": jnp.asarray(scene_scale, jnp.float32),
        }

    def update_state(self, state, info, v_means2d):
        """Accumulate normalized screen-space gradient magnitudes
        (default.py:203-261). v_means2d: [C, cap, 2] loss gradient wrt
        projected centers (absgrad -> pass |grad| accumulations instead)."""
        width, height, C = info["width"], info["height"], info["n_cameras"]
        radii = info["radii"]  # [C, cap]
        sel = radii > 0
        g = v_means2d * jnp.asarray(
            [width / 2.0 * C, height / 2.0 * C], v_means2d.dtype
        )
        norm = jnp.linalg.norm(g, axis=-1)  # [C, cap]
        state = dict(state)
        state["grad2d"] = state["grad2d"] + jnp.sum(
            jnp.where(sel, norm, 0.0), axis=0
        )
        state["count"] = state["count"] + jnp.sum(sel, axis=0).astype(jnp.float32)
        if self.refine_scale2d_stop_iter > 0:
            r = jnp.max(
                jnp.where(sel, radii, 0), axis=0
            ).astype(jnp.float32) / max(width, height)
            state["radii"] = jnp.maximum(state["radii"], r)
        return state

    def refine(self, params, opt_states, state, step, key):
        """Grow (duplicate + split) then prune; resets accumulators.
        Mirrors step_post_backward (default.py:152-201)."""
        cap = params["opacities"].shape[0]
        k_dup, k_split = jax.random.split(key)

        alive = params["opacities"] > DEAD_OPACITY_LOGIT + 1.0
        free = ~alive
        grads = state["grad2d"] / jnp.maximum(state["count"], 1.0)
        is_grad_high = grads > self.grow_grad2d
        is_small = (
            jnp.max(jnp.exp(params["scales"]), axis=-1)
            <= self.grow_scale3d * state["scene_scale"]
        )
        is_dupli = is_grad_high & is_small & alive
        is_split = is_grad_high & (~is_small) & alive
        if self.refine_scale2d_stop_iter > 0:
            is_split |= (state["radii"] > self.grow_scale2d) & alive

        # Duplicate into free slots.
        dst, ok = ops.allocate_slots(free, is_dupli)
        params, opt_states = ops.copy_to_slots(params, opt_states, dst)
        # Duplicated targets now carry live opacities — recompute the pool.
        free = params["opacities"] <= DEAD_OPACITY_LOGIT + 1.0

        # Split: second child into remaining free slots.
        dst2, ok2 = ops.allocate_slots(free, is_split)
        params, opt_states = ops.split_to_slots(
            params, opt_states, is_split, dst2, k_split, self.revised_opacity
        )

        # Prune.
        op = jax.nn.sigmoid(params["opacities"])
        is_prune = (op < self.prune_opa) & alive
        is_too_big = (
            jnp.max(jnp.exp(params["scales"]), axis=-1)
            > self.prune_scale3d * state["scene_scale"]
        )
        use_big = step > self.reset_every
        is_prune = jnp.where(use_big, is_prune | (is_too_big & alive), is_prune)
        params, opt_states = ops.remove_slots(params, opt_states, is_prune)

        state = dict(state)
        state["grad2d"] = jnp.zeros_like(state["grad2d"])
        state["count"] = jnp.zeros_like(state["count"])
        state["radii"] = jnp.zeros_like(state["radii"])
        return params, opt_states, state

    def maybe_reset_opacity(self, params, opt_states, step):
        """Opacity reset every ``reset_every`` steps (default.py:195-201);
        call from the trainer at the right steps (non-jit decision)."""
        alive = params["opacities"] > DEAD_OPACITY_LOGIT + 1.0
        return ops.reset_opacities(params, opt_states, 2 * self.prune_opa, alive)
