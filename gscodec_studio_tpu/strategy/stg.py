"""SpacetimeGaussian densification strategies (slot-based).

Behavioral spec: /root/reference/gsplat/strategy/STG_Strategy.py and
modified_stg.py — the Default grow/prune machinery plus

  * a densification-count cap (``desicnt``) per Gaussian — STG limits how
    often each splat may be densified;
  * the accumulated omega-freeze mask (STG_Strategy.py:327-358
    ``_zero_omegabymotion``): omega (rotation velocity) stays live only
    for high-motion (sum |motion[:3]| > 0.3), mid-scale
    (0.2 < max scale < 0.6), opaque (sigmoid(opacity) > 0.7) splats; the
    mask is computed ONCE at ``freeze_start_iter`` (ref step 8001) and
    refreshed after pruning passes (:112-118), frozen omegas are ZEROED
    (:344), then omega grads are masked by the stored mask and rotation
    grads by its complement (:131-136);
  * periodic z-bounds pruning (:112-118) and min/max world-bounds pruning
    (``removeminmax``).

``ModifiedSTGStrategy`` (modified_stg.py) differs by (a) temporal-
visibility-aware stats — a splat's grad2d/count accumulate only at
timestamps where it is temporally visible (``t_vis_mask``,
modified_stg.py:92-102,206-216), so transient splats are not diluted by
frames they do not exist in — and (b) NO omega/rotation freezing
(modified_stg.py:118-121 returns before the freeze logic).

Gradient masking is expressed functionally: ``mask_gradients`` is applied
by the trainer to the grads before the optimizer step; the stored mask
lives in the strategy state (recomputed host-side in ``refine``).
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
    # omega-freeze rule thresholds (STG_Strategy.py:331-344)
    freeze_start_iter: int = 8001
    omega_motion_threshold: float = 0.3
    omega_scale_min: float = 0.2
    omega_scale_max: float = 0.6
    omega_opacity_min: float = 0.7

    def initialize_state(self, cap: int, scene_scale: float):
        state = super().initialize_state(cap, scene_scale)
        state["densify_count"] = jnp.zeros(cap, jnp.int32)
        # keep-mask for omega; all-keep until the freeze boundary
        state["omega_keep"] = jnp.ones(cap, jnp.bool_)
        return state

    # -- omega freeze (accumulated mask) ---------------------------------

    def compute_omega_mask(self, params):
        """_zero_omegabymotion's keep rule (STG_Strategy.py:333-343):
        keep omega only for high-motion, mid-scale, opaque splats."""
        scales = jnp.exp(params["scales"])
        motion_sum = jnp.sum(jnp.abs(params["motion"][:, :3]), axis=-1)
        smax = jnp.max(scales, axis=-1)
        opac = jax.nn.sigmoid(params["opacities"])
        return (
            (motion_sum > self.omega_motion_threshold)
            & (smax > self.omega_scale_min)
            & (smax < self.omega_scale_max)
            & (opac > self.omega_opacity_min)
        )

    def apply_omega_freeze(self, params, state):
        """Compute + store the mask and zero frozen omegas (the reference
        zeroes the VALUES too, :344). Called host-side at the freeze
        boundary and after pruning passes (:114,118,128)."""
        mask = self.compute_omega_mask(params)
        params = dict(params)
        params["omega"] = params["omega"] * mask[:, None].astype(
            params["omega"].dtype
        )
        state = dict(state, omega_keep=mask)
        return params, state

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
        # refresh the accumulated freeze mask once frozen (gaussian slots
        # may have been reused by the refine above — :114,118)
        params, state = jax.lax.cond(
            step >= self.freeze_start_iter,
            lambda p, s: self.apply_omega_freeze(p, s),
            lambda p, s: (dict(p), dict(s)),
            params, state,
        )
        return params, opt_states, state

    def mask_gradients(self, params, grads, step, state=None):
        """Post-freeze gradient masking (STG_Strategy.py:131-136): omega
        grads x keep-mask, rotation grads x its complement."""
        if "omega" not in grads:
            return grads
        if state is not None and "omega_keep" in state:
            keep = state["omega_keep"]
        else:  # stateless fallback: recompute the rule on the fly
            keep = self.compute_omega_mask(params)
        frozen = jnp.asarray(step >= self.freeze_start_iter)
        keep_f = keep.astype(jnp.float32)
        omega_mask = jnp.where(frozen, keep_f, 1.0)
        quat_mask = jnp.where(frozen, 1.0 - keep_f, 1.0)
        grads = dict(grads)
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


@dataclass(frozen=True)
class ModifiedSTGStrategy(STGStrategy):
    """Modified_STG_Strategy (modified_stg.py): temporal-visibility-aware
    densification stats and no omega/rotation freezing."""

    def update_state(self, state, info, v_means2d):
        # Accumulate grad2d/count only where the splat is temporally
        # visible at the rendered timestamps (modified_stg.py:92-102: the
        # forward's t_vis mask gates which gaussians exist this frame;
        # :206-216 then counts only radii>0 entries of those).
        t_vis = info.get("t_vis_mask")  # [C, N] or [N] bool
        if t_vis is not None:
            radii = info["radii"]
            if t_vis.ndim == 1:
                t_vis = jnp.broadcast_to(t_vis[None, :], radii.shape)
            info = dict(info, radii=jnp.where(t_vis, radii, 0))
        return super().update_state(state, info, v_means2d)

    def mask_gradients(self, params, grads, step, state=None):
        # modified_stg.py:118-121: no freezing — post-stop it simply
        # returns; grads flow to omega/quats throughout
        return grads

    def refine(self, params, opt_states, state, step, key):
        # identical budgeted grow/prune, but never freezes omega
        budget_ok = state["densify_count"] < self.desicnt
        state = dict(state)
        grads_masked = jnp.where(budget_ok, state["grad2d"], 0.0)
        densified = (
            grads_masked / jnp.maximum(state["count"], 1.0) > self.grow_grad2d
        )
        inner = dict(state, grad2d=grads_masked)
        params, opt_states, inner = super(STGStrategy, self).refine(
            params, opt_states, inner, step, key
        )
        state.update(
            {k: inner[k] for k in ("grad2d", "count", "radii")}
        )
        state["densify_count"] = state["densify_count"] + densified.astype(
            jnp.int32
        )
        return params, opt_states, state