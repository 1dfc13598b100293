"""2DGS trainer: surfel splats with normal-consistency + distortion losses.

Behavioral spec: /root/reference/examples/simple_trainer_2dgs.py (974 LoC):
the static trainer's loop where the render is ``rasterization_2dgs`` and the
loss adds
  normal_loss = lambda_n * (1 - dot(render_normal, surf_normal))
  dist_loss   = lambda_d * mean(render_distort)
with the reference's default lambdas (normal 5e-2 after 7k steps, distortion
1e-2 after 3k steps).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import splat_activations
from gscodec_studio_tpu.optimizers.builders import apply_updates
from gscodec_studio_tpu.rendering import rasterization_2dgs
from gscodec_studio_tpu.training.trainer import Config, Runner
from gscodec_studio_tpu.training.losses import combined_loss


@dataclass
class Config2DGS(Config):
    normal_lambda: float = 5e-2
    normal_start_iter: int = 7_000
    dist_lambda: float = 1e-2
    dist_start_iter: int = 3_000


class Runner2DGS(Runner):
    """Overrides the loss/render with the 2DGS pipeline; densification,
    optimizers, checkpoints, and codecs are shared with the 3DGS Runner."""

    def _build_train_step(self, height: int, width: int, sh_degree: int):
        cfg = self.cfg
        cap = self.splats["means"].shape[0]
        strategy = self.strategy

        def train_step(params, opt_states, strat_state, sim_bundle, batch,
                       key, step, means_lr):
            viewmat = jnp.linalg.inv(batch["camtoworld"])  # [B, 4, 4]
            target = batch["image"]  # [B, H, W, 3]
            B = target.shape[0]

            def loss_fn(params, probe):
                means, quats, scales, opac = splat_activations(params)
                colors = jnp.concatenate(
                    [params["sh0"], params["shN"]], axis=1
                )
                (render, alphas, render_n, surf_n, distort, median, meta) = (
                    rasterization_2dgs(
                        means, quats, scales, opac, colors, viewmat,
                        batch["K"], width, height, sh_degree=sh_degree,
                        near_plane=cfg.near_plane, far_plane=cfg.far_plane,
                        rasterizer=self._rasterizer_2dgs(),
                        isect_capacity=self._isect_capacity(),
                    )
                )
                render = render + 0.0 * probe.sum()
                loss = combined_loss(render, target, cfg.ssim_lambda)
                gate_n = (step > cfg.normal_start_iter).astype(jnp.float32)
                # camera-frame splat normal field vs depth-derived normals
                nc = render_n * jax.lax.rsqrt(
                    jnp.maximum(
                        jnp.sum(render_n * render_n, axis=-1, keepdims=True),
                        1e-12,
                    )
                )
                normal_err = 1.0 - jnp.sum(nc * surf_n, axis=-1)
                loss += cfg.normal_lambda * gate_n * jnp.mean(normal_err)
                gate_d = (step > cfg.dist_start_iter).astype(jnp.float32)
                loss += cfg.dist_lambda * gate_d * jnp.mean(distort)
                return loss, meta

            state_in = (params, opt_states, strat_state)
            probe = jnp.zeros((B, cap, 2), jnp.float32)
            (loss, meta), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, probe)
            param_grads, v_means2d = grads
            strat_state = strategy.update_state(strat_state, meta, v_means2d)
            params, opt_states = apply_updates(
                self.txs, opt_states, params, param_grads
            )
            # Finite-step gate (same policy as the base trainer): accept the
            # update only if the loss and every gradient element are finite.
            # leaf_oks fingerprints which leaf failed (loss first; order =
            # tree order of param_grads).
            leaf_oks = jnp.stack(
                [jnp.isfinite(loss)]
                + [jnp.all(jnp.isfinite(leaf))
                   for leaf in jax.tree_util.tree_leaves(param_grads)]
            )
            ok = jnp.all(leaf_oks)
            params, opt_states, strat_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                (params, opt_states, strat_state), state_in,
            )
            return (params, opt_states, strat_state, sim_bundle, loss,
                    meta["n_isects"], ~ok, leaf_oks)

        def train_chunk(params, opt_states, strat_state, sim_bundle,
                        aux_bundle, data, idxs, keys, steps, means_lrs):
            # same device-resident-dataset convention as the base Runner:
            # each step gathers its [B]-view camera batch from HBM by index.
            # (aux pose/appearance/bilagrid modules are not wired into the
            # 2DGS loss yet; the bundle passes through untouched)
            def body(carry, xs):
                p, o, s, sb = carry
                idx, key, step, lr = xs
                batch = jax.tree_util.tree_map(lambda a: a[idx], data)
                p, o, s, sb, loss, n_is, skipped, leaf_oks = train_step(
                    p, o, s, sb, batch, key, step, lr
                )
                return (p, o, s, sb), (loss, n_is, skipped, leaf_oks)

            ((params, opt_states, strat_state, sim_bundle),
             (losses, n_isects, skips, leaf_oks)) = jax.lax.scan(
                body, (params, opt_states, strat_state, sim_bundle),
                (idxs, keys, steps, means_lrs),
            )
            return (params, opt_states, strat_state, sim_bundle, aux_bundle,
                    losses, jnp.max(n_isects), skips, leaf_oks)

        self._probe_step = jax.jit(train_chunk)
        return jax.jit(train_chunk, donate_argnums=(0, 1))

    def _rasterizer_2dgs(self) -> str:
        # base-config "fused" -> the Pallas 2DGS kernel; "pallas"/
        # "reference" fall back to the oracle (the only other 2DGS backend)
        return "fused" if self.cfg.rasterizer == "fused" else "reference"

    def render_view(self, camtoworld, K, width, height, sh_degree=None):
        means, quats, scales, opac = splat_activations(self.splats)
        colors = jnp.concatenate([self.splats["sh0"], self.splats["shN"]], 1)
        viewmat = jnp.linalg.inv(jnp.asarray(camtoworld))[None]
        render, *_ = rasterization_2dgs(
            means, quats, scales, opac, colors, viewmat,
            jnp.asarray(K)[None], width, height,
            sh_degree=self.cfg.sh_degree if sh_degree is None else sh_degree,
            rasterizer=self._rasterizer_2dgs(),
            isect_capacity=self._isect_capacity(),
        )
        return jnp.clip(render[0, ..., :3], 0.0, 1.0)
