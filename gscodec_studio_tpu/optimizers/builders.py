"""Per-parameter-group optimizer construction mirroring the reference's
per-name torch.optim.Adam dict (simple_trainer.py:404-411): per-param lr
(PARAM_LRS), lr*sqrt(BS) batch scaling, eps 1e-15/sqrt(BS), batch-scaled
betas, and an exponential lr decay on means (0.01^(1/max_steps),
simple_trainer.py:938 schedulers)."""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import optax

from gscodec_studio_tpu.models.splats import PARAM_LRS
from gscodec_studio_tpu.optimizers.selective_adam import selective_adam


def build_splat_optimizers(
    params: Dict,
    scene_scale: float = 1.0,
    batch_size: int = 1,
    world_size: int = 1,
    max_steps: int = 30_000,
    means_lr_decay: bool = True,
    visible_adam: bool = False,
) -> Tuple[Dict[str, optax.GradientTransformation], Dict[str, object]]:
    """Returns ({name: optax tx}, {name: state})."""
    bs = batch_size * world_size
    sqrt_bs = math.sqrt(bs)
    b1 = 1 - bs * (1 - 0.9)
    b2 = 1 - bs * (1 - 0.999)
    eps = 1e-15 / sqrt_bs

    txs, states = {}, {}
    for name, p in params.items():
        lr = PARAM_LRS.get(name, 1e-3) * sqrt_bs
        if name == "means":
            lr = lr * scene_scale
            if means_lr_decay:
                lr = optax.exponential_decay(
                    lr, transition_steps=max_steps, decay_rate=0.01
                )
        if visible_adam:
            tx = selective_adam(lr, b1=b1, b2=b2, eps=eps)
        else:
            tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
        txs[name] = tx
        states[name] = tx.init(p)
    return txs, states


def apply_updates(txs, states, params, grads, visibility=None,
                  visible_adam: bool = False):
    """One optimizer step over the per-name groups. ``visibility`` [cap] is
    only consumed when the groups were built with visible_adam=True."""
    new_params, new_states = {}, {}
    for name, p in params.items():
        g = grads[name]
        if visible_adam:
            upd, st = txs[name].update(g, states[name], p, visibility=visibility)
        else:
            upd, st = txs[name].update(g, states[name], p)
        new_params[name] = optax.apply_updates(p, upd)
        new_states[name] = st
    return new_params, new_states
