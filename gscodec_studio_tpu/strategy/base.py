"""Strategy interface (functional analog of the reference's
/root/reference/gsplat/strategy/base.py Strategy callbacks).

A strategy is a dataclass of hyperparameters with pure methods:

  initialize_state(cap, scene_scale) -> state pytree
  update_state(state, info, v_means2d) -> state        (per step, jit-safe)
  refine(params, opt_states, state, step, key)
      -> (params, opt_states, state)                   (jit-safe, static caps)

The trainer decides *when* to call refine (every ``refine_every`` steps inside
the configured window), mirroring step_pre/post_backward
(simple_trainer.py:940-946, :1164-1184).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Strategy:
    def initialize_state(self, cap: int, scene_scale: float):
        raise NotImplementedError

    def update_state(self, state, info, v_means2d):
        raise NotImplementedError

    def refine(self, params, opt_states, state, step, key):
        raise NotImplementedError
