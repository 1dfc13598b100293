"""Training-time compression simulation orchestrator.

Behavioral spec: /root/reference/gsplat/compression_simulation/simulation.py
CompressionSimulation (:30-324): per-attribute fake quantization with the
reference's bitwidth/bound tables (:30-59), optional learned factorized
entropy models whose estimated bits enter the loss as rd_lambda * mean-bits
(simple_trainer.py:991-1003), and the learnable shN annealing mask.

Functional JAX design: the simulation's *learnable* state (entropy-model
params, mask logits) lives in a ``sim_params`` pytree that the trainer
optimizes jointly; ``simulate`` is pure and jit-safe with a traced ``step``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gscodec_studio_tpu.compression_sim.ops import fake_quantize_ste
from gscodec_studio_tpu.compression_sim.entropy_model import (
    init_factorized,
    factorized_bits,
)
from gscodec_studio_tpu.compression_sim.ada_mask import (
    annealing_mask_apply,
    annealing_mask_sparsity_loss,
)

# Per-attribute quantization tables (simulation.py:30-59).
SIM_OPTION = {
    "means": False, "scales": True, "quats": True, "opacities": True,
    "sh0": True, "shN": False,
}
Q_BITWIDTH = {"scales": 8, "quats": 8, "opacities": 8, "sh0": 8}
BOUNDS = {
    "scales": (-10.0, 2.0),
    "quats": (-1.0, 1.0),
    "opacities": (-15.0, 15.0),
    "sh0": (-2.0, 4.0),
}
ENTROPY_OPTION = {"scales": True, "quats": True, "opacities": False, "sh0": True}
# Steps at which each attribute's entropy term activates
# (simple_trainer.py:170-175 defaults).
ENTROPY_STEPS = {"quats": 10_000, "scales": 10_000, "sh0": 20_000}


@dataclasses.dataclass
class CompressionSimulation:
    entropy_model_opt: bool = False
    shN_ada_mask_opt: bool = False
    cap: int = 0
    max_steps: int = 30_000
    ada_mask_start: int = 10_000
    q_type: str = "round"
    # "factorized_model" | "gaussian_model" (position-conditioned, hash-grid;
    # simulation.py:92-106 / gaussian_distribution_model.py)
    entropy_model_type: str = "factorized_model"
    # gaussian_model subsamples ~5% of in-bbox points per step for speed
    # (simulation.py:185-219); static count here for jit.
    gaussian_sample: int = 16_384
    # Attribute tables (overridden by the STG variant)
    sim_option: Dict = dataclasses.field(
        default_factory=lambda: dict(SIM_OPTION))
    q_bitwidth: Dict = dataclasses.field(
        default_factory=lambda: dict(Q_BITWIDTH))
    bounds: Dict = dataclasses.field(default_factory=lambda: dict(BOUNDS))
    entropy_option: Dict = dataclasses.field(
        default_factory=lambda: dict(ENTROPY_OPTION))
    entropy_steps: Dict = dataclasses.field(
        default_factory=lambda: dict(ENTROPY_STEPS))
    entropy_channels: Dict = dataclasses.field(
        default_factory=lambda: {"scales": 3, "quats": 4, "sh0": 3})

    def init_params(self, key: jax.Array) -> Dict:
        """Learnable simulation parameters (to be optimized by the trainer)."""
        out = {}
        if self.entropy_model_opt:
            ch = self.entropy_channels
            if self.entropy_model_type == "gaussian_model":
                from gscodec_studio_tpu.compression_sim.hash_grid import (
                    gaussian_conditional_init,
                )

                ems = {}
                self._gauss_cfgs = {}
                for name, c in ch.items():
                    key, k = jax.random.split(key)
                    ems[name], self._gauss_cfgs[name] = (
                        gaussian_conditional_init(k, c, n_levels_3d=8,
                                                  n_levels_2d=2)
                    )
            else:
                ems = {}
                for name, c in ch.items():
                    key, k = jax.random.split(key)
                    filters = (3, 3) if name in ("scales", "sh0") else (3, 3, 3)
                    ems[name] = init_factorized(k, c, filters)
            out["entropy"] = ems
        if self.shN_ada_mask_opt:
            out["ada_mask"] = jnp.ones((self.cap,), jnp.float32)
        return out

    def init_state(self):
        return self.init_params(jax.random.PRNGKey(0))

    def build_optimizer(self, sim_params):
        """Adam(1e-4) for entropy models + mask (simulation.py:118-149)."""
        tx = optax.adam(1e-4)
        return tx, tx.init(sim_params)

    def simulate(
        self,
        splats: Dict[str, jnp.ndarray],
        sim_params: Optional[Dict],
        step,
        key: jax.Array,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
        """Returns (fake-quantized splats, total mean esti-bits (bpp-style
        scalar), auxiliary losses)."""
        new = dict(splats)
        total_bits = jnp.float32(0.0)
        aux = jnp.float32(0.0)
        sim_params = sim_params or {}

        for name in splats:
            if not self.sim_option.get(name, False):
                continue
            lo, hi = self.bounds[name]
            x = splats[name]
            shp = x.shape
            key, k = jax.random.split(key)
            xq, q_step = fake_quantize_ste(
                x.reshape(shp[0], -1), lo, hi, self.q_bitwidth[name],
                self.q_type, k
            )
            new[name] = xq.reshape(shp)
            if (
                self.entropy_model_opt
                and self.entropy_option.get(name, False)
                and name in sim_params.get("entropy", {})
            ):
                if self.entropy_model_type == "gaussian_model":
                    from gscodec_studio_tpu.compression_sim.hash_grid import (
                        gaussian_conditional_bits,
                    )

                    # subsample points; condition on normalized positions
                    key, ks = jax.random.split(key)
                    idx = jax.random.randint(
                        ks, (min(self.gaussian_sample, shp[0]),), 0, shp[0]
                    )
                    means = splats["means"]
                    lo_p = jnp.percentile(means, 1.0, axis=0)
                    hi_p = jnp.percentile(means, 99.0, axis=0)
                    pos = jnp.clip(
                        (means[idx] - lo_p) / jnp.maximum(hi_p - lo_p, 1e-6),
                        0.0, 1.0,
                    )
                    # binarize=True: train through the STE sign so the
                    # 1-bit grid export (entropy_coding ctx-ANS) runs the
                    # exact inference the model was optimized for
                    bits = gaussian_conditional_bits(
                        sim_params["entropy"][name],
                        self._gauss_cfgs[name],
                        xq.reshape(shp[0], -1)[idx],
                        pos,
                        q_step,
                        binarize=True,
                    )
                else:
                    bits = factorized_bits(
                        sim_params["entropy"][name], xq.reshape(shp[0], -1),
                        q_step,
                    )
                # bpp-style mean, gated on the per-attribute start step
                gate = (step > self.entropy_steps[name]).astype(jnp.float32)
                total_bits = total_bits + gate * jnp.mean(bits)

        if self.shN_ada_mask_opt and "ada_mask" in sim_params:
            gate = (step > self.ada_mask_start).astype(jnp.float32)
            masked = annealing_mask_apply(
                sim_params["ada_mask"], splats["shN"], step,
                total_iters=self.max_steps,
                annealing_start_iter=self.ada_mask_start,
            )
            new["shN"] = jnp.where(gate > 0, masked, splats["shN"])
            aux = aux + gate * annealing_mask_sparsity_loss(
                sim_params["ada_mask"], step,
                total_iters=self.max_steps,
                annealing_start_iter=self.ada_mask_start,
            )
        return new, total_bits, aux


# STG (dynamic splat) tables — reference STGCompressionSimulation
# (simulation.py:508-780): quantizes scales/quats/opacities and the
# color/dir/time feature triplet; temporal params (trbf/motion/omega) stay
# unquantized. Entropy terms activate at step 7000
# (simple_trainer_dyngs.py:158-168 defaults).
STG_SIM_OPTION = {
    "means": False, "scales": True, "quats": True, "opacities": True,
    "trbf_center": False, "trbf_scale": False, "motion": False,
    "omega": False, "colors": True, "features_dir": True,
    "features_time": True,
}
STG_Q_BITWIDTH = {
    "scales": 8, "quats": 8, "opacities": 8, "colors": 8,
    "features_dir": 8, "features_time": 8,
}
STG_BOUNDS = {
    "scales": (-10.0, 2.0),
    "quats": (-1.0, 1.0),
    "opacities": (-7.0, 7.0),
    "colors": (-7.5, 7.5),
    "features_dir": (-10.0, 10.0),
    "features_time": (-10.0, 10.0),
}
STG_ENTROPY_OPTION = {
    "scales": True, "quats": True, "opacities": False, "colors": True,
    "features_dir": True, "features_time": True,
}
STG_ENTROPY_STEPS = {
    "scales": 7_000, "quats": 7_000, "colors": 7_000,
    "features_dir": 7_000, "features_time": 7_000,
}
STG_ENTROPY_CHANNELS = {
    "scales": 3, "quats": 4, "colors": 3, "features_dir": 3,
    "features_time": 3,
}


def STGCompressionSimulation(**kw) -> CompressionSimulation:
    """Factory mirroring the reference STGCompressionSimulation: the same
    simulation machinery with the STG attribute tables."""
    kw.setdefault("sim_option", dict(STG_SIM_OPTION))
    kw.setdefault("q_bitwidth", dict(STG_Q_BITWIDTH))
    kw.setdefault("bounds", dict(STG_BOUNDS))
    kw.setdefault("entropy_option", dict(STG_ENTROPY_OPTION))
    kw.setdefault("entropy_steps", dict(STG_ENTROPY_STEPS))
    kw.setdefault("entropy_channels", dict(STG_ENTROPY_CHANNELS))
    return CompressionSimulation(**kw)
