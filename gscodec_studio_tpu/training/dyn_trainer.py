"""Dynamic-splat trainer (temporal Gaussians on multiview video).

Behavioral spec: /root/reference/examples/simple_trainer_dyngs.py — the
static trainer's loop with (a) per-sample timestamps, (b) the temporal
forward (models/temporal.py), (c) per-splat feature colors instead of SH,
and (d) per-frame extraction feeding the sequence codec. Kept deliberately
close to training.trainer.Runner's structure (scan-batched dispatches).
"""

from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gscodec_studio_tpu.models.splats import PARAM_LRS
from gscodec_studio_tpu.models.temporal import (
    create_dyn_splats,
    slice_at_time,
    dyn_colors,
    dyn_features,
    get_rays,
    sandwich_apply,
    sandwich_init,
)
from gscodec_studio_tpu.optimizers import build_splat_optimizers
from gscodec_studio_tpu.optimizers.builders import apply_updates
from gscodec_studio_tpu.rendering import rasterization
from gscodec_studio_tpu.strategy import DefaultStrategy, MCMCStrategy
from gscodec_studio_tpu.strategy.stg import STGStrategy
from gscodec_studio_tpu.training.losses import combined_loss, psnr, ssim

DYN_PARAM_LRS = dict(
    PARAM_LRS,
    trbf_center=1e-3,
    trbf_scale=1e-3,
    motion=1.6e-4,  # scaled like means
    omega=1e-3,
    features_dir=2.5e-3,
    features_time=2.5e-3,
)


@dataclass
class DynConfig:
    result_dir: str = "results/dyn"
    max_steps: int = 30_000
    capacity: Optional[int] = None
    isect_capacity: Optional[int] = None
    ssim_lambda: float = 0.2
    strategy: str = "mcmc"
    # densification-window overrides (None = strategy defaults, tuned for
    # the reference 30k schedule; scale for short runs)
    refine_start_iter: Optional[int] = None
    refine_stop_iter: Optional[int] = None
    refine_every: Optional[int] = None
    mcmc_cap_max: int = 200_000
    seed: int = 42
    steps_per_dispatch: int = 10
    near_plane: float = 0.01
    far_plane: float = 1e10
    temporal_visibility_mask: bool = True
    # Rasterizer backend: "fused" (production v2), "pallas" (v1), "reference"
    rasterizer: str = "fused"
    # Color head: "rgb" = per-splat color only (dyngs active path),
    # "linear" = + dir/time linear combine, "sandwich" = 9-ch feature
    # render + CNN decoder with per-pixel rays (simple_trainer_STG.py:531,
    # :580; helper_model.py Sandwich)
    # "sandwich" is the reference's ACTIVE path (9-ch features through the
    # Sandwich CNN decoder, simple_trainer_STG.py:531,580) and the default
    # here; "linear" is the cheap dir/time-combine head, "rgb" static color
    color_mode: str = "sandwich"
    decoder_lr: float = 1e-4  # STG decoder_params lr (:242)
    # Training-time compression simulation (STG tables,
    # compression_sim/simulation.py STGCompressionSimulation)
    compression_sim: bool = False
    entropy_model_opt: bool = False
    rd_lambda: float = 1e-2  # dyngs:156


class DynRunner:
    """Trains {means, quats, scales, opacities, trbf_*, motion, omega,
    colors, features_*} against (image, camtoworld, K, timestamp) samples."""

    def __init__(self, cfg: DynConfig, points, rgbs, trainset, valset,
                 scene_scale: float = 1.0):
        self.cfg = cfg
        self.trainset = trainset
        self.valset = valset
        self.scene_scale = scene_scale

        n_init = len(points)
        if cfg.strategy == "mcmc":
            cap = cfg.mcmc_cap_max
            self.strategy = MCMCStrategy(cap_max=cap)
        elif cfg.strategy == "stg":
            cap = cfg.capacity or 4 * n_init
            self.strategy = STGStrategy()
        elif cfg.strategy == "modified_stg":
            from gscodec_studio_tpu.strategy.stg import ModifiedSTGStrategy

            cap = cfg.capacity or 4 * n_init
            self.strategy = ModifiedSTGStrategy()
        else:
            cap = cfg.capacity or 4 * n_init
            self.strategy = DefaultStrategy()
        cap = max(cap, n_init)
        # short-run refine-window scaling (see trainer.Config notes)
        for f_ in ("refine_start_iter", "refine_stop_iter", "refine_every"):
            v = getattr(cfg, f_, None)
            if v is not None:
                object.__setattr__(self.strategy, f_, int(v))
        self.splats = create_dyn_splats(points, rgbs, cap=cap, seed=cfg.seed)

        import math
        import optax

        self.txs, self.opt_states = {}, {}
        for name, p in self.splats.items():
            lr = DYN_PARAM_LRS.get(name, 1e-3)
            if name in ("means", "motion"):
                lr = optax.exponential_decay(
                    lr * scene_scale, transition_steps=cfg.max_steps,
                    decay_rate=0.01,
                )
            tx = optax.adam(lr, eps=1e-15)
            self.txs[name] = tx
            self.opt_states[name] = tx.init(p)

        if cfg.strategy == "mcmc":
            self.strategy_state = self.strategy.initialize_state(
                cap, scene_scale, n_init=n_init
            )
        else:
            self.strategy_state = self.strategy.initialize_state(cap, scene_scale)

        # CNN color decoder (separate from the per-splat tree: strategy ops
        # scatter rows over splat leaves; the reference likewise skips
        # "decoder" keys in its optimizer surgery, strategy/ops.py:69-73)
        self.decoder_params = None
        self.decoder_tx = None
        self.decoder_opt_state = None
        if cfg.color_mode == "sandwich":
            self.decoder_params = sandwich_init(
                jax.random.PRNGKey(cfg.seed + 3)
            )
            self.decoder_tx = optax.adam(cfg.decoder_lr, eps=1e-15)
            self.decoder_opt_state = self.decoder_tx.init(self.decoder_params)

        self.compression_sim = None
        if cfg.compression_sim:
            from gscodec_studio_tpu.compression_sim.simulation import (
                STGCompressionSimulation,
            )

            self.compression_sim = STGCompressionSimulation(
                entropy_model_opt=cfg.entropy_model_opt,
                cap=cap, max_steps=cfg.max_steps,
            )
            self.sim_params = self.compression_sim.init_params(
                jax.random.PRNGKey(cfg.seed + 1)
            )
            self.sim_tx, self.sim_opt_state = (
                self.compression_sim.build_optimizer(self.sim_params)
            )
        self.key = jax.random.PRNGKey(cfg.seed)
        self._train_step = None
        self._step_shape = None
        self._refine = jax.jit(self.strategy.refine)
        os.makedirs(cfg.result_dir, exist_ok=True)

    def _render(self, params, camtoworld, K, t, width, height,
                isect_capacity, dec_params=None, probe=None):
        sliced, tw = slice_at_time(params, t)
        viewmat = jnp.linalg.inv(camtoworld)[None]
        campos = camtoworld[:3, 3]
        mode = self.cfg.color_mode
        if mode == "sandwich":
            dt = t - params["trbf_center"]
            colors = dyn_features(params, dt)  # [cap, 9] raw features
        elif mode == "rgb":
            colors = jax.nn.sigmoid(params["colors"])
        else:  # linear dir/time combine
            dirs = sliced["means"] - campos[None, :]
            colors = jax.nn.sigmoid(dyn_colors(params, dirs, tw))
        opac = jax.nn.sigmoid(sliced["opacities"]) * tw
        if self.cfg.temporal_visibility_mask:
            opac = jnp.where(tw > 0.05, opac, 0.0)
        img, alpha, meta = rasterization(
            sliced["means"], sliced["quats"], jnp.exp(sliced["scales"]),
            opac, colors, viewmat, K[None], width, height,
            near_plane=self.cfg.near_plane, far_plane=self.cfg.far_plane,
            sh_degree=None, isect_capacity=isect_capacity,
            rasterizer=self.cfg.rasterizer,
            means2d_probe=probe,
        )
        # temporal visibility at this timestamp (Modified_STG's stats gate,
        # modified_stg.py:92-102)
        meta = dict(meta, t_vis_mask=(tw > 0.05))
        if mode == "sandwich":
            rays = get_rays(camtoworld, K, width, height)[None]
            img = sandwich_apply(dec_params, img, rays)
        return img, alpha, meta

    def _build_train_step(self, height, width):
        cfg = self.cfg
        cap = self.splats["means"].shape[0]
        isect_capacity = cfg.isect_capacity or max(cap * 4, 1 << 19)
        strategy = self.strategy

        use_dec = cfg.color_mode == "sandwich"
        sim = self.compression_sim

        def one_step(params, opt_states, strat_state, dec_bundle, sim_bundle,
                     batch, key, step, lr):
            dec_params, dec_opt = dec_bundle
            sim_params, sim_opt = sim_bundle
            key, ksim = jax.random.split(key)

            def loss_fn(params, dec_params, sim_params, probe):
                bits = jnp.float32(0.0)
                if sim is not None:
                    params, bits, _ = sim.simulate(
                        params, sim_params, step, ksim
                    )
                img, alpha, meta = self._render(
                    params, batch["camtoworld"], batch["K"],
                    batch["timestamp"], width, height, isect_capacity,
                    dec_params, probe=probe,
                )
                loss = combined_loss(
                    img, batch["image"][None], cfg.ssim_lambda
                )
                loss = loss + cfg.rd_lambda * bits
                return loss, meta

            probe0 = jnp.zeros((1, cap, 2), jnp.float32)
            argnums = (0, 3) + ((1,) if use_dec else ()) + (
                (2,) if sim is not None else ()
            )
            (loss, meta), glist = jax.value_and_grad(
                loss_fn, argnums=argnums, has_aux=True
            )(params, dec_params, sim_params, probe0)
            gmap = dict(zip(argnums, glist))
            grads = gmap[0]
            v_means2d = gmap[3]
            dec_grads = gmap.get(1)
            sim_grads = gmap.get(2)
            # densification stats (screen-space grad norms; Modified_STG
            # additionally gates by the temporal visibility mask)
            strat_state = strategy.update_state(strat_state, meta, v_means2d)
            if isinstance(strategy, STGStrategy):
                # post-freeze omega/rotation masking (STG_Strategy.py:131-136)
                grads = strategy.mask_gradients(
                    params, grads, step, state=strat_state
                )
            params, opt_states = apply_updates(
                self.txs, opt_states, params, grads
            )
            if use_dec:
                upd, dec_opt = self.decoder_tx.update(
                    dec_grads, dec_opt, dec_params
                )
                dec_params = optax.apply_updates(dec_params, upd)
            if sim is not None:
                upd, sim_opt = self.sim_tx.update(
                    sim_grads, sim_opt, sim_params
                )
                sim_params = optax.apply_updates(sim_params, upd)
            if isinstance(strategy, MCMCStrategy):
                params = strategy.inject_noise(params, key, lr)
            return (params, opt_states, strat_state, (dec_params, dec_opt),
                    (sim_params, sim_opt), loss)

        def chunk(params, opt_states, strat_state, dec_bundle, sim_bundle,
                  batches, keys, steps, lrs):
            def body(carry, xs):
                p, o, s, db, sb = carry
                batch, key, step, lr = xs
                p, o, s, db, sb, loss = one_step(
                    p, o, s, db, sb, batch, key, step, lr
                )
                return (p, o, s, db, sb), loss

            (params, opt_states, strat_state, dec_bundle, sim_bundle), losses = (
                jax.lax.scan(
                    body,
                    (params, opt_states, strat_state, dec_bundle, sim_bundle),
                    (batches, keys, steps, lrs),
                )
            )
            return (params, opt_states, strat_state, dec_bundle, sim_bundle,
                    losses)

        return jax.jit(chunk, donate_argnums=(0, 1))

    def train(self, max_steps: Optional[int] = None, log_every: int = 100):
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        strat = self.strategy
        order = np.random.default_rng(cfg.seed).permutation(len(self.trainset))
        losses = []
        t0 = time.time()
        step = 0
        while step < max_steps:
            S = min(cfg.steps_per_dispatch, max_steps - step,
                    strat.refine_every - (step % strat.refine_every))
            datas = [
                self.trainset[int(order[(step + i) % len(order)])]
                for i in range(S)
            ]
            batches = {
                "camtoworld": jnp.asarray(
                    np.stack([d["camtoworld"] for d in datas])
                ),
                "K": jnp.asarray(np.stack([d["K"] for d in datas])),
                "image": jnp.asarray(np.stack([d["image"] for d in datas])),
                "timestamp": jnp.asarray(
                    np.array([d["timestamp"] for d in datas], np.float32)
                ),
            }
            h, w = datas[0]["image"].shape[:2]
            if self._train_step is None or self._step_shape != (h, w, S):
                self._train_step = self._build_train_step(h, w)
                self._step_shape = (h, w, S)
            self.key, k = jax.random.split(self.key)
            keys = jax.random.split(k, S)
            steps = jnp.arange(step, step + S)
            lrs = jnp.asarray(
                [
                    DYN_PARAM_LRS["means"]
                    * self.scene_scale
                    * 0.01 ** ((step + i) / cfg.max_steps)
                    for i in range(S)
                ],
                jnp.float32,
            )
            dec_bundle = (self.decoder_params, self.decoder_opt_state)
            sim_bundle = (
                (self.sim_params, self.sim_opt_state)
                if self.compression_sim is not None else (None, None)
            )
            (self.splats, self.opt_states, self.strategy_state, dec_bundle,
             sim_bundle, chunk_losses) = self._train_step(
                self.splats, self.opt_states, self.strategy_state, dec_bundle,
                sim_bundle, batches, keys, steps, lrs,
            )
            self.decoder_params, self.decoder_opt_state = dec_bundle
            if self.compression_sim is not None:
                self.sim_params, self.sim_opt_state = sim_bundle
            step += S
            losses.extend(np.asarray(chunk_losses).tolist())
            if (
                step > strat.refine_start_iter
                and step < strat.refine_stop_iter
                and step % strat.refine_every == 0
            ):
                self.key, k = jax.random.split(self.key)
                self.splats, self.opt_states, self.strategy_state = (
                    self._refine(
                        self.splats, self.opt_states, self.strategy_state,
                        jnp.asarray(step), k,
                    )
                )
            if log_every and step % log_every < cfg.steps_per_dispatch:
                print(f"step {step}: loss {losses[-1]:.4f} "
                      f"({time.time()-t0:.1f}s)", flush=True)
        return losses

    def eval(self):
        out = {"psnr": [], "ssim": []}
        for i in range(len(self.valset)):
            d = self.valset[i]
            h, w = d["image"].shape[:2]
            img, _, _ = self._render(
                self.splats, jnp.asarray(d["camtoworld"]), jnp.asarray(d["K"]),
                jnp.asarray(d["timestamp"]), w, h,
                self.cfg.isect_capacity or 1 << 19, self.decoder_params,
            )
            img = jnp.clip(img[0], 0, 1)
            tgt = jnp.asarray(d["image"])
            out["psnr"].append(float(psnr(img, tgt)))
            out["ssim"].append(float(ssim(img[None], tgt[None])))
        return {k: float(np.mean(v)) for k, v in out.items()}

    def render_view_video(self, camtoworld, K, width, height, timestamps,
                          out_path: str, fps: int = 30):
        """Per-view eval video: render the temporal model at each timestamp
        from a fixed camera and write mp4/pngseq (dyngs eval videos,
        simple_trainer_dyngs.py:820-958)."""
        import imageio.v2 as imageio

        render = jax.jit(
            lambda splats, dec, c2w, K, t: self._render(
                splats, c2w, K, t, width, height,
                self.cfg.isect_capacity or 1 << 19, dec,
            )[0]
        )
        c2w_d, K_d = jnp.asarray(camtoworld), jnp.asarray(K)
        frames = []
        for t in timestamps:
            img = render(self.splats, self.decoder_params, c2w_d, K_d,
                         jnp.asarray(t, jnp.float32))
            frames.append(
                (np.clip(np.asarray(img[0]), 0, 1) * 255).astype(np.uint8)
            )
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        try:
            imageio.mimwrite(out_path, frames, fps=fps)
        except Exception:
            base = os.path.splitext(out_path)[0]
            os.makedirs(base, exist_ok=True)
            for i, f in enumerate(frames):
                imageio.imwrite(os.path.join(base, f"{i:04d}.png"), f)
            out_path = base
        return out_path

    def export_frames(self, timestamps):
        """Per-frame static splats for SeqHevc-style coding
        (dyngs:1158-1271 -> compress_ply_sequence.py)."""
        from gscodec_studio_tpu.models.temporal import extract_frame

        return [extract_frame(self.splats, t) for t in timestamps]
