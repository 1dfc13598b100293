"""Static 3DGS trainer (TPU-native equivalent of the reference's
examples/simple_trainer.py).

Structure: a ``Config`` dataclass (tyro-style CLI via utils.cli), a ``Runner``
holding host-side state (datasets, writers), and ONE jitted train step — the
whole device hot path (projection -> SH -> binning -> Pallas rasterization ->
loss -> backward -> per-group Adam) is a single compiled function
(simple_trainer.py:805-1208 is the behavioral spec). Densification runs as a
separately-jitted static-shape refine (strategy/), so no step ever
recompiles.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import (
    create_splats,
    splat_activations,
    PARAM_LRS,
)
from gscodec_studio_tpu.optimizers import build_splat_optimizers
from gscodec_studio_tpu.optimizers.builders import apply_updates
from gscodec_studio_tpu.rendering import rasterization
from gscodec_studio_tpu.strategy import DefaultStrategy, MCMCStrategy
from gscodec_studio_tpu.training.losses import combined_loss, psnr, ssim


@dataclass
class Config:
    """Mirrors the reference Config (simple_trainer.py:139-326) for the
    features implemented so far."""

    data_dir: str = "data/garden"
    data_factor: int = 4
    result_dir: str = "results/run"
    max_steps: int = 30_000
    batch_size: int = 1
    test_every: int = 8

    # Model
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    init_type: str = "sfm"
    init_num_pts: int = 100_000
    init_opa: float = 0.1
    init_scale: float = 1.0
    near_plane: float = 0.01
    far_plane: float = 1e10
    antialiased: bool = False

    # Capacity (static shapes): DefaultStrategy grows into cap slots.
    capacity: Optional[int] = None  # default: 4x init points (or cap_max for mcmc)
    isect_capacity: Optional[int] = None

    # Loss
    ssim_lambda: float = 0.2
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    random_bkgd: bool = False

    # Strategy
    strategy: str = "default"  # "default" | "mcmc"
    mcmc_cap_max: int = 1_000_000

    # Misc
    eval_steps: tuple = (7_000, 30_000)
    save_steps: tuple = (7_000, 30_000)
    seed: int = 42
    visible_adam: bool = False
    # Steps fused into one device dispatch (host sync amortization)
    steps_per_dispatch: int = 25

    # Rasterizer backend: "fused" (production v2), "pallas" (legacy v1),
    # "reference" (pure-jnp oracle)
    rasterizer: str = "fused"

    # Compression simulation (training-time; compression_sim/)
    compression_sim: bool = False
    rd_lambda: float = 0.01
    entropy_model_opt: bool = False
    shN_ada_mask_opt: bool = False


class Runner:
    """Owns host state; see module docstring."""

    def __init__(self, cfg: Config, parser=None, trainset=None, valset=None):
        self.cfg = cfg
        if parser is None:
            from gscodec_studio_tpu.datasets.colmap import Parser, Dataset

            parser = Parser(cfg.data_dir, factor=cfg.data_factor,
                            test_every=cfg.test_every)
            trainset = Dataset(parser, split="train")
            valset = Dataset(parser, split="val")
        self.parser = parser
        self.trainset = trainset
        self.valset = valset
        self.scene_scale = getattr(parser, "scene_scale", 1.0)

        points = np.asarray(parser.points)
        rgbs = np.asarray(parser.points_rgb) / 255.0
        if cfg.init_type == "random":
            rng = np.random.default_rng(cfg.seed)
            points = (
                (rng.random((cfg.init_num_pts, 3)) * 2 - 1)
                * 3.0 * self.scene_scale
            ).astype(np.float32)
            rgbs = rng.random((cfg.init_num_pts, 3)).astype(np.float32)

        n_init = points.shape[0]
        if cfg.strategy == "mcmc":
            cap = cfg.mcmc_cap_max
            self.strategy = MCMCStrategy(cap_max=cap)
        else:
            cap = cfg.capacity or 4 * n_init
            self.strategy = DefaultStrategy()
        cap = max(cap, n_init)

        self.splats = create_splats(
            points, rgbs, cap=cap, sh_degree=cfg.sh_degree,
            init_opacity=cfg.init_opa, init_scale=cfg.init_scale,
            seed=cfg.seed,
        )
        self.txs, self.opt_states = build_splat_optimizers(
            self.splats,
            scene_scale=self.scene_scale,
            batch_size=cfg.batch_size,
            max_steps=cfg.max_steps,
            visible_adam=cfg.visible_adam,
        )
        if cfg.strategy == "mcmc":
            self.strategy_state = self.strategy.initialize_state(
                cap, self.scene_scale, n_init=n_init
            )
        else:
            self.strategy_state = self.strategy.initialize_state(
                cap, self.scene_scale
            )

        self.compression_sim = None
        if cfg.compression_sim:
            from gscodec_studio_tpu.compression_sim.simulation import (
                CompressionSimulation,
            )

            self.compression_sim = CompressionSimulation(
                entropy_model_opt=cfg.entropy_model_opt,
                shN_ada_mask_opt=cfg.shN_ada_mask_opt,
                cap=cap,
                max_steps=cfg.max_steps,
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

    # -- jitted step ------------------------------------------------------

    def _build_train_step(self, height: int, width: int, sh_degree: int):
        cfg = self.cfg
        cap = self.splats["means"].shape[0]
        isect_capacity = cfg.isect_capacity or max(cap * 4, 1 << 20)
        strategy = self.strategy
        sim = self.compression_sim

        def train_step(params, opt_states, strat_state, sim_bundle, batch, key,
                       step, means_lr):
            sim_params, sim_opt_state = (
                sim_bundle if sim is not None else (None, None)
            )
            camtoworld = batch["camtoworld"]  # [4,4]
            K = batch["K"]
            target = batch["image"][None]  # [1,H,W,3]
            viewmat = jnp.linalg.inv(camtoworld)[None]
            key, kb, ksim = jax.random.split(key, 3)

            use_absgrad = (
                getattr(strategy, "absgrad", False)
                and cfg.rasterizer == "fused"
            )

            def loss_fn(params, sim_params, probe, ag_probe):
                esti_bits_total = jnp.float32(0.0)
                aux_losses = jnp.float32(0.0)
                if sim is not None:
                    params, esti_bits_total, aux_losses = sim.simulate(
                        params, sim_params, step, ksim
                    )
                means, quats, scales, opac = splat_activations(params)
                colors = jnp.concatenate(
                    [params["sh0"], params["shN"]], axis=1
                )
                bkgd = (
                    jax.random.uniform(kb, (1, 3))
                    if cfg.random_bkgd
                    else None
                )
                img, alpha, meta = rasterization(
                    means, quats, scales, opac, colors,
                    viewmat, K[None], width, height,
                    near_plane=cfg.near_plane, far_plane=cfg.far_plane,
                    sh_degree=sh_degree,
                    backgrounds=bkgd,
                    rasterize_mode=(
                        "antialiased" if cfg.antialiased else "classic"
                    ),
                    isect_capacity=isect_capacity,
                    means2d_probe=probe,
                    absgrad_probe=ag_probe if use_absgrad else None,
                    rasterizer=cfg.rasterizer,
                )
                loss = combined_loss(img, target, cfg.ssim_lambda)
                if cfg.opacity_reg > 0:
                    loss += cfg.opacity_reg * jnp.mean(jnp.abs(opac))
                if cfg.scale_reg > 0:
                    loss += cfg.scale_reg * jnp.mean(jnp.abs(scales))
                if sim is not None:
                    loss += cfg.rd_lambda * esti_bits_total + aux_losses
                return loss, (img, meta)

            probe = jnp.zeros((1, cap, 2), jnp.float32)
            ag_probe = jnp.zeros((1, cap, 2), jnp.float32)
            (loss, (img, meta)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3), has_aux=True
            )(params, sim_params, probe, ag_probe)
            param_grads, sim_grads, v_means2d, v_absgrad = grads

            # With absgrad, the densification signal is the per-gaussian sum
            # of |per-pixel xy gradient| (reference bwd.cu:232-234 /
            # strategy flag absgrad); otherwise the signed gradient norm.
            strat_state = strategy.update_state(
                strat_state, meta,
                v_absgrad if use_absgrad else v_means2d,
            )

            visibility = (jnp.sum(meta["radii"] > 0, axis=0) > 0).astype(
                jnp.float32
            )
            params, opt_states = apply_updates(
                self.txs, opt_states, params, param_grads,
                visibility=visibility, visible_adam=cfg.visible_adam,
            )
            if sim is not None:
                upd, sim_opt_state = self.sim_tx.update(
                    sim_grads, sim_opt_state, sim_params
                )
                sim_params = jax.tree_util.tree_map(
                    lambda p, u: p + u, sim_params, upd
                )
            if isinstance(strategy, MCMCStrategy):
                params = strategy.inject_noise(params, key, means_lr)
            return (params, opt_states, strat_state, (sim_params, sim_opt_state),
                    loss, meta["n_isects"])

        def train_chunk(params, opt_states, strat_state, sim_bundle, data,
                        idxs, keys, steps, means_lrs):
            """lax.scan over S fused steps — one device dispatch
            (amortizes host-sync/dispatch latency; the TPU-idiomatic loop).
            ``data`` is the device-resident full train set; each step gathers
            its view by index, so no image bytes cross the host link."""

            def body(carry, xs):
                params, opt_states, strat_state, sim_bundle = carry
                idx, key, step, lr = xs
                batch = jax.tree_util.tree_map(lambda a: a[idx], data)
                params, opt_states, strat_state, sim_bundle, loss, n_is = (
                    train_step(params, opt_states, strat_state, sim_bundle,
                               batch, key, step, lr)
                )
                return (params, opt_states, strat_state, sim_bundle), (loss, n_is)

            (params, opt_states, strat_state, sim_bundle), (losses, n_isects) = (
                jax.lax.scan(
                    body, (params, opt_states, strat_state, sim_bundle),
                    (idxs, keys, steps, means_lrs),
                )
            )
            return (params, opt_states, strat_state, sim_bundle, losses,
                    jnp.max(n_isects))

        return jax.jit(train_chunk, donate_argnums=(0, 1))

    def _device_trainset(self):
        """Upload the full train set to HBM once (relay-transfer
        amortization: per-step image feeding over the remote link dominated
        step time at full resolution)."""
        if getattr(self, "_dev_data", None) is None:
            datas = [self.trainset[i] for i in range(len(self.trainset))]
            self._dev_data = {
                "camtoworld": jnp.asarray(
                    np.stack([d["camtoworld"] for d in datas])
                ),
                "K": jnp.asarray(np.stack([d["K"] for d in datas])),
                "image": jnp.asarray(
                    np.stack([d["image"] for d in datas])
                ),
            }
        return self._dev_data

    def _isect_capacity(self) -> int:
        cap = self.splats["means"].shape[0]
        return self.cfg.isect_capacity or max(cap * 4, 1 << 20)

    def _means_lr(self, step: int) -> float:
        base = PARAM_LRS["means"] * self.scene_scale * math.sqrt(
            self.cfg.batch_size
        )
        return base * (0.01 ** (step / self.cfg.max_steps))

    # -- loop -------------------------------------------------------------

    def train(self, max_steps: Optional[int] = None, log_every: int = 100):
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        strat = self.strategy
        sim_bundle = (
            (self.sim_params, self.sim_opt_state)
            if self.compression_sim
            else (None, None)
        )
        order = np.random.default_rng(cfg.seed).permutation(len(self.trainset))
        losses = []
        t0 = time.time()
        step = 0
        next_log = 0
        while step < max_steps:
            # Chunk ends at the next refine / sh-degree / end boundary.
            S = min(cfg.steps_per_dispatch, max_steps - step)
            for interval in (strat.refine_every, cfg.sh_degree_interval,
                             getattr(strat, "reset_every", 1 << 30)):
                to_b = interval - (step % interval)
                S = min(S, to_b)

            data = self._device_trainset()
            idxs = jnp.asarray(
                [int(order[(step + i) % len(order)]) for i in range(S)],
                jnp.int32,
            )
            h, w = data["image"].shape[1:3]
            sh_degree = min(step // cfg.sh_degree_interval, cfg.sh_degree)
            if self._train_step is None or self._step_shape != (h, w, sh_degree, S):
                self._train_step = self._build_train_step(h, w, sh_degree)
                self._step_shape = (h, w, sh_degree, S)

            self.key, k = jax.random.split(self.key)
            keys = jax.random.split(k, S)
            steps = jnp.arange(step, step + S)
            lrs = jnp.asarray(
                [self._means_lr(step + i) for i in range(S)], jnp.float32
            )
            (self.splats, self.opt_states, self.strategy_state, sim_bundle,
             chunk_losses, chunk_max_isects) = self._train_step(
                self.splats, self.opt_states, self.strategy_state,
                sim_bundle, data, idxs, keys, steps, lrs,
            )
            step += S

            # Densification / relocation schedule (host-side decisions).
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
            if (
                isinstance(strat, DefaultStrategy)
                and step % strat.reset_every == 0
                and step < strat.refine_stop_iter
            ):
                # Resets stop with densification (reference
                # strategy/default.py:162-163 returns before the reset once
                # step >= refine_stop_iter); resetting during final
                # convergence would clamp opacities with no refine to recover.
                self.splats, self.opt_states = strat.maybe_reset_opacity(
                    self.splats, self.opt_states, step
                )
            if log_every and step >= next_log:
                # Host sync only here (keeps the device pipeline deep).
                losses.extend(np.asarray(chunk_losses).tolist())
                cap_used = int(chunk_max_isects)
                isect_cap = self._isect_capacity()
                fill = cap_used / isect_cap
                warn = "  !! ISECT OVERFLOW (raise isect_capacity)" if (
                    fill >= 1.0
                ) else ""
                print(
                    f"step {step}: loss {losses[-1]:.4f} "
                    f"isects {cap_used} ({fill:.0%} of cap){warn} "
                    f"({time.time()-t0:.1f}s)", flush=True
                )
                next_log = step + log_every
            else:
                losses.extend(np.asarray(chunk_losses).tolist())
        if self.compression_sim is not None:
            self.sim_params, self.sim_opt_state = sim_bundle
        return losses

    # -- eval -------------------------------------------------------------

    def _render_fn(self, width, height, sh_degree):
        """Cached jitted single-view renderer. Splat arrays are jit
        ARGUMENTS (captured constants are re-staged through the remote
        relay on every dispatch), and one compile serves every view at a
        given (resolution, sh_degree)."""
        key = (width, height, sh_degree, self.cfg.rasterizer)
        cache = getattr(self, "_render_cache", None)
        if cache is None:
            cache = self._render_cache = {}
        if key not in cache:
            isect_capacity = self._isect_capacity()
            cfg = self.cfg

            @jax.jit
            def render(splats, viewmat, K):
                means, quats, scales, opac = splat_activations(splats)
                colors = jnp.concatenate(
                    [splats["sh0"], splats["shN"]], axis=1
                )
                img, alpha, _ = rasterization(
                    means, quats, scales, opac, colors, viewmat[None],
                    K[None], width, height, sh_degree=sh_degree,
                    isect_capacity=isect_capacity,
                    rasterizer=cfg.rasterizer,
                )
                return jnp.clip(img[0], 0.0, 1.0)

            cache[key] = render
        return cache[key]

    def render_view(self, camtoworld, K, width, height, sh_degree=None):
        sh = self.cfg.sh_degree if sh_degree is None else sh_degree
        fn = self._render_fn(width, height, sh)
        viewmat = jnp.linalg.inv(jnp.asarray(camtoworld))
        return fn(self.splats, viewmat, jnp.asarray(K))

    def eval(self, stage: str = "val") -> Dict[str, float]:
        """PSNR/SSIM over the val set. Metrics are computed on device in
        the same dispatch as the render; only two scalars per view cross
        the host link."""
        key = ("eval",) + (self.cfg.rasterizer,)
        cache = getattr(self, "_render_cache", None) or {}
        self._render_cache = cache

        metrics = {"psnr": [], "ssim": []}
        fns = {}
        for i in range(len(self.valset)):
            data = self.valset[i]
            h, w = data["image"].shape[:2]
            if (h, w) not in fns:
                rf = self._render_fn(w, h, self.cfg.sh_degree)

                @jax.jit
                def eval_fn(splats, viewmat, K, tgt, _rf=rf):
                    img = _rf(splats, viewmat, K)
                    return psnr(img, tgt), ssim(img[None], tgt[None])

                fns[(h, w)] = eval_fn
            viewmat = jnp.linalg.inv(jnp.asarray(data["camtoworld"]))
            p_, s_ = fns[(h, w)](
                self.splats, viewmat, jnp.asarray(data["K"]),
                jnp.asarray(data["image"]),
            )
            metrics["psnr"].append(float(p_))
            metrics["ssim"].append(float(s_))
        out = {k: float(np.mean(v)) for k, v in metrics.items()}
        stats_dir = os.path.join(self.cfg.result_dir, "stats")
        os.makedirs(stats_dir, exist_ok=True)
        with open(os.path.join(stats_dir, f"{stage}.json"), "w") as f:
            json.dump(out, f)
        return out


    def finalize_sim(self, sim_bundle):
        """Persist optimized sim params back onto the runner (call after
        train())."""
        if self.compression_sim is not None:
            self.sim_params, self.sim_opt_state = sim_bundle

    # -- checkpoint / export ----------------------------------------------

    def live_splats(self) -> Dict[str, np.ndarray]:
        """Host copies of the live (non-dead-slot) splats."""
        splats = {k: np.asarray(v) for k, v in self.splats.items()}
        op = 1.0 / (1.0 + np.exp(-splats["opacities"]))
        keep = op > 0.005
        return {k: v[keep] for k, v in splats.items()}

    def save_checkpoint(self, step: int):
        """npz checkpoint of splats (+sim params), reference
        simple_trainer.py:1076-1099 semantics (model-only)."""
        ckpt_dir = os.path.join(self.cfg.result_dir, "ckpts")
        os.makedirs(ckpt_dir, exist_ok=True)
        arrs = {f"splats/{k}": np.asarray(v) for k, v in self.splats.items()}
        if self.compression_sim is not None:
            flat, _ = jax.tree_util.tree_flatten(self.sim_params)
            for i, leaf in enumerate(flat):
                arrs[f"sim/{i}"] = np.asarray(leaf)
        np.savez(os.path.join(ckpt_dir, f"ckpt_{step}.npz"), step=step, **arrs)

    def load_checkpoint(self, path: str):
        z = np.load(path)
        for k in list(self.splats):
            self.splats[k] = jnp.asarray(z[f"splats/{k}"])
        if self.compression_sim is not None:
            flat, treedef = jax.tree_util.tree_flatten(self.sim_params)
            flat = [jnp.asarray(z[f"sim/{i}"]) for i in range(len(flat))]
            self.sim_params = jax.tree_util.tree_unflatten(treedef, flat)
        return int(z["step"])

    def save_ply(self, path: str):
        from gscodec_studio_tpu.utils.ply import save_ply

        save_ply(path, self.live_splats())

    # -- test-time compression (simple_trainer.py run_compression:1368-1399)

    def run_compression(self, step: int = 0, method: str = "png"):
        """Compress -> decompress -> reload -> eval. Returns (metrics, bytes)."""
        from gscodec_studio_tpu.compression import (
            PngCompression,
            EntropyCodingCompression,
            compressed_size,
        )

        compress_dir = os.path.join(self.cfg.result_dir, f"compression_{step}")
        splats_host = self.live_splats()
        if method == "png":
            codec = PngCompression()
            codec.compress(compress_dir, splats_host)
        elif method == "entropy_coding":
            codec = EntropyCodingCompression()
            ems = None
            if self.compression_sim is not None and "entropy" in (
                self.sim_params or {}
            ):
                ems = self.sim_params["entropy"]
            codec.compress(compress_dir, splats_host, entropy_models=ems)
        else:
            raise ValueError(method)
        decoded = codec.decompress(compress_dir)

        # Render with the decoded splats: pad back to capacity (dead slots).
        cap = self.splats["means"].shape[0]
        restored = {}
        for k, v in self.splats.items():
            arr = np.full(np.asarray(v).shape, 0.0, np.float32)
            if arr.size == 0 or k not in decoded:
                restored[k] = jnp.asarray(arr)
                continue
            dec = decoded[k].reshape((-1,) + np.asarray(v).shape[1:])
            arr[: len(dec)] = dec
            if k == "opacities":
                arr[len(dec):] = -15.0
            restored[k] = jnp.asarray(arr)
        backup = self.splats
        self.splats = restored
        try:
            metrics = self.eval(stage=f"compress_{method}")
        finally:
            pass  # keep decoded splats? reference replaces them; we restore.
        self.splats = backup
        size = compressed_size(compress_dir)
        metrics["size_bytes"] = size
        return metrics
