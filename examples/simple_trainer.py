"""CLI entry: static 3DGS training (reference examples/simple_trainer.py).

Usage:
    python examples/simple_trainer.py default --data-dir data/garden
    python examples/simple_trainer.py mcmc --data-dir data/garden \
        --compression-sim true --entropy-model-opt true
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gscodec_studio_tpu.training.trainer import Config, Runner
from gscodec_studio_tpu.utils.cli import parse_config

PRESETS = {
    # simple_trainer.py:1555-1575 named presets
    "default": Config(strategy="default"),
    "mcmc": Config(
        strategy="mcmc", opacity_reg=0.01, scale_reg=0.01, init_opa=0.5,
        init_scale=0.1,
    ),
}


def main():

    import os as _os

    if _os.environ.get("JAX_PLATFORMS"):  # honor JAX_PLATFORMS (axon relay)
        import jax

        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    cfg = parse_config(Config, PRESETS)
    runner = Runner(cfg)
    runner.train()
    metrics = runner.eval()
    print("eval:", metrics)
    runner.save_checkpoint(cfg.max_steps)
    runner.save_ply(os.path.join(cfg.result_dir, "point_cloud.ply"))
    if cfg.compression_sim:
        print("compression:", runner.run_compression(cfg.max_steps, "png"))


if __name__ == "__main__":
    main()
