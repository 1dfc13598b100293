"""Opacity-suppressor micro-experiment (round-5 forensics, CPU).

The full-res garden ladders (r4 AND r5) spent their refine window with
every splat below opacity 0.09 — a translucent-mist operating point.
This 600-step 128x96 ladder separates the candidate suppressors:
compression sim / rd_lambda / opacity+scale regs, with MCMC at cap.
Result (committed in the commit message + ROADMAP): all four legs grow
max opacity to ~0.95 and reach ~29.5-29.9 PSNR — none of those knobs
suppresses opacity at small scale. The suppressor was the full-scale
refine-window dynamic (relocation mill at an all-low-opacity state with
isect saturation), closed by the relocation min-opacity clamp + scale
floor + post-refine convergence (see garden_ladder_r5).
"""

import os, sys, json, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from examples.synthetic_benchmark import build_scene, ListDataset, SceneParser
from gscodec_studio_tpu.training.trainer import Config, Runner

rng = np.random.default_rng(0)
pts, rgb, views = build_scene(rng, 3000, 10, 128, 96)
parser = SceneParser()
parser.points = pts + 0.03*rng.standard_normal(pts.shape).astype(np.float32)
parser.points_rgb = (rgb*255).astype(np.uint8)
parser.points_err = np.zeros(len(pts))
parser.scene_scale = 6.0
train = ListDataset([v for i,v in enumerate(views) if i%8!=0])
val = ListDataset([v for i,v in enumerate(views) if i%8==0])

def run(tag, **kw):
    cfg = Config(result_dir=f"/tmp/opdiag_{tag}", max_steps=600,
                 sh_degree=1, sh_degree_interval=100,
                 strategy="mcmc", mcmc_cap_max=8000,
                 isect_capacity=1<<18, steps_per_dispatch=25,
                 refine_stop_iter=500,
                 eval_steps=(), save_steps=(), **kw)
    r = Runner(cfg, parser=parser, trainset=train, valset=val)
    r.train(log_every=0)
    op = np.asarray(r.splats["opacities"]); sig = 1/(1+np.exp(-op))
    m = r.eval("d")
    print(json.dumps({"tag": tag, "max_op": round(float(sig.max()),3),
        "frac>0.5": round(float((sig>0.5).mean()),4),
        "psnr": round(m["psnr"],2)}), flush=True)

run("nosim")
run("sim", compression_sim=True, entropy_model_opt=True,
    shN_ada_mask_opt=True, rd_lambda=0.01,
    opacity_reg=0.01, scale_reg=0.01)
run("sim_nord", compression_sim=True, entropy_model_opt=True,
    shN_ada_mask_opt=True, rd_lambda=0.0,
    opacity_reg=0.01, scale_reg=0.01)
run("nosim_regs", opacity_reg=0.01, scale_reg=0.01)
