"""End-to-end two-phase (Adam -> LM) trainer smoke on the real chip:
synthetic COLMAP scene, pallas raster impl, densification, LM outer
steps, PLY/checkpoint save. Run: PYTHONPATH=. python scripts/smoke_tpu_cli.py
"""
import sys, tempfile, os
sys.path.insert(0, "/root/repo")
from argparse import Namespace
import dataclasses
import gslm_tpu.config as cfg_mod
from tests.synthetic_scene import build_colmap_scene

base = {}
for cls in (cfg_mod.ModelParams, cfg_mod.PipelineParams,
            cfg_mod.OptimizationParams, cfg_mod.LMParams, cfg_mod.TpuParams):
    for f in dataclasses.fields(cls):
        base[f.name] = f.default

d = tempfile.mkdtemp()
src = build_colmap_scene(os.path.join(d, "scene"), n_views=6, height=128,
                         width=128)
base.update(source_path=src, model_path=os.path.join(d, "model"),
            iterations=120, jvp_start=80, num_images=3, num_val_views=3,
            val_view_stride=1, cg_max_iter=2, line_search_steps=4,
            densify_from_iter=10, densification_interval=30,
            densify_until_iter=70, opacity_reset_interval=1000,
            position_lr_max_steps=120, test_iterations=[120],
            save_iterations=[120], checkpoint_iterations=[120],
            start_checkpoint="", capacity=1024, dup_capacity=1 << 15,
            max_per_tile=256, tile_chunk=16, raster_impl="auto",
            disable_viewer=True)
args = Namespace(**base)
args.save_iterations = list(args.save_iterations)

from gslm_tpu.train_lm import lm_phase
import numpy as np
from gslm_tpu.train import training
import jax
lm = cfg_mod.extract(args, cfg_mod.LMParams)
model = cfg_mod.extract(args, cfg_mod.ModelParams)
opt = cfg_mod.extract(args, cfg_mod.OptimizationParams)
rng = np.random.default_rng(0)

def hook(scene, params, aux, opt_state, iteration, all_train, rcfg, bg):
    active_sh = min(iteration // 1000, params.sh_degree)
    params, info, rcfg = lm_phase(scene, params, aux, all_train, rcfg, bg,
                                  lm, iteration, rng, model.train_test_exp,
                                  opt.lambda_dssim, active_sh, verbose=False)
    return params, aux, opt_state, info, rcfg

print("device:", jax.devices()[0])
scene, params, aux, opt_state = training(args, lm_phase_hook=hook)
import jax.numpy as jnp
assert bool(jnp.all(jnp.isfinite(params.xyz)))
print("TPU LM CLI SMOKE OK (pallas impl, two-phase, densified, saved)")
