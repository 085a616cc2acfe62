"""Configuration groups.

Dataclass re-design of the reference's reflective argparse system
(arguments/__init__.py:19-122): same three groups and defaults
(ModelParams:47-64, PipelineParams:66-72, OptimizationParams:74-100), plus
``LMParams`` promoting the LM hyperparameters the reference hardcodes in
train_jvp.py:214-258 (damping, CG iters, micro-batch, line search, val
views) and ``TpuParams`` for mesh/capacity knobs that have no reference
analog (it is single-GPU).

Configs persist to ``cfg_args`` as JSON (the reference ``eval``s a
Namespace repr — arguments/__init__.py:102-122; JSON is the safe
equivalent and render/metrics read either)."""

from __future__ import annotations

import dataclasses
import json
import os
from argparse import ArgumentParser, BooleanOptionalAction, Namespace


@dataclasses.dataclass(frozen=True)
class ModelParams:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    depths: str = ""
    resolution: int = -1
    white_background: bool = False
    train_test_exp: bool = False
    data_device: str = "tpu"
    eval: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineParams:
    convert_SHs_python: bool = False   # accepted for CLI parity; SH always
    compute_cov3D_python: bool = False  # evaluated in the fused preprocess
    debug: bool = False
    antialiasing: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    exposure_lr_init: float = 0.01
    exposure_lr_final: float = 0.001
    exposure_lr_delay_steps: int = 0
    exposure_lr_delay_mult: float = 0.0
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01
    random_background: bool = False
    optimizer_type: str = "default"    # "default" | "sparse_adam"


@dataclasses.dataclass(frozen=True)
class LMParams:
    """Levenberg–Marquardt phase (reference train_jvp.py defaults)."""
    jvp_start: int = 15_001            # train_jvp.py:428
    num_images: int = 5                # LM view-batch size, train_jvp.py:429
    cg_max_iter: int = 2               # train_jvp.py:255
    cg_restart_iter: int = 1           # train_jvp.py:256
    micro_batch: int = 5               # solver micro-batch (reference 20)
    disable_ssim: bool = True          # train_jvp.py:212
    damp_xyz: float = 5e2              # train_jvp.py:229-235
    damp_features_dc: float = 5e-2
    damp_features_rest: float = 5e-2
    damp_scaling: float = 5e-2
    damp_rotation: float = 5e-2
    damp_opacity: float = 5e-2
    damp_exposure: float = 1e1
    mask_xyz: bool = True              # train_jvp.py:221-228
    line_search_alpha0: float = 2.0    # train_jvp.py:264-280
    line_search_steps: int = 6
    num_val_views: int = 50            # train_jvp.py:214-216
    val_view_stride: int = 19
    check_divergence: bool = True
    ls_val_scale: int = 1              # staged line search, resolution
    #                                    axis: rank the alphas on val
    #                                    views rendered at 1/s resolution
    #                                    (2x2-avg-pooled gt, same
    #                                    cameras), then score just the
    #                                    winner on the full-resolution
    #                                    set — best_val_loss stays exact.
    #                                    Cuts ranking render cost ~s^2;
    #                                    composes with ls_subset_views.
    #                                    1 = reference-faithful. Needs
    #                                    H % s == 0 and W % s == 0.
    val_pack: int = 0                  # record packing for the val-view /
    #                                    line-search renders only (0 =
    #                                    inherit the window RasterConfig).
    #                                    These renders are forward-only
    #                                    and one micro-batch chunk is live
    #                                    at a time, so pack=1's faster
    #                                    per-record kernel (~1.8x on v5e)
    #                                    usually wins there even when the
    #                                    window ops need pack=8's 8x
    #                                    smaller HBM stream. Layout-only:
    #                                    same math, f32-reassociation
    #                                    differences at most (the pack
    #                                    variants are parity-gated on
    #                                    hardware, utils/paritycheck.py).
    ls_subset_views: int = 0           # staged line search: rank the
    #                                    alphas on a stride-sampled subset
    #                                    of ~k val views (spread over the
    #                                    camera ring, mirroring the
    #                                    reference's stride-19 selection),
    #                                    then score just the winner
    #                                    on the full set. 0 = reference-
    #                                    faithful (every alpha on every
    #                                    val view, train_jvp.py:264-280).
    #                                    Cuts line-search renders from
    #                                    (steps+1)*num_val_views to
    #                                    (steps+1)*k + num_val_views; can
    #                                    pick a different alpha when the
    #                                    subset ranking disagrees with the
    #                                    full ranking.

    def damp_dict(self) -> dict[str, float]:
        return {"xyz": self.damp_xyz, "features_dc": self.damp_features_dc,
                "features_rest": self.damp_features_rest,
                "scaling": self.damp_scaling, "rotation": self.damp_rotation,
                "opacity": self.damp_opacity, "exposure": self.damp_exposure}


@dataclasses.dataclass(frozen=True)
class TpuParams:
    """TPU-execution knobs (new capability; no reference analog)."""
    capacity: int = 0            # 0 → auto from point count
    dup_capacity: int = 1 << 21  # rasterizer (gaussian, tile) entries
    max_per_tile: int = 1024
    tile_chunk: int = 64
    raster_impl: str = "auto"    # auto | tiled | pallas | ref
    raster_pack: int = 0         # records/row in the Pallas stream (0=env)
    raster_cull: bool = True     # exact ellipse-tile record culling
    live_capacity: int = 0       # post-cull record capacity (0 → auto:
    #                              ~85% of dup_capacity when culling)
    mesh_data: int = 1           # data-parallel axis size (views)
    mesh_model: int = 1          # model-parallel axis size (gaussians)
    mp_route_capacity: int = 0   # routed-record capacity per (src, dst)
    #                              shard pair in the model-parallel raster
    #                              exchange; 0 → all_gather all splats
    cache_dir: str = ""          # persistent XLA compile cache


_GROUPS = {"model": ModelParams, "pipeline": PipelineParams,
           "opt": OptimizationParams, "lm": LMParams, "tpu": TpuParams}

_SHORTHAND = {"source_path": "-s", "model_path": "-m", "images": "-i",
              "depths": "-d", "resolution": "-r", "white_background": "-w"}


def add_all_args(parser: ArgumentParser, groups=("model", "pipeline", "opt",
                                                 "lm", "tpu")):
    for gname in groups:
        cls = _GROUPS[gname]
        grp = parser.add_argument_group(gname)
        for f in dataclasses.fields(cls):
            flags = [f"--{f.name}"]
            if f.name in _SHORTHAND:
                flags.append(_SHORTHAND[f.name])
            if f.type == "bool" or f.type is bool:
                # BooleanOptionalAction so True-default flags can be turned
                # OFF (--no-mask_xyz, --no-disable_ssim, ...): store_true
                # made them permanently True from the CLI, which hid the
                # repo's own best LM configuration (xyz unmasked).
                grp.add_argument(*flags, action=BooleanOptionalAction,
                                 default=f.default)
            else:
                grp.add_argument(*flags, type=type(f.default),
                                 default=f.default)


def extract(args: Namespace, cls):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in vars(args).items() if k in names})


def save_cfg_args(model_path: str, args: Namespace):
    """Persist merged config (reference train.py:200-204 writes cfg_args)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, type(None)))}, f,
                  indent=2)


def get_combined_args(parser: ArgumentParser) -> Namespace:
    """CLI over saved cfg_args (reference arguments/__init__.py:102-122);
    reads our JSON format, falling back to the reference's Namespace repr."""
    import sys
    args_cmdline = parser.parse_args(sys.argv[1:])
    merged = {}
    cfgpath = os.path.join(args_cmdline.model_path or "", "cfg_args")
    if args_cmdline.model_path and os.path.exists(cfgpath):
        text = open(cfgpath).read()
        try:
            merged = json.loads(text)
        except json.JSONDecodeError:
            ns = eval(text, {"Namespace": Namespace})  # reference format
            merged = vars(ns)
    defaults = {a.dest: parser.get_default(a.dest)
                for a in parser._actions if a.dest != "help"}
    for k, v in vars(args_cmdline).items():
        if v is not None and (k not in merged or v != defaults.get(k)):
            merged[k] = v
    return Namespace(**merged)
