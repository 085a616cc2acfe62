"""First-order (Adam) 3DGS trainer.

CLI + training loop equivalent of the reference's train.py:43-286: random
view per iteration, (1-λ)L1 + λ(1-SSIM) (+ scheduled depth L1), Adam with
per-group LRs, SH-degree ramp, densify/prune window, opacity resets,
periodic eval/save/checkpoint. The per-iteration work (render, loss, grads,
Adam, densification stats) is ONE jitted XLA program; densification events
and opacity resets are separate jitted calls on the host schedule.

Usage: python -m gslm_tpu.train -s <dataset> -m <output> [flags]
"""

from __future__ import annotations

import functools
import os
import random
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu import config as cfg_mod
from gslm_tpu.checkpoint import load_checkpoint, save_checkpoint
from gslm_tpu.densify import add_densification_stats, densify_and_prune, reset_opacity
from gslm_tpu.models.cameras import CameraBatch, batch_from_metas
from gslm_tpu.models.scene import Scene
from gslm_tpu.optim import adam_step, group_learning_rates, init_adam
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.solver.residuals import scalar_training_loss
from gslm_tpu.utils.general import get_expon_lr_func
from gslm_tpu.utils.image import psnr


def make_raster_config(tpu: cfg_mod.TpuParams, pipe: cfg_mod.PipelineParams,
                       height: int, width: int, n_gaussians: int) -> RasterConfig:
    """Heuristic rasterizer capacities for a scene size."""
    tiles = (-(-height // 16)) * (-(-width // 16))
    dup = min(tpu.dup_capacity, max(1 << 14, 16 * n_gaussians))
    # with exact culling the surviving stream is measured ~82% of the
    # opacity-aware AABB stream; 87.5% keeps margin while shrinking every
    # post-sort stage (gather, compositor, backward cotangent scatter)
    live = tpu.live_capacity or (dup - (dup >> 3) if tpu.raster_cull else 0)
    live = (live // 256) * 256        # pack-multiple for any raster_pack
    return RasterConfig(dup_capacity=dup,
                        max_per_tile=tpu.max_per_tile,
                        tile_chunk=min(tpu.tile_chunk, tiles),
                        antialiasing=pipe.antialiasing,
                        impl=tpu.raster_impl,
                        pack=tpu.raster_pack,
                        cull=tpu.raster_cull,
                        live_capacity=live,
                        mp_route_capacity=tpu.mp_route_capacity)


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "opt", "active_sh_degree", "use_exp",
                     "sparse_adam", "update_stats"))
def train_step(params, aux, opt_state, cam: CameraBatch, bg, step,
               spatial_lr_scale, depth_weight, *, rcfg: RasterConfig,
               opt: cfg_mod.OptimizationParams, active_sh_degree: int,
               use_exp: bool, sparse_adam: bool, update_stats: bool):
    """One Adam iteration over a (usually B=1) camera batch."""

    def loss_fn(p, m2d):
        loss, info = scalar_training_loss(
            p, cam, bg, config=rcfg, lambda_dssim=opt.lambda_dssim,
            use_trained_exp=use_exp, active_sh_degree=active_sh_degree,
            alive=aux.alive, mean2d_offset=m2d)
        out = info["render"]
        # depth regularization (reference train.py:129-140)
        npix = jnp.maximum(jnp.sum(cam.depth_mask), 1.0)
        depth_l1 = jnp.sum(jnp.abs(out.invdepth - cam.invdepth_gt)
                           * cam.depth_mask) / npix
        loss = loss + depth_weight * depth_l1
        return loss, (info, depth_l1)

    m2d0 = jnp.zeros((params.capacity, 2), jnp.float32)
    (loss, (info, depth_l1)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, m2d0)
    g_params, g_m2d = grads

    out = info["render"]
    radii = jnp.max(out.radii, axis=0)             # (P,) over batch views
    if update_stats:
        # stats accumulate the sum of per-view screen gradients: undo the
        # mean-over-views 1/B so magnitudes don't depend on batch size (and
        # match the data-parallel psum path, parallel/steps.py)
        aux = add_densification_stats(aux, g_m2d * cam.batch_size, radii)

    lrs = group_learning_rates(opt, step, spatial_lr_scale)
    visible = (radii > 0) if sparse_adam else None
    params, opt_state = adam_step(params, g_params, opt_state, lrs, visible)

    metrics = {"loss": loss, "l1": jnp.mean(info["l1"]),
               "depth_l1": depth_l1,
               "psnr": jnp.mean(psnr(out.render, cam.gt_image)),
               "overflow": jnp.max(out.overflow),
               "max_tile_load": jnp.max(out.max_tile_load)}
    return params, aux, opt_state, metrics


def evaluate(params, aux, cams: CameraBatch, bg, rcfg, active_sh_degree,
             use_exp) -> dict:
    from gslm_tpu.renderer import batch_render_jit
    out = batch_render_jit(params, cams, bg, config=rcfg,
                           active_sh_degree=active_sh_degree,
                           use_trained_exp=use_exp, alive=aux.alive)
    l1 = jnp.mean(jnp.abs(out.render - cams.gt_image))
    return {"l1": float(l1),
            "psnr": float(jnp.mean(psnr(out.render, cams.gt_image)))}


def training(args, *, lm_phase_hook=None):
    from gslm_tpu.utils.general import safe_state
    safe_state(getattr(args, "quiet", False))
    if getattr(args, "platform", ""):
        # must beat the ambient JAX_PLATFORMS preset before backend init
        jax.config.update("jax_platforms", args.platform)
    from gslm_tpu.parallel.mesh import maybe_initialize_distributed
    if maybe_initialize_distributed():
        print(f"jax.distributed up: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} devices")
    if getattr(args, "detect_anomaly", False):
        from gslm_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging()
    model = cfg_mod.extract(args, cfg_mod.ModelParams)
    opt = cfg_mod.extract(args, cfg_mod.OptimizationParams)
    pipe = cfg_mod.extract(args, cfg_mod.PipelineParams)
    tpu = cfg_mod.extract(args, cfg_mod.TpuParams)

    scene = Scene(model.source_path, model.model_path, images=model.images,
                  depths=model.depths, resolution=model.resolution,
                  white_background=model.white_background,
                  eval_split=model.eval, train_test_exp=model.train_test_exp,
                  sh_degree=model.sh_degree,
                  capacity=tpu.capacity or None)
    cfg_mod.save_cfg_args(model.model_path, args)

    params, aux = scene.params, scene.aux
    opt_state = init_adam(params)
    first_iter = 0
    spatial_lr_scale = scene.cameras_extent
    if getattr(args, "start_checkpoint", ""):
        params, aux, opt_state, first_iter, spatial_lr_scale = \
            load_checkpoint(args.start_checkpoint)
        print(f"Restored checkpoint at iteration {first_iter}")

    train_metas = scene.get_train_cameras()
    all_train = batch_from_metas(train_metas)
    test_metas = scene.get_test_cameras()
    all_test = batch_from_metas(
        test_metas, pad_hw=(all_train.height, all_train.width)) \
        if test_metas else None

    rcfg = make_raster_config(tpu, pipe, all_train.height, all_train.width,
                              params.capacity)
    if not any(m.depth_reliable for m in train_metas):
        # no usable depth maps → the depth-L1 term is identically zero;
        # trim the invdepth cotangent reductions from the Pallas backward
        rcfg = rcfg.replace(depth_grad=False)

    # --- multi-chip: shard_map steps over a device mesh ------------------
    # mesh_model == 1: data-parallel (params replicated, views sharded).
    # mesh_model > 1: model-parallel raster (Gaussians sharded over
    # "model", tile-row bands per shard, shard-local densify + cross-shard
    # rebalance — parallel/model_raster.py).
    mesh = None
    mp_mode = False
    dp_cache: dict = {}
    mp_densify_fn = None
    if tpu.mesh_data * tpu.mesh_model > 1:
        from gslm_tpu.parallel import make_mesh
        mesh = make_mesh(tpu.mesh_data, tpu.mesh_model)
        mp_mode = tpu.mesh_model > 1
        if mp_mode:
            assert params.capacity % tpu.mesh_model == 0, \
                (params.capacity, tpu.mesh_model)
            from gslm_tpu.parallel import make_mp_densify
            mp_densify_fn = make_mp_densify(mesh, params, opt_state)
        print(f"{'Model' if mp_mode else 'Data'}-parallel training over "
              f"mesh {dict(mesh.shape)} ({tpu.mesh_data} views/step)")

    def get_step_fn(active_sh: int, update_stats: bool):
        if mesh is None:
            return None
        key = (active_sh, update_stats)
        if key not in dp_cache:
            kw = dict(rcfg=rcfg, opt=opt, active_sh_degree=active_sh,
                      use_exp=model.train_test_exp,
                      sparse_adam=opt.optimizer_type == "sparse_adam",
                      update_stats=update_stats)
            if mp_mode:
                from gslm_tpu.parallel import make_mp_train_step
                dp_cache[key] = make_mp_train_step(mesh, params, opt_state,
                                                   **kw)
            else:
                from gslm_tpu.parallel import make_dp_train_step
                dp_cache[key] = make_dp_train_step(mesh, **kw)
        return dp_cache[key]
    bg_default = jnp.ones(3) if model.white_background else jnp.zeros(3)
    depth_w_fn = get_expon_lr_func(opt.depth_l1_weight_init,
                                   opt.depth_l1_weight_final,
                                   max_steps=opt.iterations)
    sparse = opt.optimizer_type == "sparse_adam"

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(model.model_path)
    except Exception:
        print("Tensorboard not available: not logging progress")

    test_iterations = set(getattr(args, "test_iterations", None)
                          or [7000, 30000])
    save_iterations = set(getattr(args, "save_iterations", None)
                          or [7000, 30000])
    ckpt_iterations = set(getattr(args, "checkpoint_iterations", None) or [])

    viewer = None
    if not getattr(args, "disable_viewer", False):
        try:
            from gslm_tpu.viewer import ViewerServer
            viewer = ViewerServer(getattr(args, "ip", "127.0.0.1"),
                                  getattr(args, "port", 6009))
        except OSError as e:
            print(f"Viewer server disabled ({e})")

    key = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    indices: list[int] = []
    ema_loss = 0.0
    t_start = time.time()
    jvp_start = getattr(args, "jvp_start", opt.iterations + 1)

    from gslm_tpu.utils.profiling import IterTimer
    iter_timer = IterTimer()
    profile_dir = getattr(args, "profile_dir", "")
    profile_from = getattr(args, "profile_from", 50)
    profile_until = profile_from + getattr(args, "profile_steps", 10)
    profiling = False

    from tqdm import tqdm
    progress = tqdm(range(first_iter, opt.iterations), desc="Training")
    for it_idx in progress:
        iteration = it_idx + 1
        if profile_dir:
            if iteration == profile_from and not profiling:
                jax.block_until_ready(params.xyz)
                jax.profiler.start_trace(profile_dir)
                profiling = True
            elif iteration == profile_until and profiling:
                jax.block_until_ready(params.xyz)
                jax.profiler.stop_trace()
                profiling = False
                print(f"\n[ITER {iteration}] wrote profiler trace to "
                      f"{profile_dir}")
        active_sh = min(iteration // 1000, params.sh_degree)
        if viewer is not None:
            viewer.poll(params, aux, bg_default, rcfg=rcfg,
                        active_sh_degree=active_sh,
                        source_path=model.source_path,
                        training_done=iteration >= opt.iterations)
        if lm_phase_hook is not None and iteration >= jvp_start:
            # LM outer loop (train_lm.py drives it); eval/save/checkpoint
            # AND the densify/opacity-reset schedule below still apply
            # (reference train_jvp.py:294-341 keeps them active), and LM
            # iterations log to TB/progress like first-order ones
            # (train_jvp.py:373 logs every LM iteration)
            hook_out = lm_phase_hook(
                scene, params, aux, opt_state, iteration, all_train, rcfg,
                bg_default)
            params, aux, opt_state = hook_out[:3]
            lm_info = hook_out[3] if len(hook_out) > 3 else None
            if len(hook_out) > 4 and hook_out[4] is not None \
                    and hook_out[4] != rcfg:
                rcfg = hook_out[4]        # LM overflow retry grew capacities
                dp_cache.clear()          # mesh steps baked the old rcfg
            loss_f = float(lm_info["best_val_loss"]) if lm_info else 0.0
            ema_loss = 0.4 * loss_f + 0.6 * ema_loss
            progress.set_postfix({"ValLoss": f"{ema_loss:.7f}",
                                  "P": int(np.asarray(aux.num_alive))})
            iter_ms = iter_timer.tick()
            if writer is not None and lm_info is not None:
                writer.add_scalar("train_loss_patches/total_loss",
                                  float(lm_info["start_loss"]), iteration)
                writer.add_scalar("lm/best_val_loss", loss_f, iteration)
                writer.add_scalar("lm/best_alpha",
                                  float(lm_info["best_alpha"]), iteration)
                writer.add_scalar("iter_time", iter_ms, iteration)
        else:
            if getattr(args, "sgd_batch", False) or mesh is not None:
                # multi-view window (train_sgd path / one view per data
                # shard in mesh mode)
                from gslm_tpu.train_sgd import select_window
                n_views = getattr(args, "num_images", 5) \
                    if getattr(args, "sgd_batch", False) else tpu.mesh_data
                if mesh is not None:
                    n_views = max(n_views, tpu.mesh_data)
                    n_views -= n_views % tpu.mesh_data   # shardable count
                win = select_window(len(train_metas), n_views, np_rng)
                idx = win[0]
                cam = jax.tree.map(lambda x: x[jnp.asarray(win)], all_train)
                # per-view depth gating: zero unreliable views' depth
                # masks instead of gating the whole window on win[0]
                rel = np.array([train_metas[i].depth_reliable for i in win],
                               np.float32)
                depth_ok = bool(rel.any())
                if not rel.all():
                    cam = cam.replace(depth_mask=cam.depth_mask *
                                      jnp.asarray(rel)[:, None, None, None])
            else:
                if not indices:
                    indices = list(range(len(train_metas)))
                    random.shuffle(indices)
                idx = indices.pop()
                cam = jax.tree.map(lambda x: x[idx:idx + 1], all_train)
                depth_ok = train_metas[idx].depth_reliable

            if opt.random_background:
                key, sub = jax.random.split(key)
                bg = jax.random.uniform(sub, (3,))
            else:
                bg = bg_default

            in_densify = iteration < opt.densify_until_iter
            dw = depth_w_fn(iteration) if depth_ok else 0.0

            # overflow recovery (reference resizes its CUDA buffers on
            # demand; XLA capacities are static, so re-run the step from
            # the pre-step state at doubled dup_capacity — degraded
            # renders never reach the parameters)
            params0, aux0, opt0 = params, aux, opt_state
            for attempt in range(3):
                dp_fn = get_step_fn(active_sh, in_densify)
                if dp_fn is not None:
                    params, aux, opt_state, metrics = dp_fn(
                        params0, aux0, opt0, cam, bg, jnp.int32(iteration),
                        jnp.float32(spatial_lr_scale), jnp.float32(dw))
                else:
                    params, aux, opt_state, metrics = train_step(
                        params0, aux0, opt0, cam, bg, iteration,
                        spatial_lr_scale, dw,
                        rcfg=rcfg, opt=opt, active_sh_degree=active_sh,
                        use_exp=model.train_test_exp, sparse_adam=sparse,
                        update_stats=in_densify)
                if int(metrics["overflow"]) == 0:
                    break
                rcfg = rcfg.grow()
                dp_cache.clear()
                print(f"\n[ITER {iteration}] duplicate-buffer overflow: "
                      f"retrying at dup_capacity={rcfg.dup_capacity}")
            else:
                print(f"\n[ITER {iteration}] WARNING: overflow persists "
                      f"after retries (dup_capacity={rcfg.dup_capacity}); "
                      f"this step used a degraded render")

            loss_f = float(metrics["loss"])
            ema_loss = 0.4 * loss_f + 0.6 * ema_loss
            if iteration % 10 == 0:
                progress.set_postfix({"Loss": f"{ema_loss:.7f}",
                                      "P": int(np.asarray(aux.num_alive))})
            iter_ms = iter_timer.tick()
            if writer is not None:
                writer.add_scalar("train_loss_patches/total_loss", loss_f,
                                  iteration)
                writer.add_scalar("train_loss_patches/l1_loss",
                                  float(metrics["l1"]), iteration)
                writer.add_scalar("iter_time", iter_ms, iteration)

        # --- densification schedule (reference train.py:160-174; stays
        # active in the LM phase like train_jvp.py:294-341) ---
        if iteration < opt.densify_until_iter \
                and iteration > opt.densify_from_iter \
                and iteration % opt.densification_interval == 0:
            key, sub = jax.random.split(key)
            size_thr = 20.0 if iteration > opt.opacity_reset_interval else 0.0
            densify_fn = mp_densify_fn or densify_and_prune
            params, aux, opt_state, info = densify_fn(
                params, aux, opt_state, sub, opt.densify_grad_threshold,
                0.005, scene.cameras_extent, size_thr, opt.percent_dense)
            if int(info["n_dropped"]) > 0:
                print(f"\n[ITER {iteration}] capacity full: dropped "
                      f"{int(info['n_dropped'])} densification requests "
                      f"(capacity={params.capacity})")
        if iteration < opt.densify_until_iter and (
                iteration % opt.opacity_reset_interval == 0 or (
                    model.white_background
                    and iteration == opt.densify_from_iter)):
            params, opt_state = reset_opacity(params, opt_state)

        if iteration in test_iterations:
            stats = {"train": evaluate(params, aux,
                                       jax.tree.map(lambda x: x[:min(5, len(train_metas))], all_train),
                                       bg_default, rcfg, active_sh,
                                       model.train_test_exp)}
            if all_test is not None:
                stats["test"] = evaluate(params, aux, all_test, bg_default,
                                         rcfg, active_sh, model.train_test_exp)
            print(f"\n[ITER {iteration}] " + "  ".join(
                f"{k}: L1 {v['l1']:.4f} PSNR {v['psnr']:.2f}"
                for k, v in stats.items()))
            if writer is not None:
                for k, v in stats.items():
                    writer.add_scalar(f"{k}/loss_viewpoint_psnr", v["psnr"],
                                      iteration)
                # reference training_report extras (train.py:221-256):
                # first rendered test images, opacity histogram, point count
                try:
                    from gslm_tpu.renderer import batch_render_jit
                    show = jax.tree.map(lambda x: x[:5], all_train)
                    out = batch_render_jit(params, show, bg_default,
                                           config=rcfg,
                                           active_sh_degree=active_sh,
                                           use_trained_exp=model.train_test_exp,
                                           alive=aux.alive)
                    for i in range(out.render.shape[0]):
                        writer.add_image(
                            f"renders/view_{i:03d}",
                            np.asarray(out.render[i]), iteration)
                    writer.add_histogram(
                        "scene/opacity_histogram",
                        np.asarray(jax.nn.sigmoid(
                            params.opacity[np.asarray(aux.alive), 0])),
                        iteration)
                    writer.add_scalar("total_points",
                                      int(np.asarray(aux.num_alive)),
                                      iteration)
                except Exception as e:     # TB extras must never kill a run
                    print(f"(tensorboard extras skipped: {e})")
        if iteration in save_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, params, aux)
        if iteration in ckpt_iterations:
            save_checkpoint(os.path.join(model.model_path,
                                         f"chkpnt{iteration}.npz"),
                            params, aux, opt_state, iteration,
                            spatial_lr_scale)

    print(f"\nTraining complete in {time.time() - t_start:.1f}s")
    scene.params, scene.aux = params, aux
    return scene, params, aux, opt_state


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="TPU 3DGS training")
    cfg_mod.add_all_args(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="raise on the first NaN (jax_debug_nans)")
    parser.add_argument("--platform", type=str, default="",
                        help="force a jax platform (e.g. cpu for virtual-"
                             "device mesh testing)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of iterations "
                             "profile_from..profile_from+profile_steps")
    parser.add_argument("--profile_from", type=int, default=50)
    parser.add_argument("--profile_steps", type=int, default=10)
    return parser


def main():
    parser = build_parser()
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)
    print("Optimizing " + args.model_path)
    training(args)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
