"""End-to-end Adam training on a synthetic COLMAP scene (SURVEY §7 step 4:
'minimum end-to-end slice'): PSNR must climb, densification must run, saves
and checkpoints must round-trip."""

import os
from argparse import Namespace

import numpy as np
import pytest

import gslm_tpu.config as cfg_mod
from tests.synthetic_scene import build_colmap_scene


def _args(src, model, **over):
    base = {}
    for cls in (cfg_mod.ModelParams, cfg_mod.PipelineParams,
                cfg_mod.OptimizationParams, cfg_mod.LMParams,
                cfg_mod.TpuParams):
        import dataclasses
        for f in dataclasses.fields(cls):
            base[f.name] = f.default
    base.update(source_path=src, model_path=model,
                iterations=120,
                densify_from_iter=20, densification_interval=40,
                densify_until_iter=110, opacity_reset_interval=1000,
                position_lr_max_steps=120,
                test_iterations=[120], save_iterations=[120],
                checkpoint_iterations=[120], start_checkpoint="",
                capacity=256, dup_capacity=1 << 12, max_per_tile=128,
                tile_chunk=8)
    base.update(over)
    return Namespace(**base)


@pytest.mark.slow
def test_adam_training_improves_psnr(tmp_path):
    from gslm_tpu.train import evaluate, make_raster_config, training
    from gslm_tpu.models.cameras import batch_from_metas

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    args = _args(src, str(tmp_path / "model"))
    scene, params, aux, opt_state = training(args)

    import jax.numpy as jnp
    cams = batch_from_metas(scene.get_train_cameras())
    rcfg = make_raster_config(cfg_mod.extract(args, cfg_mod.TpuParams),
                              cfg_mod.extract(args, cfg_mod.PipelineParams),
                              cams.height, cams.width, params.capacity)
    final = evaluate(params, aux, cams, jnp.zeros(3), rcfg, 0, False)

    # baseline: evaluate the *initial* model
    from gslm_tpu.models.scene import Scene
    scene0 = Scene(src, str(tmp_path / "model0"), resolution=1,
                   shuffle=False, capacity=256)
    init = evaluate(scene0.params, scene0.aux, cams, jnp.zeros(3), rcfg, 0,
                    False)
    assert final["psnr"] > init["psnr"] + 3.0, (init, final)
    assert final["psnr"] > 22.0, final

    # artifacts written
    mp = str(tmp_path / "model")
    assert os.path.exists(os.path.join(mp, "point_cloud/iteration_120/point_cloud.ply"))
    assert os.path.exists(os.path.join(mp, "chkpnt120.npz"))
    assert os.path.exists(os.path.join(mp, "cfg_args"))


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from gslm_tpu.checkpoint import load_checkpoint, save_checkpoint
    from gslm_tpu.optim import init_adam
    from tests.utils import random_gaussians

    params, aux = random_gaussians(rng, n=32, capacity=64)
    opt_state = init_adam(params)
    opt_state = opt_state.replace(step=jnp.int32(17))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, aux, opt_state, 1234, 2.5)
    p2, a2, o2, it, slr = load_checkpoint(path)
    assert it == 1234 and slr == 2.5
    np.testing.assert_array_equal(np.asarray(p2.xyz), np.asarray(params.xyz))
    np.testing.assert_array_equal(np.asarray(a2.alive), np.asarray(aux.alive))
    assert int(o2.step) == 17


def test_densify_clone_split_prune(rng):
    import jax
    import jax.numpy as jnp
    from gslm_tpu.densify import densify_and_prune
    from gslm_tpu.models.gaussians import init_aux
    from gslm_tpu.optim import init_adam
    from tests.utils import random_gaussians

    params, aux = random_gaussians(rng, n=8, capacity=32)
    opt_state = init_adam(params)
    # mark gaussians 0,1 as high-gradient; 0 small (clone), 1 large (split)
    extent = 1.0
    percent_dense = 0.01
    scaling = np.asarray(params.scaling).copy()
    scaling[0] = np.log(0.001)   # small → clone
    scaling[1] = np.log(0.5)     # large → split
    params = params.replace(scaling=jnp.asarray(scaling))
    accum = np.zeros(32, np.float32)
    accum[[0, 1]] = 1.0
    denom = np.zeros(32, np.float32)
    denom[:8] = 1.0
    aux = aux.replace(xyz_gradient_accum=jnp.asarray(accum),
                      denom=jnp.asarray(denom))
    # make gaussian 2 transparent → pruned
    opacity = np.asarray(params.opacity).copy()
    opacity[2] = -10.0
    params = params.replace(opacity=jnp.asarray(opacity))

    p2, a2, o2, info = densify_and_prune(
        params, aux, opt_state, jax.random.PRNGKey(0), 0.5, 0.005,
        extent, 0.0, percent_dense)
    assert int(info["n_cloned"]) == 1
    assert int(info["n_split"]) == 1
    assert int(info["n_pruned"]) >= 1
    # net alive: 8 + clone(1) + split-child(1) - pruned
    assert int(info["n_alive"]) == 8 + 2 - int(info["n_pruned"])
    # clone is verbatim copy of gaussian 0 in a previously-free slot
    new_rows = np.asarray(a2.alive) & ~np.asarray(aux.alive)
    assert new_rows.sum() == 2
    xyz_new = np.asarray(p2.xyz)[new_rows]
    assert (np.abs(xyz_new - np.asarray(params.xyz)[0]).max(axis=1) < 1e-6).any()
    # split parent was resampled and shrunk
    assert np.allclose(np.asarray(p2.scaling)[1],
                       np.log(0.5) - np.log(1.6), atol=1e-5)


def test_densify_capacity_overflow(rng):
    import jax
    import jax.numpy as jnp
    from gslm_tpu.densify import densify_and_prune
    from gslm_tpu.optim import init_adam
    from tests.utils import random_gaussians

    params, aux = random_gaussians(rng, n=8, capacity=8)  # no free slots
    opt_state = init_adam(params)
    aux = aux.replace(xyz_gradient_accum=jnp.ones(8),
                      denom=jnp.ones(8))
    p2, a2, o2, info = densify_and_prune(
        params, aux, opt_state, jax.random.PRNGKey(0), 0.5, 0.005,
        1.0, 0.0, 0.01)
    assert int(info["n_dropped"]) == 8
    assert int(info["n_alive"]) <= 8


@pytest.mark.slow
def test_mp_mode_training_runs(tmp_path):
    """CLI-level model-parallel mode: mesh (2 data, 2 model), Gaussians
    sharded, shard-local densify + cross-shard rebalance, PSNR climbs."""
    from gslm_tpu.train import evaluate, make_raster_config, training
    from gslm_tpu.models.cameras import batch_from_metas

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    args = _args(src, str(tmp_path / "model_mp"), iterations=60,
                 densify_from_iter=10, densification_interval=20,
                 densify_until_iter=55, test_iterations=[60],
                 save_iterations=[60], checkpoint_iterations=[],
                 mesh_data=2, mesh_model=2, disable_viewer=True)
    scene, params, aux, opt_state = training(args)

    import jax.numpy as jnp
    cams = batch_from_metas(scene.get_train_cameras())
    rcfg = make_raster_config(cfg_mod.extract(args, cfg_mod.TpuParams),
                              cfg_mod.extract(args, cfg_mod.PipelineParams),
                              cams.height, cams.width, params.capacity)
    final = evaluate(params, aux, cams, jnp.zeros(3), rcfg, 0, False)
    assert np.isfinite(final["psnr"]) and final["psnr"] > 10.0, final


@pytest.mark.slow
def test_exposure_training_learns_exposure(rng):
    """use_trained_exp: per-image exposure affines receive gradients and
    move toward compensating a synthetic exposure error (reference
    train.py exposure_optimizer + gaussian_renderer/__init__.py:113-115)."""
    import jax
    import jax.numpy as jnp

    import gslm_tpu.config as cfg_mod
    from gslm_tpu.optim import init_adam
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import batch_render
    from gslm_tpu.train import train_step
    from tests.utils import random_gaussians, ring_camera_batch

    params, aux = random_gaussians(rng, n=96, capacity=128, num_images=3)
    cams = ring_camera_batch(3, 48, 48)
    rcfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=4)
    bg = jnp.zeros(3)
    # ground truth = darkened render: exposure must learn a ~0.7 gain
    gt = batch_render(params, cams, bg, config=rcfg,
                      alive=aux.alive).render * 0.7
    cams = cams.replace(gt_image=gt)

    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    exp0 = np.asarray(params.exposure).copy()
    for it in range(1, 41):
        v = it % 3
        cam = jax.tree.map(lambda x: x[v:v + 1], cams)
        params, aux, opt_state, m = train_step(
            params, aux, opt_state, cam, bg, it, 1.0, 0.0,
            rcfg=rcfg, opt=opt, active_sh_degree=3, use_exp=True,
            sparse_adam=False, update_stats=False)
    exp1 = np.asarray(params.exposure)
    assert not np.allclose(exp1, exp0), "exposure never updated"
    # diagonal gains moved DOWN toward 0.7
    diag0 = exp0[:, [0, 1, 2], [0, 1, 2]].mean()
    diag1 = exp1[:, [0, 1, 2], [0, 1, 2]].mean()
    assert diag1 < diag0 - 1e-3, (diag0, diag1)


def test_random_background_training_smoke(tmp_path):
    from gslm_tpu.train import training

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=4)
    args = _args(src, str(tmp_path / "model_rb"), iterations=10,
                 random_background=True, test_iterations=[10],
                 save_iterations=[10], checkpoint_iterations=[],
                 densify_from_iter=100, disable_viewer=True)
    scene, params, aux, opt_state = training(args)
    import jax.numpy as jnp
    assert bool(jnp.all(jnp.isfinite(params.xyz)))


def test_sharded_checkpoint_roundtrip(tmp_path, rng):
    """orbax sharded checkpoint: save model-sharded state, restore into
    the mesh layout AND onto a single device; values identical."""
    import jax
    import jax.numpy as jnp
    from gslm_tpu.checkpoint import (load_checkpoint_sharded,
                                     save_checkpoint_sharded)
    from gslm_tpu.optim import init_adam
    from gslm_tpu.parallel import make_mesh, shard_state
    from tests.utils import random_gaussians

    params, aux = random_gaussians(rng, n=32, capacity=64)
    opt_state = init_adam(params)
    mesh = make_mesh(4, 2)
    s_params, s_aux, s_opt = shard_state(mesh, params, aux, opt_state)

    path = str(tmp_path / "ckpt_sharded")
    save_checkpoint_sharded(path, s_params, s_aux, s_opt, 777, 3.25)

    p2, a2, o2, it, slr = load_checkpoint_sharded(path, mesh=mesh)
    assert it == 777 and slr == 3.25
    assert "model" in str(p2.xyz.sharding.spec)
    np.testing.assert_array_equal(np.asarray(p2.xyz), np.asarray(params.xyz))
    np.testing.assert_array_equal(np.asarray(a2.alive),
                                  np.asarray(aux.alive))
    np.testing.assert_array_equal(np.asarray(o2.mu.scaling),
                                  np.asarray(opt_state.mu.scaling))

    p3, a3, o3, it3, _ = load_checkpoint_sharded(path)     # unsharded
    np.testing.assert_array_equal(np.asarray(p3.exposure),
                                  np.asarray(params.exposure))


def test_sgd_batch_training_runs(tmp_path):
    """SGD-window trainer (train_sgd path through training()): strided
    multi-view windows, per-view depth gating, densification."""
    from gslm_tpu.train import training

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    args = _args(src, str(tmp_path / "model_sgd"), iterations=30,
                 densify_from_iter=5, densification_interval=10,
                 densify_until_iter=28, test_iterations=[30],
                 save_iterations=[30], checkpoint_iterations=[],
                 num_images=3, disable_viewer=True)
    args.sgd_batch = True
    scene, params, aux, opt_state = training(args)
    import jax.numpy as jnp
    assert bool(jnp.all(jnp.isfinite(params.xyz)))
    assert int(jnp.sum(aux.alive)) > 0
