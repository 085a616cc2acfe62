"""Two-phase LM trainer tests (reference train_jvp.py behavior)."""

import numpy as np
import pytest

import gslm_tpu.config as cfg_mod
from tests.synthetic_scene import build_colmap_scene
from tests.test_train_e2e import _args


def test_lm_phase_reduces_loss(tmp_path):
    """Phase 2 on a slightly-trained model must reduce the residual loss
    across LM outer steps (the train_jvp.py core loop)."""
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import batch_from_metas
    from gslm_tpu.models.scene import Scene
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.train_lm import lm_phase

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    scene = Scene(src, str(tmp_path / "model"), resolution=1, shuffle=False,
                  capacity=64)
    params, aux = scene.params, scene.aux
    all_train = batch_from_metas(scene.get_train_cameras())
    rcfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    bg = jnp.zeros(3)
    lm = cfg_mod.LMParams(num_images=3, num_val_views=6, val_view_stride=1,
                          mask_xyz=False)
    rng = np.random.default_rng(0)

    losses = []
    for it in range(4):
        params, info, rcfg = lm_phase(scene, params, aux, all_train, rcfg,
                                      bg, lm, it, rng, False, 0.2, 0,
                                      verbose=False)
        losses.append(float(info["best_val_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    # xyz was NOT masked here: step must include xyz movement
    assert float(info["step_norms"]["xyz"]) > 0


@pytest.mark.slow
def test_lm_mask_xyz_freezes_positions(tmp_path):
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import batch_from_metas
    from gslm_tpu.models.scene import Scene
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.train_lm import lm_phase

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=4)
    scene = Scene(src, str(tmp_path / "model"), resolution=1, shuffle=False,
                  capacity=64)
    all_train = batch_from_metas(scene.get_train_cameras())
    rcfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    lm = cfg_mod.LMParams(num_images=2, num_val_views=4, val_view_stride=1,
                          mask_xyz=True)
    params0 = scene.params
    params, info, _ = lm_phase(scene, params0, scene.aux, all_train, rcfg,
                               jnp.zeros(3), lm, 0, np.random.default_rng(0),
                               False, 0.2, 0, verbose=False)
    # xyz frozen by the group mask (reference default, train_jvp.py:221-228)
    np.testing.assert_array_equal(np.asarray(params.xyz),
                                  np.asarray(params0.xyz))
    assert float(info["step_norms"]["xyz"]) == 0.0
    assert float(info["step_norms"]["features_dc"]) > 0.0


@pytest.mark.slow
def test_two_phase_cli_e2e(tmp_path):
    """Full CLI path: Adam phase → LM phase via the hook."""
    from gslm_tpu.train import training
    from gslm_tpu.train_lm import lm_phase
    import gslm_tpu.config as cfg

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    args = _args(src, str(tmp_path / "model"), iterations=30, jvp_start=21,
                 densify_from_iter=1000, num_images=3, num_val_views=6,
                 val_view_stride=1, test_iterations=[30],
                 save_iterations=[30], checkpoint_iterations=[])

    lm = cfg.extract(args, cfg.LMParams)
    model = cfg.extract(args, cfg.ModelParams)
    opt = cfg.extract(args, cfg.OptimizationParams)
    rng = np.random.default_rng(0)
    lm_iters = []

    def hook(scene, params, aux, opt_state, iteration, all_train, rcfg, bg):
        lm_iters.append(iteration)
        params, _, rcfg = lm_phase(scene, params, aux, all_train, rcfg, bg,
                                   lm, iteration, rng, model.train_test_exp,
                                   opt.lambda_dssim, 0, verbose=False)
        return params, aux, opt_state, None, rcfg

    scene, params, aux, _ = training(args, lm_phase_hook=hook)
    assert lm_iters and lm_iters[0] == 21 and lm_iters[-1] == 30


@pytest.mark.slow
def test_lm_overflow_retry_grows_capacity(tmp_path):
    """Forcing an undersized record buffer mid-LM-phase must trigger the
    probe-and-grow retry (VERDICT r2 weak #5): the returned rcfg has grown
    capacities, the step still reduces the val loss, and a roomy config is
    left untouched."""
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import batch_from_metas
    from gslm_tpu.models.scene import Scene
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import overflow_probe_jit
    from gslm_tpu.train_lm import lm_phase

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=4)
    scene = Scene(src, str(tmp_path / "model"), resolution=1, shuffle=False,
                  capacity=64)
    all_train = batch_from_metas(scene.get_train_cameras())
    lm = cfg_mod.LMParams(num_images=2, num_val_views=4, val_view_stride=1)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(0)

    # size the starvation so ONE doubling fits: need/2 < cap <= need
    roomy = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    window = __import__("jax").tree.map(lambda x: x[:2], all_train)
    need = int(overflow_probe_jit(scene.params, window, config=roomy,
                                  alive=scene.aux.alive)["n_aabb"])
    small = roomy.replace(dup_capacity=(need // 2 + 1 + 7) // 8 * 8,
                          live_capacity=(need // 2 + 1 + 7) // 8 * 8)

    params, info, grown = lm_phase(scene, scene.params, scene.aux, all_train,
                                   small, bg, lm, 0, rng, False, 0.2, 0,
                                   verbose=False)
    assert grown.dup_capacity >= 2 * small.dup_capacity
    assert grown.live_capacity == grown.dup_capacity \
        or grown.live_capacity >= 2 * small.live_capacity
    # start_loss is over the 2-view window, best_val_loss over the 4 val
    # views — not comparable; loss reduction is pinned by
    # test_lm_phase_reduces_loss. Here: the step ran on the grown config
    # and produced finite, real movement.
    assert np.isfinite(float(info["best_val_loss"]))
    assert not np.array_equal(np.asarray(params.features_dc),
                              np.asarray(scene.params.features_dc))
    # a sufficient config passes through unchanged
    _, _, same = lm_phase(scene, scene.params, scene.aux, all_train, roomy,
                          bg, lm, 1, np.random.default_rng(1), False, 0.2, 0,
                          verbose=False)
    assert same == roomy


@pytest.mark.slow
def test_lm_probe_respects_micro_batch(tmp_path):
    """Capacities bound ONE render, and micro-batching renders the window
    in chunks — a capacity that fits every 2-view chunk but not the 4-view
    window TOTAL must not trigger the grow-and-retry (regression: the
    probe originally summed the whole padded window and spuriously grew
    capacities 8x on chunked runs)."""
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import batch_from_metas
    from gslm_tpu.models.scene import Scene
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import overflow_probe_jit
    from gslm_tpu.train_lm import lm_phase

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=4)
    scene = Scene(src, str(tmp_path / "model"), resolution=1, shuffle=False,
                  capacity=64)
    all_train = batch_from_metas(scene.get_train_cameras())
    lm = cfg_mod.LMParams(num_images=4, micro_batch=2, num_val_views=4,
                          val_view_stride=1)
    big = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    per_view = overflow_probe_jit(scene.params, all_train, config=big,
                                  alive=scene.aux.alive, per_view=True)
    na = np.asarray(per_view["n_aabb"])
    total, chunk_max = int(na.sum()), int(max(
        na[0] + na[1], na[2] + na[3]))
    assert chunk_max < total
    cap = ((chunk_max + total) // 2 + 7) // 8 * 8   # fits chunks, not total
    mid = big.replace(dup_capacity=cap, live_capacity=cap)
    _, _, same = lm_phase(scene, scene.params, scene.aux, all_train, mid,
                          jnp.zeros(3), lm, 0, np.random.default_rng(0),
                          False, 0.2, 0, verbose=False)
    assert same == mid, (same.dup_capacity, mid.dup_capacity)


@pytest.mark.slow
def test_lm_staged_line_search(tmp_path):
    """ls_subset_views > 0: alphas are ranked on a val subset and only the
    winner is scored on the full set. With the subset covering ALL val
    views the result must match the reference-faithful path exactly; with
    a genuine subset, best_val_loss must equal the FULL-set loss at the
    chosen alpha (not the subset ranking score)."""
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import batch_from_metas
    from gslm_tpu.models.scene import Scene
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.train_lm import lm_outer_step

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    scene = Scene(src, str(tmp_path / "model"), resolution=1, shuffle=False,
                  capacity=64)
    all_train = batch_from_metas(scene.get_train_cameras())
    rcfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    bg = jnp.zeros(3)
    window = jax.tree.map(lambda x: x[:2], all_train)
    val = jax.tree.map(lambda x: x[2:6], all_train)
    base = cfg_mod.LMParams(num_images=2, micro_batch=2, num_val_views=4,
                            val_view_stride=1, line_search_steps=3)

    def run(lm):
        p, info = lm_outer_step(scene.params, scene.aux.alive, window, val,
                                bg, rcfg=rcfg, lm=lm, active_sh_degree=0,
                                use_exp=False)
        return p, info

    import dataclasses as _dc
    p_ref, i_ref = run(base)
    # subset == all views (4 -> 2 chunks of 2): identical selection + loss
    p_all, i_all = run(_dc.replace(base, ls_subset_views=4))
    assert float(i_all["best_alpha"]) == float(i_ref["best_alpha"])
    np.testing.assert_allclose(float(i_all["best_val_loss"]),
                               float(i_ref["best_val_loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_all.features_dc),
                               np.asarray(p_ref.features_dc), rtol=1e-6)

    # genuine subset (first chunk only): best_val_loss is the full-set
    # loss of the chosen alpha — recompute it independently
    p_sub, i_sub = run(_dc.replace(base, ls_subset_views=2))
    a = float(i_sub["best_alpha"])
    alphas_ref = [2.0 * 0.5 ** i for i in range(4)]
    k = alphas_ref.index(a)
    # the reference path's full-set losses at each alpha
    np.testing.assert_allclose(float(i_sub["best_val_loss"]),
                               float(np.asarray(i_ref["val_losses"])[k]),
                               rtol=1e-5)


@pytest.mark.slow
def test_lm_resolution_staged_line_search(tmp_path):
    """ls_val_scale > 1: alphas are ranked on half-resolution val renders
    and the winner re-scored on the full-resolution set — best_val_loss
    must equal the full-res full-set loss of the chosen alpha (the
    reference path's own val_losses at that alpha)."""
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import batch_from_metas
    from gslm_tpu.models.scene import Scene
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.train_lm import lm_outer_step

    src = build_colmap_scene(str(tmp_path / "scene"), n_views=6)
    scene = Scene(src, str(tmp_path / "model"), resolution=1, shuffle=False,
                  capacity=64)
    all_train = batch_from_metas(scene.get_train_cameras())
    rcfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    bg = jnp.zeros(3)
    window = jax.tree.map(lambda x: x[:2], all_train)
    val = jax.tree.map(lambda x: x[2:6], all_train)
    base = cfg_mod.LMParams(num_images=2, micro_batch=2, num_val_views=4,
                            val_view_stride=1, line_search_steps=3)

    def run(lm):
        return lm_outer_step(scene.params, scene.aux.alive, window, val,
                             bg, rcfg=rcfg, lm=lm, active_sh_degree=0,
                             use_exp=False)

    import dataclasses as _dc
    _, i_ref = run(base)
    _, i_res = run(_dc.replace(base, ls_val_scale=2))
    a = float(i_res["best_alpha"])
    alphas_ref = [2.0 * 0.5 ** i for i in range(4)]
    k = alphas_ref.index(a)
    np.testing.assert_allclose(float(i_res["best_val_loss"]),
                               float(np.asarray(i_ref["val_losses"])[k]),
                               rtol=1e-5)
    # composing with the subset axis stays well-formed
    _, i_both = run(_dc.replace(base, ls_val_scale=2, ls_subset_views=2))
    assert np.isfinite(float(i_both["best_val_loss"]))
