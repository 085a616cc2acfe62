"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Strategy per SURVEY.md §4: run the same jitted step sharded vs unsharded
and require allclose — the sharded program must be a pure re-layout (the
collectives GSPMD inserts may only reorder reductions within tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslm_tpu import config as cfg_mod
from gslm_tpu.optim import init_adam
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.parallel import (camera_sharding, make_mesh,
                               make_sharded_lm_step, make_sharded_train_step,
                               shard_state)
from gslm_tpu.train import train_step
from gslm_tpu.train_lm import lm_outer_step
from tests.utils import random_gaussians, ring_camera_batch

RCFG = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=4)


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(3)
    params, aux = random_gaussians(rng, n=48, capacity=256, num_images=4)
    cams = ring_camera_batch(4, 32, 32)
    return params, aux, cams


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()   # defaults: all devices on data
    assert mesh.shape["data"] == len(jax.devices())


@pytest.mark.slow
def test_sharded_train_step_matches_single(tiny):
    params, aux, cams = tiny
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    bg = jnp.zeros(3)
    args = (bg, jnp.int32(1), jnp.float32(1.0), jnp.float32(0.0))
    kw = dict(rcfg=RCFG, opt=opt, active_sh_degree=3, use_exp=False,
              sparse_adam=False, update_stats=True)

    ref_p, ref_aux, ref_opt, ref_m = train_step(
        params, aux, opt_state, cams, *args, **kw)

    mesh = make_mesh(4, 2)
    s_params, s_aux, s_opt = shard_state(mesh, params, aux, opt_state)
    s_cams = jax.device_put(cams, camera_sharding(mesh, cams))
    step_fn = make_sharded_train_step(mesh, s_params, s_aux, s_opt, s_cams,
                                      **kw)
    got_p, got_aux, got_opt, got_m = step_fn(s_params, s_aux, s_opt, s_cams,
                                             *args)

    assert np.allclose(float(got_m["loss"]), float(ref_m["loss"]), atol=1e-6)
    for g in ("xyz", "scaling", "opacity", "rotation", "exposure"):
        np.testing.assert_allclose(np.asarray(getattr(got_p, g)),
                                   np.asarray(getattr(ref_p, g)),
                                   atol=1e-5, err_msg=g)
    np.testing.assert_allclose(np.asarray(got_aux.xyz_gradient_accum),
                               np.asarray(ref_aux.xyz_gradient_accum),
                               atol=1e-5)


@pytest.mark.slow
def test_sharded_lm_step_matches_single(tiny):
    params, aux, cams = tiny
    bg = jnp.zeros(3)
    lm = cfg_mod.LMParams(cg_max_iter=1, cg_restart_iter=1,
                          line_search_steps=2, num_val_views=4)
    kw = dict(rcfg=RCFG, lm=lm, active_sh_degree=3, use_exp=False)

    ref_p, ref_info = lm_outer_step(params, aux.alive, cams, cams, bg, **kw)

    mesh = make_mesh(4, 2)
    s_params = shard_state(mesh, params)
    s_cams = jax.device_put(cams, camera_sharding(mesh, cams))
    lm_fn = make_sharded_lm_step(mesh, s_params, s_cams, s_cams, **kw)
    got_p, got_info = lm_fn(s_params, aux.alive, s_cams, s_cams, bg)

    assert np.allclose(float(got_info["best_val_loss"]),
                       float(ref_info["best_val_loss"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p.xyz), np.asarray(ref_p.xyz),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p.scaling),
                               np.asarray(ref_p.scaling), atol=1e-5)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (3, 128, 128)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_dp_shard_map_train_step_matches_single(tiny):
    """shard_map data-parallel step (Pallas-capable path) vs single-device."""
    params, aux, cams = tiny
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    bg = jnp.zeros(3)
    args = (bg, jnp.int32(1), jnp.float32(1.0), jnp.float32(0.0))
    kw = dict(rcfg=RCFG, opt=opt, active_sh_degree=3, use_exp=False,
              sparse_adam=False, update_stats=True)

    ref_p, ref_aux, ref_opt, ref_m = train_step(
        params, aux, opt_state, cams, *args, **kw)

    from gslm_tpu.parallel import make_dp_train_step
    mesh = make_mesh(4, 2)
    step_fn = make_dp_train_step(mesh, **kw)
    got_p, got_aux, got_opt, got_m = step_fn(params, aux, opt_state, cams,
                                             *args)
    assert np.allclose(float(got_m["loss"]), float(ref_m["loss"]), atol=1e-6)
    for g in ("xyz", "scaling", "opacity", "exposure"):
        np.testing.assert_allclose(np.asarray(getattr(got_p, g)),
                                   np.asarray(getattr(ref_p, g)),
                                   atol=1e-5, err_msg=g)
    np.testing.assert_allclose(np.asarray(got_aux.xyz_gradient_accum),
                               np.asarray(ref_aux.xyz_gradient_accum),
                               atol=1e-5)


@pytest.mark.slow
def test_mp_shard_map_train_step_matches_single(tiny):
    """Model-parallel step (Gaussians sharded, tile-row bands) vs single.

    Parameters are NOT replicated: in_specs place P("model") on every
    per-Gaussian leaf, each device renders only its band, and grads return
    to owner shards through the all_gather transpose."""
    params, aux, cams = tiny
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    bg = jnp.zeros(3)
    args = (bg, jnp.int32(1), jnp.float32(1.0), jnp.float32(0.1))
    kw = dict(rcfg=RCFG, opt=opt, active_sh_degree=3, use_exp=False,
              sparse_adam=False, update_stats=True)

    ref_p, ref_aux, ref_opt, ref_m = train_step(
        params, aux, opt_state, cams, *args, **kw)

    from gslm_tpu.parallel import make_mp_train_step
    mesh = make_mesh(2, 2)
    step_fn = make_mp_train_step(mesh, params, opt_state, **kw)
    got_p, got_aux, got_opt, got_m = step_fn(params, aux, opt_state, cams,
                                             *args)
    assert np.allclose(float(got_m["loss"]), float(ref_m["loss"]), atol=1e-6)
    assert np.allclose(float(got_m["depth_l1"]), float(ref_m["depth_l1"]),
                       atol=1e-6)
    for g in ("xyz", "scaling", "opacity", "rotation", "exposure"):
        np.testing.assert_allclose(np.asarray(getattr(got_p, g)),
                                   np.asarray(getattr(ref_p, g)),
                                   atol=1e-5, err_msg=g)
    np.testing.assert_allclose(np.asarray(got_aux.xyz_gradient_accum),
                               np.asarray(ref_aux.xyz_gradient_accum),
                               atol=1e-5)


def test_mp_render_views_matches_batch_render(tiny):
    """Band renders concatenate to exactly the single-device frames."""
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.parallel.model_raster import mp_render_views
    from gslm_tpu.parallel.steps import _mp_specs
    from gslm_tpu.renderer import batch_render

    params, aux, cams = tiny
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    ref = batch_render(params, cams, bg, config=RCFG, alive=aux.alive)

    mesh = make_mesh(2, 2)
    p_spec, a_spec, _ = _mp_specs(mesh, params, init_adam(params))

    def body(p_l, alive_l, cam):
        img, invd, radii, diags = mp_render_views(
            p_l, cam, bg, config=RCFG, n_model=2, alive_local=alive_l)
        return img, invd

    from jax.experimental.shard_map import shard_map
    fn = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(p_spec, P("model"), P("data")),
        out_specs=(P("data", None, "model"), P("data", None, "model")),
        check_rep=False))
    img, invd = fn(params, aux.alive, cams)
    H = cams.height
    np.testing.assert_allclose(np.asarray(img[:, :, :H]),
                               np.asarray(ref.render), atol=1e-6)
    np.testing.assert_allclose(np.asarray(invd[:, :, :H]),
                               np.asarray(ref.invdepth), atol=1e-6)


@pytest.mark.slow
def test_dp_shard_map_lm_step_matches_single(tiny):
    params, aux, cams = tiny
    bg = jnp.zeros(3)
    lm = cfg_mod.LMParams(cg_max_iter=1, cg_restart_iter=1,
                          line_search_steps=2, num_val_views=4)
    kw = dict(rcfg=RCFG, lm=lm, active_sh_degree=3, use_exp=False)

    ref_p, ref_info = lm_outer_step(params, aux.alive, cams, cams, bg, **kw)

    from gslm_tpu.parallel import make_dp_lm_step
    mesh = make_mesh(4, 2)
    lm_fn = make_dp_lm_step(mesh, **kw)
    ones4 = jnp.ones(4, jnp.float32)
    got_p, got_info = lm_fn(params, aux.alive, cams, cams, bg, ones4, ones4)
    assert np.allclose(float(got_info["best_val_loss"]),
                       float(ref_info["best_val_loss"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p.xyz), np.asarray(ref_p.xyz),
                               atol=1e-5)


def test_mp_lm_step_matches_single(tiny):
    """Model-parallel LM outer step (Gaussians sharded, banded residuals,
    distributed CGLS) vs the single-device step."""
    params, aux, cams = tiny
    bg = jnp.zeros(3)
    lm = cfg_mod.LMParams(cg_max_iter=1, cg_restart_iter=1,
                          line_search_steps=2, num_val_views=4)
    kw = dict(rcfg=RCFG, lm=lm, active_sh_degree=3, use_exp=False)

    ref_p, ref_info = lm_outer_step(params, aux.alive, cams, cams, bg, **kw)

    from gslm_tpu.parallel import make_mp_lm_step
    mesh = make_mesh(2, 2)
    lm_fn = make_mp_lm_step(mesh, params, **kw)
    ones4 = jnp.ones(4, jnp.float32)
    got_p, got_info = lm_fn(params, aux.alive, cams, cams, bg, ones4, ones4)
    assert np.allclose(float(got_info["best_val_loss"]),
                       float(ref_info["best_val_loss"]), rtol=1e-4), (
        float(got_info["best_val_loss"]), float(ref_info["best_val_loss"]))
    np.testing.assert_allclose(np.asarray(got_p.xyz), np.asarray(ref_p.xyz),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p.scaling),
                               np.asarray(ref_p.scaling), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p.exposure),
                               np.asarray(ref_p.exposure), atol=1e-5)


def test_mp_densify_on_model_sharded_state(tiny):
    """densify_and_prune is per-row/shape-stable, so it runs unchanged on
    a model shard inside shard_map: clone/split/prune decisions are
    identical to single-device (slot ALLOCATION is shard-local, which only
    permutes rows — rendering is slot-permutation invariant)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.densify import densify_and_prune
    from gslm_tpu.parallel.steps import _mp_specs

    params, aux, cams = tiny
    opt_state = init_adam(params)
    # deterministic densification stats: every 5th gaussian is hot
    C = params.capacity
    accum = np.zeros(C, np.float32)
    accum[::5] = 1.0
    denom = np.ones(C, np.float32)
    aux = aux.replace(xyz_gradient_accum=jnp.asarray(accum),
                      denom=jnp.asarray(denom))
    argsv = (jnp.float32(0.5), jnp.float32(0.005), jnp.float32(1.0),
             jnp.float32(0.0), jnp.float32(0.01))

    _, ref_aux2, _, ref_info = densify_and_prune(
        params, aux, opt_state, jax.random.PRNGKey(0), *argsv)

    mesh = make_mesh(2, 2)
    p_spec, a_spec, o_spec = _mp_specs(mesh, params, opt_state)

    def body(p_l, a_l, o_l, key):
        p2, a2, o2, info = densify_and_prune.__wrapped__(
            p_l, a_l, o_l, key, *argsv)
        totals = {k: jax.lax.psum(v, "model") for k, v in info.items()}
        return p2, a2, o2, totals

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(p_spec, a_spec, o_spec, P()),
        out_specs=(p_spec, a_spec, o_spec, P()), check_rep=False))
    p2, a2, o2, info = fn(params, aux, opt_state, jax.random.PRNGKey(0))

    for k in ("n_cloned", "n_split", "n_pruned", "n_alive", "n_dropped"):
        assert int(info[k]) == int(ref_info[k]), (
            k, int(info[k]), int(ref_info[k]))
    # sharded-densified state renders fine
    from gslm_tpu.renderer import batch_render
    out = batch_render(p2, cams, jnp.zeros(3), config=RCFG, alive=a2.alive)
    assert bool(jnp.all(jnp.isfinite(out.render)))


def test_mp_rebalance_moves_rows_and_preserves_render(tiny):
    """Cross-shard densification rebalance: overfull -> underfull shards,
    optimizer moments travel with rows, rendering unchanged."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.parallel.model_raster import mp_rebalance
    from gslm_tpu.parallel.steps import _mp_specs
    from gslm_tpu.renderer import batch_render

    params, aux, cams = tiny          # 48 alive in slots 0..47 of 256
    opt_state = init_adam(params)
    # capacity 256 over 4 model shards of 64: shard 0 holds all 48 alive
    mesh = make_mesh(2, 4)
    p_spec, a_spec, o_spec = _mp_specs(mesh, params, opt_state)
    bg = jnp.zeros(3)

    before = batch_render(params, cams, bg, config=RCFG,
                          alive=aux.alive).render

    def body(p_l, a_l, o_l):
        p2, a2, o2, moved = mp_rebalance(p_l, a_l, o_l, n_model=4,
                                         donate_cap=64)
        return p2, a2, o2, moved[None]

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(p_spec, a_spec, o_spec),
        out_specs=(p_spec, a_spec, o_spec, P("model")), check_rep=False))
    p2, a2, o2, moved = fn(params, aux, opt_state)

    per_shard = np.asarray(a2.alive).reshape(4, 64).sum(axis=1)
    assert per_shard.sum() == 48
    assert per_shard.max() <= 12 + 1, per_shard      # ceil(48/4) = 12
    assert int(np.asarray(moved).sum()) >= 36, per_shard

    after = batch_render(p2, cams, bg, config=RCFG, alive=a2.alive).render
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               atol=1e-6)
    # moments followed their rows: total moment mass unchanged
    np.testing.assert_allclose(
        float(jnp.sum(jnp.abs(o2.mu.xyz))),
        float(jnp.sum(jnp.abs(opt_state.mu.xyz))), rtol=1e-6)


@pytest.mark.slow
def test_dp_lm_step_with_padded_window_matches_single(tiny):
    """Regression (self-review r2): mesh LM paths must honor the
    zero-weight padding views lm_phase adds for micro-batch/data-axis
    divisibility — a padded duplicate view must not bias the step."""
    params, aux, cams = tiny          # 4 views
    bg = jnp.zeros(3)
    lm = cfg_mod.LMParams(cg_max_iter=1, cg_restart_iter=1,
                          line_search_steps=2, num_val_views=3,
                          micro_batch=0)
    kw = dict(rcfg=RCFG, lm=lm, active_sh_degree=3, use_exp=False)

    win = [0, 1, 2]
    window = jax.tree.map(lambda x: x[jnp.asarray(win)], cams)
    val = jax.tree.map(lambda x: x[jnp.asarray(win)], cams)
    ref_p, ref_info = lm_outer_step(params, aux.alive, window, val, bg,
                                    **kw)

    # pad to 4 (data axis 2) with a zero-weight duplicate of view 0
    win_p = [0, 1, 2, 0]
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    window_p = jax.tree.map(lambda x: x[jnp.asarray(win_p)], cams)
    val_p = jax.tree.map(lambda x: x[jnp.asarray(win_p)], cams)

    from gslm_tpu.parallel import make_dp_lm_step, make_mp_lm_step
    mesh = make_mesh(2, 2)
    for factory in (lambda: make_dp_lm_step(mesh, **kw),
                    lambda: make_mp_lm_step(mesh, params, **kw)):
        got_p, got_info = factory()(params, aux.alive, window_p, val_p, bg,
                                    w, w)
        assert np.allclose(float(got_info["best_val_loss"]),
                           float(ref_info["best_val_loss"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_p.xyz),
                                   np.asarray(ref_p.xyz), atol=1e-5)


# --- record-level all_to_all routing (SURVEY §2.3 splat-list all-to-all) ---

RCFG_ROUTE = RCFG.replace(mp_route_capacity=256)


def test_mp_route_train_step_matches_single(tiny):
    """Routed-exchange model-parallel Adam step vs single device: only
    band-surviving records cross shards (one all_to_all), params never
    replicated, grads owner-resident via the compaction-gather transpose."""
    params, aux, cams = tiny
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    bg = jnp.zeros(3)
    args = (bg, jnp.int32(1), jnp.float32(1.0), jnp.float32(0.1))
    kw = dict(rcfg=RCFG, opt=opt, active_sh_degree=3, use_exp=False,
              sparse_adam=False, update_stats=True)

    ref_p, ref_aux, ref_opt, ref_m = train_step(
        params, aux, opt_state, cams, *args, **kw)

    from gslm_tpu.parallel import make_mp_train_step
    mesh = make_mesh(2, 2)
    kw["rcfg"] = RCFG_ROUTE
    step_fn = make_mp_train_step(mesh, params, opt_state, **kw)
    got_p, got_aux, got_opt, got_m = step_fn(params, aux, opt_state, cams,
                                             *args)
    assert np.allclose(float(got_m["loss"]), float(ref_m["loss"]), atol=1e-6)
    assert int(got_m["overflow"]) == 0
    for g in ("xyz", "scaling", "opacity", "rotation", "exposure"):
        np.testing.assert_allclose(np.asarray(getattr(got_p, g)),
                                   np.asarray(getattr(ref_p, g)),
                                   atol=1e-5, err_msg=g)
    np.testing.assert_allclose(np.asarray(got_aux.xyz_gradient_accum),
                               np.asarray(ref_aux.xyz_gradient_accum),
                               atol=1e-5)


@pytest.mark.slow
def test_mp_route_lm_step_matches_single(tiny):
    params, aux, cams = tiny
    bg = jnp.zeros(3)
    lm = cfg_mod.LMParams(cg_max_iter=1, cg_restart_iter=1,
                          line_search_steps=2, num_val_views=4)
    ref_p, ref_info = lm_outer_step(params, aux.alive, cams, cams, bg,
                                    rcfg=RCFG, lm=lm, active_sh_degree=3,
                                    use_exp=False)

    from gslm_tpu.parallel import make_mp_lm_step
    mesh = make_mesh(2, 2)
    lm_fn = make_mp_lm_step(mesh, params, rcfg=RCFG_ROUTE, lm=lm,
                            active_sh_degree=3, use_exp=False)
    ones4 = jnp.ones(4, jnp.float32)
    got_p, got_info = lm_fn(params, aux.alive, cams, cams, bg, ones4, ones4)
    assert np.allclose(float(got_info["best_val_loss"]),
                       float(ref_info["best_val_loss"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p.xyz), np.asarray(ref_p.xyz),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p.scaling),
                               np.asarray(ref_p.scaling), atol=1e-5)


def test_mp_route_overflow_flag_and_bytes(tiny):
    """An undersized route capacity must raise the overflow diagnostic
    (never silently drop records), and the routed exchange must move
    fewer bytes per device than the all_gather it replaces."""
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.parallel.model_raster import (exchange_bytes,
                                                mp_render_views)
    from gslm_tpu.parallel.steps import _mp_specs
    from gslm_tpu.renderer import batch_render

    params, aux, cams = tiny
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    ref = batch_render(params, cams, bg, config=RCFG, alive=aux.alive)
    mesh = make_mesh(2, 2)
    p_spec, a_spec, _ = _mp_specs(mesh, params, init_adam(params))

    from jax.experimental.shard_map import shard_map

    def run(cfg):
        def body(p_l, alive_l, cam):
            img, invd, radii, diags = mp_render_views(
                p_l, cam, bg, config=cfg, n_model=2, alive_local=alive_l)
            return img, invd, jax.lax.pmax(diags["overflow"],
                                           ("data", "model"))
        fn = jax.jit(shard_map(
            body, mesh=mesh, in_specs=(p_spec, P("model"), P("data")),
            out_specs=(P("data", None, "model"), P("data", None, "model"),
                       P()),
            check_rep=False))
        return fn(params, aux.alive, cams)

    img, invd, over = run(RCFG_ROUTE)
    assert int(over) == 0
    H = cams.height
    np.testing.assert_allclose(np.asarray(img[:, :, :H]),
                               np.asarray(ref.render), atol=1e-6)
    np.testing.assert_allclose(np.asarray(invd[:, :, :H]),
                               np.asarray(ref.invdepth), atol=1e-6)

    _, _, over_small = run(RCFG.replace(mp_route_capacity=8))
    assert int(over_small) == 1

    Bd, Pl = 2, params.xyz.shape[0] // 2
    assert exchange_bytes(Bd, Pl, 2, 256) < exchange_bytes(Bd, Pl, 2, 0)


def test_mp_route_pallas_matches_tiled(tiny):
    """The REAL on-chip MP configuration is the Pallas kernel inside
    shard_map with the routed exchange; nothing else covers that
    composition (interpret mode here, Mosaic lowering checked by bench's
    on-hardware parity gate). Forward + grads vs the single-device tiled
    render."""
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.parallel.model_raster import mp_render_views
    from gslm_tpu.parallel.steps import _mp_specs
    from gslm_tpu.renderer import batch_render

    params, aux, cams = tiny
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    ref = batch_render(params, cams, bg, config=RCFG, alive=aux.alive)
    mesh = make_mesh(2, 2)
    p_spec, a_spec, _ = _mp_specs(mesh, params, init_adam(params))
    cfg = RCFG_ROUTE.replace(impl="pallas")

    from jax.experimental.shard_map import shard_map

    def body(p_l, alive_l, cam):
        img, invd, radii, diags = mp_render_views(
            p_l, cam, bg, config=cfg, n_model=2, alive_local=alive_l)
        return img, invd

    fn = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(p_spec, P("model"), P("data")),
        out_specs=(P("data", None, "model"), P("data", None, "model")),
        check_rep=False))
    img, invd = fn(params, aux.alive, cams)
    H = cams.height
    np.testing.assert_allclose(np.asarray(img[:, :, :H]),
                               np.asarray(ref.render), atol=1e-5)
    np.testing.assert_allclose(np.asarray(invd[:, :, :H]),
                               np.asarray(ref.invdepth), atol=1e-5)


@pytest.mark.slow
def test_mp_route_pallas_grads_match(tiny):
    """Custom-VJP Pallas backward + all_to_all transpose + compaction-gather
    scatter inside shard_map: one routed MP Adam step on the pallas impl
    must match the single-device tiled step (owner-resident gradients
    through three nested transposes)."""
    params, aux, cams = tiny
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    bg = jnp.zeros(3)
    args = (bg, jnp.int32(1), jnp.float32(1.0), jnp.float32(0.1))
    kw = dict(opt=opt, active_sh_degree=3, use_exp=False,
              sparse_adam=False, update_stats=True)

    ref_p, _, _, ref_m = train_step(params, aux, opt_state, cams, *args,
                                    rcfg=RCFG, **kw)

    from gslm_tpu.parallel import make_mp_train_step
    mesh = make_mesh(2, 2)
    step_fn = make_mp_train_step(mesh, params, opt_state,
                                 rcfg=RCFG_ROUTE.replace(impl="pallas"),
                                 **kw)
    got_p, _, _, got_m = step_fn(params, aux, opt_state, cams, *args)
    assert np.allclose(float(got_m["loss"]), float(ref_m["loss"]), atol=1e-6)
    for g in ("xyz", "scaling", "opacity", "exposure"):
        np.testing.assert_allclose(np.asarray(getattr(got_p, g)),
                                   np.asarray(getattr(ref_p, g)),
                                   atol=1e-5, err_msg=g)
