"""Sharded training-step factories: the single-chip steps under pjit.

Both factories wrap the exact single-chip step functions (train.train_step,
train_lm.lm_outer_step) in jax.jit with explicit in/out shardings over a
(data, model) mesh. GSPMD lowers the sharding annotations to XLA
collectives over ICI:

- per-view losses / gradients / matvec partials psum over ``data``;
- the model-sharded preprocess feeds the tile sort via all-gather of the
  projected splats over ``model`` (the cheap activations, not the fat
  parameter rows), and the backward reduce-scatters parameter cotangents
  back to their owner shards.

This mirrors the scaling-book recipe — pick a mesh, annotate shardings,
let XLA insert collectives — rather than translating any NCCL pattern (the
reference has none to translate; it is single-GPU).
"""

from __future__ import annotations

import jax

from gslm_tpu.parallel.mesh import (adam_sharding, aux_sharding,
                                    camera_sharding, params_sharding,
                                    replicated)


def make_sharded_train_step(mesh, params, aux, opt_state, camera_batch, *,
                            rcfg, opt, active_sh_degree, use_exp,
                            sparse_adam, update_stats):
    """Jitted Adam train step over the mesh.

    Returns step_fn(params, aux, opt_state, cam, bg, step, spatial_lr_scale,
    depth_weight) -> (params, aux, opt_state, metrics), with params/aux/opt
    model-sharded and the camera batch data-sharded. The concrete state
    arguments are used only to build matching sharding pytrees.
    """
    from gslm_tpu.train import train_step
    raw = train_step.__wrapped__

    p_sh = params_sharding(mesh, params)
    a_sh = aux_sharding(mesh)
    o_sh = adam_sharding(mesh, opt_state)
    c_sh = camera_sharding(mesh, camera_batch)
    r = replicated(mesh)

    def step_fn(params, aux, opt_state, cam, bg, step, spatial_lr_scale,
                depth_weight):
        return raw(params, aux, opt_state, cam, bg, step, spatial_lr_scale,
                   depth_weight, rcfg=rcfg, opt=opt,
                   active_sh_degree=active_sh_degree, use_exp=use_exp,
                   sparse_adam=sparse_adam, update_stats=update_stats)

    return jax.jit(step_fn,
                   in_shardings=(p_sh, a_sh, o_sh, c_sh, r, r, r, r),
                   out_shardings=(p_sh, a_sh, o_sh, r))


def _shard_map(fn, mesh, in_specs, out_specs):
    from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


def make_dp_train_step(mesh, *, rcfg, opt, active_sh_degree, use_exp,
                       sparse_adam, update_stats):
    """Data-parallel Adam step via shard_map: views sharded over "data",
    parameters/optimizer replicated, gradients pmean'd over ICI.

    Unlike the GSPMD path (make_sharded_train_step), this works with the
    Pallas compositor (rcfg.impl="pallas"): each device runs the kernel on
    its local view shard — GSPMD cannot partition a pallas_call, but
    shard_map places one per device by construction. Use when the model
    fits one chip's HBM and scaling is over cameras (the common case; the
    reference is single-GPU so any multi-chip mode is new capability).
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.densify import add_densification_stats
    from gslm_tpu.optim import adam_step, group_learning_rates
    from gslm_tpu.solver.residuals import scalar_training_loss
    from gslm_tpu.utils.image import psnr

    def step_fn(params, aux, opt_state, cam, bg, step, spatial_lr_scale,
                depth_weight):
        def loss_fn(p, m2d):
            loss, info = scalar_training_loss(
                p, cam, bg, config=rcfg, lambda_dssim=opt.lambda_dssim,
                use_trained_exp=use_exp, active_sh_degree=active_sh_degree,
                alive=aux.alive, mean2d_offset=m2d)
            out = info["render"]
            npix = jnp.maximum(jnp.sum(cam.depth_mask), 1.0)
            depth_l1 = jnp.sum(jnp.abs(out.invdepth - cam.invdepth_gt)
                               * cam.depth_mask) / npix
            return loss + depth_weight * depth_l1, (info, depth_l1)

        m2d0 = jnp.zeros((params.capacity, 2), jnp.float32)
        (loss, (info, depth_l1)), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d0)

        # ICI collectives: mean loss/grads over view shards; stats sum the
        # per-view screen gradients (matching train_step's B rescale)
        loss = jax.lax.pmean(loss, "data")
        g_params = jax.lax.pmean(g_params, "data")
        g_m2d = jax.lax.psum(g_m2d * cam.batch_size, "data")
        out = info["render"]
        radii = jax.lax.pmax(jnp.max(out.radii, axis=0), "data")
        if update_stats:
            aux_new = add_densification_stats(aux, g_m2d, radii)
        else:
            aux_new = aux

        lrs = group_learning_rates(opt, step, spatial_lr_scale)
        visible = (radii > 0) if sparse_adam else None
        params, opt_state = adam_step(params, g_params, opt_state, lrs,
                                      visible)
        metrics = {"loss": loss,
                   "l1": jax.lax.pmean(jnp.mean(info["l1"]), "data"),
                   "depth_l1": jax.lax.pmean(depth_l1, "data"),
                   "psnr": jax.lax.pmean(
                       jnp.mean(psnr(out.render, cam.gt_image)), "data"),
                   "overflow": jax.lax.pmax(jnp.max(out.overflow), "data"),
                   "max_tile_load": jax.lax.pmax(
                       jnp.max(out.max_tile_load), "data")}
        return params, aux_new, opt_state, metrics

    rep = P()
    mapped = _shard_map(
        step_fn, mesh,
        in_specs=(rep, rep, rep, P("data"), rep, rep, rep, rep),
        out_specs=(rep, rep, rep, rep))
    return jax.jit(mapped)


def _mp_specs(mesh, params, opt_state):
    """shard_map spec pytrees for model-sharded state: every per-Gaussian
    leaf P("model"), exposure/step replicated."""
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.models.gaussians import PARAM_GROUPS, GaussianAux
    from gslm_tpu.optim import AdamState

    g, rep = P("model"), P()
    p_spec = params.replace(**({grp: g for grp in PARAM_GROUPS
                                if grp != "exposure"} | {"exposure": rep}))
    a_spec = GaussianAux(alive=g, max_radii2d=g, xyz_gradient_accum=g,
                         denom=g)
    o_spec = AdamState(
        mu=opt_state.mu.replace(
            **({grp: g for grp in PARAM_GROUPS if grp != "exposure"}
               | {"exposure": rep})),
        nu=opt_state.nu.replace(
            **({grp: g for grp in PARAM_GROUPS if grp != "exposure"}
               | {"exposure": rep})),
        step=rep)
    return p_spec, a_spec, o_spec


def make_mp_train_step(mesh, params, opt_state, *, rcfg, opt,
                       active_sh_degree, use_exp, sparse_adam, update_stats):
    """Model-parallel Adam step via shard_map over ("data", "model"):
    Gaussians sharded over "model" (parameters are NEVER replicated),
    views over "data", and every device composites only its tile-row band
    (parallel/model_raster.py). Parameter/optimizer/densification state
    all live sharded; gradients flow back to their owner shards through
    the all_gather transpose (a psum_scatter XLA inserts), with only the
    tiny replicated leaves (exposure) psum'd over "model" by hand.
    Pallas-kernel compatible (one kernel launch per device).

    ``params``/``opt_state`` are concrete examples used to build matching
    spec pytrees (their static fields are part of the treedef).
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.densify import add_densification_stats
    from gslm_tpu.optim import adam_step, group_learning_rates
    from gslm_tpu.parallel.model_raster import (band_slice,
                                                mp_scalar_training_loss)

    n_model = mesh.shape["model"]
    p_spec, a_spec, o_spec = _mp_specs(mesh, params, opt_state)

    def step_fn(params_l, aux_l, opt_l, cam, bg, step, spatial_lr_scale,
                depth_weight):
        H = cam.height
        cap_l = params_l.xyz.shape[0]

        def loss_fn(p, m2d):
            # local-partial objective: see model_raster.py GRADIENT
            # CONTRACT — no psum inside the differentiated region
            loss_l, info = mp_scalar_training_loss(
                p, cam, bg, config=rcfg, n_model=n_model,
                lambda_dssim=opt.lambda_dssim, use_trained_exp=use_exp,
                active_sh_degree=active_sh_degree, alive_local=aux_l.alive,
                mean2d_offset_local=m2d)
            dmask = band_slice(cam.depth_mask, H, n_model, "model")
            dgt = band_slice(cam.invdepth_gt, H, n_model, "model")
            npix = jnp.maximum(jax.lax.psum(
                jax.lax.stop_gradient(jnp.sum(dmask)), "model"), 1.0)
            depth_local = jnp.sum(
                jnp.abs(info["band_invdepth"] - dgt) * dmask) / npix
            return loss_l + depth_weight * depth_local, (info, depth_local)

        m2d0 = jnp.zeros((cap_l, 2), jnp.float32)
        (_, (info, depth_local)), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params_l, m2d0)

        # collectives: view-mean over "data"; per-Gaussian grads are
        # already owner-resident (all_gather transpose) — only the
        # replicated exposure leaf needs the "model" reduction
        depth_l1 = jax.lax.psum(depth_local, "model")
        loss = jax.lax.pmean(info["loss"] + depth_weight * depth_l1, "data")
        g_params = g_params.replace(
            exposure=jax.lax.psum(g_params.exposure, "model"))
        g_params = jax.lax.pmean(g_params, "data")
        g_m2d = jax.lax.psum(g_m2d * cam.batch_size, "data")
        radii = jax.lax.pmax(jnp.max(info["radii_local"], axis=0), "data")
        if update_stats:
            aux_l = add_densification_stats(aux_l, g_m2d, radii)

        lrs = group_learning_rates(opt, step, spatial_lr_scale)
        visible = (radii > 0) if sparse_adam else None
        params_l, opt_l = adam_step(params_l, g_params, opt_l, lrs, visible)
        # PSNR exactly as the single-device metric: raw (un-alpha-masked)
        # render vs gt per view over the true H*W canvas — band pad rows
        # are zero on both sides and npix excludes them
        gt_b = band_slice(cam.gt_image, H, n_model, "model")
        mse_v = jax.lax.psum(
            jnp.sum((info["band_render_raw"] - gt_b) ** 2, axis=(1, 2, 3)),
            "model") / (3.0 * H * cam.width)
        psnr_v = -10.0 * jnp.log10(jnp.maximum(mse_v, 1e-12))
        metrics = {
            "loss": loss,
            "l1": jax.lax.pmean(jnp.mean(info["l1"]), "data"),
            "depth_l1": jax.lax.pmean(depth_l1, "data"),
            "psnr": jax.lax.pmean(jnp.mean(psnr_v), "data"),
            "overflow": jax.lax.pmax(
                jnp.max(info["diags"]["overflow"]), ("data", "model")),
            "max_tile_load": jax.lax.pmax(
                jnp.max(info["diags"]["max_tile_load"]), ("data", "model")),
        }
        return params_l, aux_l, opt_l, metrics

    rep = P()
    mapped = _shard_map(
        step_fn, mesh,
        in_specs=(p_spec, a_spec, o_spec, P("data"), rep, rep, rep, rep),
        out_specs=(p_spec, a_spec, o_spec, rep))
    return jax.jit(mapped)


def make_mp_lm_step(mesh, params, *, rcfg, lm, active_sh_degree, use_exp,
                    lambda_dssim=0.2):
    """Model-parallel LM outer step via shard_map over ("data", "model"):
    Gaussians sharded (never replicated), the LM window and validation
    views sharded over "data", every device compositing only its tile-row
    band. CGLS runs fully distributed (model_raster.mp_lm_outer_step).
    ``params`` is a concrete example for the spec pytree."""
    import jax.numpy as jnp  # noqa: F401  (kept for symmetry)
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.optim import init_adam
    from gslm_tpu.parallel.model_raster import mp_lm_outer_step

    n_model = mesh.shape["model"]
    p_spec, a_spec, _ = _mp_specs(mesh, params, init_adam(params))
    alive_spec = a_spec.alive

    def step_fn(params_l, alive_l, window, val, bg, win_valid, val_valid):
        return mp_lm_outer_step(
            params_l, alive_l, window, val, bg, win_valid, val_valid,
            rcfg=rcfg, lm=lm,
            active_sh_degree=active_sh_degree, use_exp=use_exp,
            n_model=n_model, lambda_dssim=lambda_dssim)

    rep = P()
    mapped = _shard_map(step_fn, mesh,
                        in_specs=(p_spec, alive_spec, P("data"), P("data"),
                                  rep, P("data"), P("data")),
                        out_specs=(p_spec, rep))
    return jax.jit(mapped)


def make_mp_densify(mesh, params, opt_state, *, donate_cap=256,
                    rebalance=True):
    """Densification + optional cross-shard rebalance on model-sharded
    state: densify_and_prune runs unchanged per shard (it is per-row and
    shape-stable), then mp_rebalance moves alive rows from full shards to
    free ones so no shard starts dropping requests while others have room
    (reference seam: the one-GPU resident P axis, gaussian_model.py:
    439-559). Returns step(params, aux, opt, key, *thresholds) ->
    (params, aux, opt, info) with info counts psum'd over the mesh."""
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.densify import densify_and_prune
    from gslm_tpu.parallel.model_raster import mp_rebalance

    n_model = mesh.shape["model"]
    p_spec, a_spec, o_spec = _mp_specs(mesh, params, opt_state)

    def body(p_l, a_l, o_l, key, max_grad, min_op, extent, max_screen,
             pct_dense):
        key = jax.random.fold_in(key, jax.lax.axis_index("model"))
        p_l, a_l, o_l, info = densify_and_prune.__wrapped__(
            p_l, a_l, o_l, key, max_grad, min_op, extent, max_screen,
            pct_dense)
        moved = jnp.int32(0)
        if rebalance and n_model > 1:
            p_l, a_l, o_l, moved = mp_rebalance(
                p_l, a_l, o_l, n_model=n_model, donate_cap=donate_cap)
        info = {k: jax.lax.psum(v, "model") for k, v in info.items()}
        info["n_rebalanced"] = jax.lax.psum(moved, "model")
        return p_l, a_l, o_l, info

    rep = P()
    mapped = _shard_map(
        body, mesh,
        in_specs=(p_spec, a_spec, o_spec, rep, rep, rep, rep, rep, rep),
        out_specs=(p_spec, a_spec, o_spec, rep))
    return jax.jit(mapped)


def make_dp_lm_step(mesh, *, rcfg, lm, active_sh_degree, use_exp,
                    lambda_dssim=0.2):
    """Data-parallel LM outer step via shard_map: the LM view window and
    validation views shard over "data"; CGLS residual dots, Jᵀ·u partials,
    and line-search losses psum over ICI (LMOperators axis_name wiring).
    Pallas-kernel compatible, unlike the GSPMD variant."""
    from jax.sharding import PartitionSpec as P

    from gslm_tpu.train_lm import lm_outer_step
    raw = lm_outer_step.__wrapped__

    def step_fn(params, alive, window, val, bg, win_valid, val_valid):
        return raw(params, alive, window, val, bg, win_valid, val_valid,
                   rcfg=rcfg, lm=lm,
                   active_sh_degree=active_sh_degree, use_exp=use_exp,
                   lambda_dssim=lambda_dssim, axis_name="data")

    rep = P()
    mapped = _shard_map(step_fn, mesh,
                        in_specs=(rep, rep, P("data"), P("data"), rep,
                                  P("data"), P("data")),
                        out_specs=(rep, rep))
    return jax.jit(mapped)


def make_sharded_lm_step(mesh, params, window_batch, val_batch, *, rcfg, lm,
                         active_sh_degree, use_exp, lambda_dssim=0.2):
    """Jitted LM outer step (train_lm.lm_outer_step) over the mesh.

    The LM view window and the validation views are data-sharded; the CGLS
    recurrence's generalized dots become psums over both axes, and every
    J·v / Jᵀ·v matvec runs views-in-parallel across the data axis.
    Returns step_fn(params, alive, window, val, bg) -> (params, info).
    """
    from gslm_tpu.train_lm import lm_outer_step
    raw = lm_outer_step.__wrapped__

    p_sh = params_sharding(mesh, params)
    alive_sh = aux_sharding(mesh).alive
    w_sh = camera_sharding(mesh, window_batch)
    v_sh = camera_sharding(mesh, val_batch)
    r = replicated(mesh)

    def step_fn(params, alive, window, val, bg):
        return raw(params, alive, window, val, bg, rcfg=rcfg, lm=lm,
                   active_sh_degree=active_sh_degree, use_exp=use_exp,
                   lambda_dssim=lambda_dssim)

    return jax.jit(step_fn,
                   in_shardings=(p_sh, alive_sh, w_sh, v_sh, r),
                   out_shardings=(p_sh, r))
