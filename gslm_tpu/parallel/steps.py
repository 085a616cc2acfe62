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
