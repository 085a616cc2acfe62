"""Per-group Adam for Gaussian parameters.

Functional replacement for the reference's optimizer setup
(gaussian_model.py:268-301): one Adam over the GaussianParams pytree with
per-group learning rates (xyz/exposure scheduled per step), torch-Adam
update rule with eps *inside* the sqrt denominator sum (eps=1e-15 for
Gaussian groups, torch-default 1e-8 for the separate exposure optimizer),
and a visibility mask implementing SparseGaussianAdam semantics (only
Gaussians with radii>0 this step get moments+update; reference
train.py:180-183).

Because state rows live at fixed capacity, densification "optimizer
surgery" (reference gaussian_model.py:406-497) reduces to zeroing moment
rows — see densify.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslm_tpu.models.gaussians import PARAM_GROUPS, GaussianParams, zeros_like_params
from gslm_tpu.struct import pytree_dataclass
from gslm_tpu.utils.general import expon_lr

BETA1, BETA2 = 0.9, 0.999
EPS = {g: 1e-15 for g in PARAM_GROUPS} | {"exposure": 1e-8}


@pytree_dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray  # () int32


def init_adam(params: GaussianParams) -> AdamState:
    return AdamState(mu=zeros_like_params(params), nu=zeros_like_params(params),
                     step=jnp.int32(0))


def group_learning_rates(opt_cfg, step, spatial_lr_scale: float) -> dict:
    """Per-group LR dict at ``step`` (traced ok). Mirrors
    gaussian_model.py:274-301 + update_learning_rate:303-313."""
    return {
        "xyz": expon_lr(step,
                        opt_cfg.position_lr_init * spatial_lr_scale,
                        opt_cfg.position_lr_final * spatial_lr_scale,
                        lr_delay_mult=opt_cfg.position_lr_delay_mult,
                        max_steps=opt_cfg.position_lr_max_steps),
        "features_dc": opt_cfg.feature_lr,
        "features_rest": opt_cfg.feature_lr / 20.0,
        "opacity": opt_cfg.opacity_lr,
        "scaling": opt_cfg.scaling_lr,
        "rotation": opt_cfg.rotation_lr,
        "exposure": expon_lr(step, opt_cfg.exposure_lr_init,
                             opt_cfg.exposure_lr_final,
                             lr_delay_steps=opt_cfg.exposure_lr_delay_steps,
                             lr_delay_mult=opt_cfg.exposure_lr_delay_mult,
                             max_steps=opt_cfg.iterations),
    }


def adam_step(params: GaussianParams, grads: GaussianParams, state: AdamState,
              lrs: dict, visible: jnp.ndarray | None = None
              ) -> tuple[GaussianParams, AdamState]:
    """One Adam update. ``visible`` (C,) bool restricts per-Gaussian rows
    (sparse-adam mode); exposure is always dense."""
    t = state.step + 1
    bc1 = 1.0 - BETA1 ** t.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** t.astype(jnp.float32)

    new_p, new_mu, new_nu = {}, {}, {}
    for g in PARAM_GROUPS:
        p = getattr(params, g)
        gr = getattr(grads, g)
        mu = getattr(state.mu, g)
        nu = getattr(state.nu, g)
        mu_n = BETA1 * mu + (1 - BETA1) * gr
        nu_n = BETA2 * nu + (1 - BETA2) * gr * gr
        upd = lrs[g] * (mu_n / bc1) / (jnp.sqrt(nu_n / bc2) + EPS[g])
        p_n = p - upd
        if visible is not None and g != "exposure":
            m = visible.reshape((-1,) + (1,) * (p.ndim - 1))
            p_n = jnp.where(m, p_n, p)
            mu_n = jnp.where(m, mu_n, mu)
            nu_n = jnp.where(m, nu_n, nu)
        new_p[g] = p_n
        new_mu[g] = mu_n
        new_nu[g] = nu_n

    return (params.replace(**new_p),
            AdamState(mu=state.mu.replace(**new_mu),
                      nu=state.nu.replace(**new_nu), step=t))


def zero_state_rows(state: AdamState, rows: jnp.ndarray,
                    groups=tuple(g for g in PARAM_GROUPS if g != "exposure")
                    ) -> AdamState:
    """Zero moment rows (C,)-mask ``rows`` for the given groups — the
    fixed-capacity form of the reference's cat/prune/replace optimizer
    surgery (gaussian_model.py:406-497)."""
    def zero(x):
        m = rows.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    mu = state.mu.replace(**{g: zero(getattr(state.mu, g)) for g in groups})
    nu = state.nu.replace(**{g: zero(getattr(state.nu, g)) for g in groups})
    return AdamState(mu=mu, nu=nu, step=state.step)


def zero_state_group(state: AdamState, group: str) -> AdamState:
    """Zero a whole group's moments (reference replace_tensor_to_optimizer
    on opacity reset, gaussian_model.py:348-351,406-419)."""
    mu = state.mu.replace(**{group: jnp.zeros_like(getattr(state.mu, group))})
    nu = state.nu.replace(**{group: jnp.zeros_like(getattr(state.nu, group))})
    return AdamState(mu=mu, nu=nu, step=state.step)
