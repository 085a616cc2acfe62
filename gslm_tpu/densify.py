"""Density control (clone / split / prune) as shape-stable masked ops.

The reference mutates tensor shapes and performs optimizer-state surgery
(gaussian_model.py:406-563) — impossible under XLA's static shapes. Here the
model lives at fixed capacity with an ``alive`` mask and densification is
one jitted function:

- *clone* (gaussian_model.py:525-540): small Gaussians with accumulated 2D
  gradient ≥ threshold are copied verbatim into free slots.
- *split* (gaussian_model.py:499-523): large ones spawn N=2 children
  resampled from their own covariance with scales /(0.8·N); child 1
  overwrites the parent slot, child 2 takes a free slot (the reference
  appends both and prunes the parent — same net effect, but this keeps
  shapes fixed). Parent-slot optimizer moments are zeroed like the
  reference's fresh rows.
- *prune* (gaussian_model.py:542-559): opacity below threshold, screen
  radius above threshold, or world scale above 0.1·extent → slot freed.

Allocation: requesting rows are matched to free slots by two stable
argsorts; if requests exceed free slots the surplus is dropped and reported
(``n_dropped``) so the host can grow capacity between steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gslm_tpu.models.gaussians import (DEAD_LOG_SCALE, DEAD_OPACITY_LOGIT,
                                       GaussianAux, GaussianParams)
from gslm_tpu.optim import AdamState, zero_state_rows
from gslm_tpu.utils.general import inverse_sigmoid, quat_normalize, quat_to_rotmat

PER_GAUSSIAN = ("xyz", "features_dc", "features_rest", "scaling", "rotation",
                "opacity")


def add_densification_stats(aux: GaussianAux, mean2d_grad: jnp.ndarray,
                            radii: jnp.ndarray) -> GaussianAux:
    """Accumulate per-Gaussian screen-gradient norms for visible Gaussians
    (reference gaussian_model.py:561-563 + train loop max_radii2D update).

    mean2d_grad: (P, 2) cotangent of the mean2d offset; radii: (P,) int32
    (max over batch views when batched)."""
    vis = radii > 0
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1)
    return aux.replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=aux.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.maximum(aux.max_radii2d,
                                jnp.where(vis, radii.astype(jnp.float32), 0.0)))


def _scatter_rows(params: GaussianParams, src: jnp.ndarray, dst: jnp.ndarray,
                  new_rows: dict[str, jnp.ndarray]) -> GaussianParams:
    out = {}
    for g in PER_GAUSSIAN:
        x = getattr(params, g)
        rows = new_rows.get(g, x[src])
        out[g] = x.at[dst].set(rows, mode="drop")
    return params.replace(**out)


@functools.partial(jax.jit, static_argnames=())
def densify_and_prune(params: GaussianParams, aux: GaussianAux,
                      opt_state: AdamState, key: jax.Array,
                      max_grad: jnp.ndarray, min_opacity: jnp.ndarray,
                      extent: jnp.ndarray, max_screen_size: jnp.ndarray,
                      percent_dense: jnp.ndarray):
    """One densification event. Returns (params, aux, opt_state, info)."""
    C = params.capacity
    alive = aux.alive
    grads = jnp.where(aux.denom > 0, aux.xyz_gradient_accum /
                      jnp.maximum(aux.denom, 1.0), 0.0)
    scaling = jnp.exp(params.scaling)
    max_scale = jnp.max(scaling, axis=1)

    hot = alive & (grads >= max_grad)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)
    request = clone_mask | split_mask
    n_request = jnp.sum(request.astype(jnp.int32))
    n_free = jnp.sum((~alive).astype(jnp.int32))

    # match requesting rows to free slots (stable: lowest indices first)
    iota = jnp.arange(C)
    src = jnp.argsort(jnp.where(request, iota, C).astype(jnp.int32))
    dst = jnp.argsort(jnp.where(~alive, iota, C).astype(jnp.int32))
    valid = (iota < n_request) & (iota < n_free)
    src = jnp.where(valid, src, C)   # drop out-of-bounds
    dst = jnp.where(valid, dst, C)

    # children sampled from the parent covariance (split rows only)
    k1, k2 = jax.random.split(key)

    def sample_child(p: GaussianParams, idx, noise):
        std = jnp.exp(p.scaling)                       # (C, 3)
        rot = quat_to_rotmat(quat_normalize(p.rotation))
        offs = jnp.einsum("cij,cj->ci", rot, noise * std)
        return p.xyz + offs

    noise1 = jax.random.normal(k1, (C, 3))
    noise2 = jax.random.normal(k2, (C, 3))
    child_scale = params.scaling - jnp.log(0.8 * 2.0)  # scale/(0.8·N), N=2

    # --- new rows into free slots: clones verbatim, split-children resampled
    is_split_src = split_mask[jnp.minimum(src, C - 1)]
    new_xyz_split = sample_child(params, src, noise2)[jnp.minimum(src, C - 1)]
    new_rows = {
        "xyz": jnp.where(is_split_src[:, None], new_xyz_split,
                         params.xyz[jnp.minimum(src, C - 1)]),
        "scaling": jnp.where(is_split_src[:, None],
                             child_scale[jnp.minimum(src, C - 1)],
                             params.scaling[jnp.minimum(src, C - 1)]),
    }
    src_c = jnp.minimum(src, C - 1)
    for g in ("features_dc", "features_rest", "rotation", "opacity"):
        new_rows[g] = getattr(params, g)[src_c]
    params = _scatter_rows(params, src_c, dst, new_rows)

    placed = jnp.zeros(C, dtype=bool).at[dst].set(valid, mode="drop")
    alive = alive | placed

    # --- split parents replaced in place by child 1 (only those whose
    # second child actually got a slot keep full fidelity; parents whose
    # request was dropped stay unsplit)
    placed_src = jnp.zeros(C, dtype=bool).at[src_c].set(
        valid & is_split_src, mode="drop")
    xyz_child1 = sample_child(params, None, noise1)
    params = params.replace(
        xyz=jnp.where(placed_src[:, None], xyz_child1, params.xyz),
        scaling=jnp.where(placed_src[:, None], child_scale, params.scaling))

    # optimizer moments: fresh rows start at zero (reference
    # cat_tensors_to_optimizer zeros; split parents get fresh rows too)
    opt_state = zero_state_rows(opt_state, placed | placed_src)

    # --- prune (gaussian_model.py:550-555) ---
    opacity = jax.nn.sigmoid(params.opacity[:, 0])
    prune = alive & (opacity < min_opacity)
    use_screen = max_screen_size > 0
    prune = prune | (alive & use_screen & (aux.max_radii2d > max_screen_size))
    prune = prune | (alive & use_screen &
                     (jnp.max(jnp.exp(params.scaling), axis=1) > 0.1 * extent))
    alive = alive & ~prune

    # park dead rows at benign values and reset stats (reference postfix
    # zeroes accumulators and max_radii2D for everyone)
    dead = ~alive
    params = params.replace(
        opacity=jnp.where(dead[:, None], DEAD_OPACITY_LOGIT, params.opacity),
        scaling=jnp.where(dead[:, None], DEAD_LOG_SCALE, params.scaling))
    opt_state = zero_state_rows(opt_state, dead)

    zeros = jnp.zeros((C,), jnp.float32)
    aux = GaussianAux(alive=alive, max_radii2d=zeros,
                      xyz_gradient_accum=zeros, denom=zeros)
    info = {"n_cloned": jnp.sum((clone_mask & request).astype(jnp.int32)),
            "n_split": jnp.sum(split_mask.astype(jnp.int32)),
            "n_pruned": jnp.sum(prune.astype(jnp.int32)),
            "n_dropped": jnp.maximum(n_request - n_free, 0),
            "n_alive": jnp.sum(alive.astype(jnp.int32))}
    return params, aux, opt_state, info


def reset_opacity(params: GaussianParams, opt_state: AdamState):
    """opacity ← inverse_sigmoid(min(opacity, 0.01)) + fresh opacity moments
    (reference gaussian_model.py:348-351)."""
    from gslm_tpu.optim import zero_state_group
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01))
    return params.replace(opacity=new_op), zero_state_group(opt_state, "opacity")
