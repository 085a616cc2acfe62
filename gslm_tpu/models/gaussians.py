"""Gaussian model state as a functional pytree.

TPU-first redesign of the reference's ``GaussianModel`` (scene/
gaussian_model.py:33-563) and ``GaussianModelState`` (solver/
gaussian_model_state.py): the seven parameter groups (xyz, features_dc,
features_rest, scaling, rotation, opacity, exposure) live in one frozen
dataclass registered as a pytree. Consequences:

- LM "generalized vectors" are just pytrees of the same structure —
  dot/saxpy/scalar-mul are tree_map reductions (replacing ~270 LoC of
  hand-rolled vector algebra in the reference).
- ``jax.jvp``/``jax.vjp`` over any function of a ``GaussianParams`` replace
  the reference's torch-fwAD ``make_dual`` tensor-swapping contextmanager
  (gaussian_model.py:71-101) and ``.grad`` harvesting.
- The Gaussian count is padded to a fixed **capacity** with an ``alive``
  mask so densify/clone/split/prune are shape-stable masked ops inside jit
  (the reference mutates tensor shapes and performs optimizer-state surgery,
  gaussian_model.py:406-523 — impossible under XLA's static-shape model).

Activation conventions match the reference exactly
(gaussian_model.py:35-50): exp on scaling, sigmoid on opacity, L2-normalize
on rotation quaternion; covariance Σ = (R S)(R S)ᵀ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.ops.sh import MAX_SH_DEGREE, num_sh_coeffs, rgb2sh
from gslm_tpu.struct import pytree_dataclass
from gslm_tpu.utils.general import (covariance_from_scaling_rotation,
                                    inverse_sigmoid, quat_normalize)

# Raw values used for dead (padding) slots: fully transparent, tiny, at the
# origin. Chosen so every activation/gradient at a dead slot is finite.
DEAD_OPACITY_LOGIT = -12.0
DEAD_LOG_SCALE = -15.0


@pytree_dataclass(static_fields=("sh_degree",))
class GaussianParams:
    """The seven optimizable parameter groups (raw / pre-activation).

    Shapes (C = capacity ≥ live count, K = (sh_degree+1)^2 - 1, M = #images):
      xyz            (C, 3)    world positions
      features_dc    (C, 1, 3) SH DC coefficients
      features_rest  (C, K, 3) higher-order SH coefficients
      scaling        (C, 3)    log scales
      rotation       (C, 4)    unnormalized quaternions (w, x, y, z)
      opacity        (C, 1)    opacity logits
      exposure       (M, 3, 4) per-image affine color transforms
    """

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    exposure: jnp.ndarray
    sh_degree: int = 3

    # ---- derived (activated) quantities -------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_images(self) -> int:
        return self.exposure.shape[0]

    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self):
        return quat_normalize(self.rotation)

    def get_features(self):
        """(C, K+1, 3) concatenated SH coefficients (dc first)."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0):
        return covariance_from_scaling_rotation(
            scaling_modifier * self.get_scaling(), self.rotation)


@pytree_dataclass
class GaussianAux:
    """Non-optimized per-Gaussian training state (same leading capacity dim).

    Mirrors the reference's side tensors: alive mask (new — capacity
    padding), max_radii2D, xyz_gradient_accum, denom
    (gaussian_model.py:62-66)."""

    alive: jnp.ndarray              # (C,) bool
    max_radii2d: jnp.ndarray        # (C,) float32
    xyz_gradient_accum: jnp.ndarray  # (C,) float32
    denom: jnp.ndarray              # (C,) float32

    @property
    def num_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))


def init_aux(capacity: int, num_points: int | None = None) -> GaussianAux:
    alive = (jnp.arange(capacity) < (capacity if num_points is None else num_points))
    zeros = jnp.zeros((capacity,), dtype=jnp.float32)
    return GaussianAux(alive=alive, max_radii2d=zeros,
                       xyz_gradient_accum=zeros, denom=zeros)


def round_capacity(n: int, multiple: int = 256) -> int:
    """Round a live count up to a lane-aligned capacity."""
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def pad_to_capacity(params: GaussianParams, capacity: int) -> GaussianParams:
    """Pad the per-Gaussian arrays with dead slots up to ``capacity``."""
    c0 = params.capacity
    assert capacity >= c0, f"capacity {capacity} < current {c0}"
    extra = capacity - c0
    if extra == 0:
        return params

    def pad(x, fill):
        pad_block = jnp.full((extra,) + x.shape[1:], fill, dtype=x.dtype)
        return jnp.concatenate([x, pad_block], axis=0)

    rot_pad = jnp.zeros((extra, 4), dtype=params.rotation.dtype).at[:, 0].set(1.0)
    return params.replace(
        xyz=pad(params.xyz, 0.0),
        features_dc=pad(params.features_dc, 0.0),
        features_rest=pad(params.features_rest, 0.0),
        scaling=pad(params.scaling, DEAD_LOG_SCALE),
        rotation=jnp.concatenate([params.rotation, rot_pad], axis=0),
        opacity=pad(params.opacity, DEAD_OPACITY_LOGIT),
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray, num_images: int,
                    sh_degree: int = 3, capacity: int | None = None,
                    mean_sq_dist: np.ndarray | None = None
                    ) -> tuple[GaussianParams, GaussianAux]:
    """Initialize from a point cloud, reproducing the reference recipe
    (gaussian_model.py:239-266): SH DC from RGB, zero higher-order SH,
    log-scales from sqrt of mean squared 3-NN distance, identity quats,
    opacity 0.1, identity per-image exposure.

    ``mean_sq_dist``: optional precomputed simple-knn style distances;
    computed here with the JAX knn op if absent.
    """
    n = points.shape[0]
    k = num_sh_coeffs(min(sh_degree, MAX_SH_DEGREE)) - 1
    if capacity is None:
        capacity = round_capacity(n)

    xyz = jnp.asarray(points, dtype=jnp.float32)
    f_dc = rgb2sh(jnp.asarray(colors, dtype=jnp.float32)).reshape(n, 1, 3)
    f_rest = jnp.zeros((n, k, 3), dtype=jnp.float32)

    if mean_sq_dist is None:
        from gslm_tpu import native
        mean_sq_dist = native.mean_sq_dist_3nn(np.asarray(points))
        if mean_sq_dist is None:     # no native toolchain: JAX fallback
            from gslm_tpu.ops.knn import mean_sq_dist_3nn
            mean_sq_dist = mean_sq_dist_3nn(xyz)
    dist2 = jnp.clip(jnp.asarray(mean_sq_dist, jnp.float32), 1e-7, None)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    rots = jnp.zeros((n, 4), dtype=jnp.float32).at[:, 0].set(1.0)
    opacities = inverse_sigmoid(0.1 * jnp.ones((n, 1), dtype=jnp.float32))
    exposure = jnp.broadcast_to(jnp.eye(3, 4, dtype=jnp.float32),
                                (num_images, 3, 4)).copy()

    params = GaussianParams(xyz=xyz, features_dc=f_dc, features_rest=f_rest,
                            scaling=scales, rotation=rots, opacity=opacities,
                            exposure=exposure, sh_degree=sh_degree)
    params = pad_to_capacity(params, capacity)
    return params, init_aux(capacity, n)


# ---------------------------------------------------------------------------
# Generalized-vector algebra over parameter pytrees (replaces the reference's
# GaussianModelState/DampMatrix/masks, solver/gaussian_model_state.py:4-273).
# ---------------------------------------------------------------------------

PARAM_GROUPS = ("xyz", "features_dc", "features_rest", "scaling", "rotation",
                "opacity", "exposure")


def zeros_like_params(params: GaussianParams) -> GaussianParams:
    return jax.tree.map(jnp.zeros_like, params)


def param_group_mask(**mask) -> dict[str, float]:
    """Multiplier per group: mask_xyz=True zeroes that group (reference
    GaussianModelParamGroupMask semantics: masked = excluded from the LM
    step)."""
    out = {}
    for g in PARAM_GROUPS:
        masked = mask.get(f"mask_{g}", False)
        out[g] = 0.0 if masked else 1.0
    return out


def apply_group_mask(v: GaussianParams, mask: dict[str, float]) -> GaussianParams:
    return v.replace(**{g: getattr(v, g) * mask[g] for g in PARAM_GROUPS})


def apply_splat_mask(v: GaussianParams, alive: jnp.ndarray) -> GaussianParams:
    """Zero per-Gaussian rows where not alive (reference
    GaussianModelSplatMask); exposure is untouched."""
    def mask_rows(x):
        return x * alive.reshape((-1,) + (1,) * (x.ndim - 1))
    return v.replace(**{g: mask_rows(getattr(v, g))
                        for g in PARAM_GROUPS if g != "exposure"})


def vdot(a: GaussianParams, b: GaussianParams,
         damp: dict[str, float] | float = 1.0) -> jnp.ndarray:
    """Damped inner product Σ_g damp_g ⟨a_g, b_g⟩ (reference
    gaussian_model_state.py:252-273 — but stays on-device: no .item())."""
    total = jnp.zeros((), dtype=jnp.float32)
    for g in PARAM_GROUPS:
        w = damp[g] if isinstance(damp, dict) else damp
        total = total + w * jnp.vdot(getattr(a, g), getattr(b, g))
    return total


def vdot_sharded(a: GaussianParams, b: GaussianParams,
                 damp: dict[str, float] | float, model_axis: str):
    """vdot for model-sharded vectors inside shard_map: per-Gaussian
    groups hold local shards (psum over the model axis), ``exposure`` is
    replicated (counted once)."""
    local = jnp.zeros((), dtype=jnp.float32)
    for g in PARAM_GROUPS:
        if g == "exposure":
            continue
        w = damp[g] if isinstance(damp, dict) else damp
        local = local + w * jnp.vdot(getattr(a, g), getattr(b, g))
    total = jax.lax.psum(local, model_axis)
    w = damp["exposure"] if isinstance(damp, dict) else damp
    return total + w * jnp.vdot(a.exposure, b.exposure)


def saxpy(a, x: GaussianParams, y: GaussianParams) -> GaussianParams:
    """a*x + y elementwise over all groups."""
    return jax.tree.map(lambda xi, yi: a * xi + yi, x, y)


def scale(a, x: GaussianParams) -> GaussianParams:
    return jax.tree.map(lambda xi: a * xi, x)


def add(x: GaussianParams, y: GaussianParams) -> GaussianParams:
    return jax.tree.map(jnp.add, x, y)


def default_damp_matrix() -> dict[str, float]:
    """LM per-group damping defaults (reference train_jvp.py:229-235)."""
    return {"xyz": 5e2, "features_dc": 5e-2, "features_rest": 5e-2,
            "scaling": 5e-2, "rotation": 5e-2, "opacity": 5e-2,
            "exposure": 1e1}
