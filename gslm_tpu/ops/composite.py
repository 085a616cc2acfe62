"""Closed-form front-to-back alpha compositing.

The CUDA ``renderCUDA`` kernel walks splats sequentially per pixel with an
early-exit once transmittance drops below 1e-4. On TPU a sequential per-splat
walk wastes the VPU, so we restate the *exact same semantics* in closed form:

With splats sorted front-to-back and per-splat alpha a_i (already gated at
the 1/255 contribution threshold), the running transmittance is
T_i = Π_{j<i} (1 - a_j), computed as one log-space cumsum. CUDA's rules map
to masks:

  - a splat contributes weight a_i·T_i iff T_i(1-a_i) >= 1e-4 (CUDA skips
    the splat *and* exits when the post-update transmittance would cross
    the threshold). Because T is non-increasing, every splat after the
    first failure also fails the test, so the mask needs no scan.
  - the background term uses the transmittance *frozen at the first
    failure* (CUDA exits without applying that splat). The first failing
    splat has the largest pre-update T among failures, so a masked max
    recovers the frozen value — and its gradient flows to exactly the
    splats before the failure point, matching the CUDA backward.

Everything is cumsum / elementwise / reduce: differentiable by jax.grad and
jax.jvp for free, deterministic (no atomics, unlike the CUDA backward), and
it vectorizes over pixels and tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def clip_alpha(alpha_raw: jnp.ndarray) -> jnp.ndarray:
    """min(alpha, 0.99) with straight-through gradient.

    The CUDA backward recomputes d alpha/d opacity = G without gating on the
    0.99 clip, i.e. the clip is forward-only; reproduce that so gradients
    match at saturated splats."""
    clipped = jnp.minimum(alpha_raw, ALPHA_MAX)
    return alpha_raw + jax.lax.stop_gradient(clipped - alpha_raw)


def composite_weights(alpha: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-splat compositing weights and final transmittance.

    Args:
      alpha: (N, ...) splat alphas sorted front-to-back along axis 0.
             Non-contributing entries must already be ~0 (< 1/255).
    Returns:
      weights: (N, ...) w_i = a_i * T_i (0 where skipped/terminated),
      t_final: (...) background transmittance.
    """
    contrib = alpha >= ALPHA_MIN
    a = jnp.where(contrib, alpha, 0.0)
    log_step = jnp.log1p(-a)
    log_t_after = jnp.cumsum(log_step, axis=0)
    t_after = jnp.exp(log_t_after)                  # T after splat i
    t_before = jnp.exp(log_t_after - log_step)      # T before splat i
    ok = contrib & (t_after >= T_EPS)
    weights = jnp.where(ok, a * t_before, 0.0)

    fail = contrib & (t_after < T_EPS)
    any_fail = jnp.any(fail, axis=0)
    t_frozen = jnp.max(jnp.where(fail, t_before, 0.0), axis=0)
    t_final = jnp.where(any_fail, t_frozen, t_after[-1])
    return weights, t_final


def alpha_from_conic(mean2d, conic, opacity, px, py, gate):
    """Evaluate splat alphas at pixel centers.

    mean2d (N,2), conic (N,3), opacity (N,) broadcast against pixel grids
    px/py (...); ``gate`` (N, ...) marks (splat, pixel) pairs allowed to
    contribute. Returns (N, ...) alphas with gated-out entries ~0 and clean
    gradients (power is clamped before exp so no inf*0)."""
    dx = mean2d[:, 0].reshape(mean2d.shape[0], *([1] * px.ndim)) - px[None]
    dy = mean2d[:, 1].reshape(mean2d.shape[0], *([1] * py.ndim)) - py[None]
    c0 = conic[:, 0].reshape(-1, *([1] * px.ndim))
    c1 = conic[:, 1].reshape(-1, *([1] * px.ndim))
    c2 = conic[:, 2].reshape(-1, *([1] * px.ndim))
    power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
    gate = gate & (power <= 0.0)
    power = jnp.where(gate, power, -100.0)
    alpha_raw = opacity.reshape(-1, *([1] * px.ndim)) * jnp.exp(power)
    return clip_alpha(alpha_raw)
