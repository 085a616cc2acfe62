"""Matrix-free Jacobian operators over the render+loss pipeline.

Replaces the reference's ``LinearSolverFunctions``
(solver/solver_functions.py:15-138): where the reference swaps every
parameter tensor for a torch-fwAD dual inside a contextmanager
(gaussian_model.py:71-101) to get J·v, and re-renders + ``loss.backward(v,
retain_graph=True)`` per micro-batch to get Jᵀ·v (solver_functions.py:
101-132), here the whole pipeline is a pure function r(θ) and

    J·v  = jax.jvp(r, θ, v)          (one linearized forward)
    Jᵀ·u = jax.vjp(r, θ)(u)          (linearization built once, reused for
                                      every subsequent Jᵀ·u — the reference
                                      re-renders for each one)

Micro-batching over views (the reference's ``batch_size`` chunking,
solver_functions.py:38-49) is a ``lax.map`` over camera chunks inside the
residual function, so it lives *under* the same jvp/vjp and the partial
results never leave the device. Parameter-group masks and the alive/splat
mask (solver/gaussian_model_state.py:30-48) are applied to tangents and
cotangents.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from gslm_tpu.models import gaussians as G
from gslm_tpu.models.gaussians import GaussianParams
from gslm_tpu.solver.residuals import ResidualState, res_dot, res_saxpy


def _mask_fn(group_mask: dict[str, float] | None, alive: jnp.ndarray | None):
    def apply(v: GaussianParams) -> GaussianParams:
        if group_mask is not None:
            v = G.apply_group_mask(v, group_mask)
        if alive is not None:
            v = G.apply_splat_mask(v, alive.astype(v.xyz.dtype))
        return v
    return apply


class LMOperators:
    """Bundle of (matvec, matvec_T, dots, saxpys) closures around a residual
    function and a parameter point. Pure-functional: building one performs
    one linearizing forward pass; it holds no mutable state."""

    def __init__(self, residual_fn: Callable[[GaussianParams], ResidualState],
                 params: GaussianParams,
                 group_mask: dict[str, float] | None = None,
                 alive: jnp.ndarray | None = None,
                 reuse_linearization: bool = True,
                 residual_fn_jvp: Callable | None = None,
                 axis_name: str | None = None,
                 param_axis: str | None = None):
        """``residual_fn_jvp``: optional forward-mode-capable variant of
        ``residual_fn`` (same primal). Needed when residual_fn renders
        through a custom-VJP Pallas kernel — JAX allows only one custom
        rule per function, so J·v uses the custom-JVP twin
        (renderer impl="pallas_jvp") while Jᵀ·u uses the custom-VJP one.

        ``axis_name``: set when running inside shard_map with the residual
        axis sharded across devices (a view axis, a tile-band axis, or a
        tuple of both) — residual-space dots and Jᵀ·u partials then psum
        over it.

        ``param_axis``: set when the per-Gaussian parameter groups are
        ALSO sharded (model parallelism): param-space dots psum local
        shard products over this axis (exposure stays replicated), and
        Jᵀ·u additionally psums the replicated exposure cotangent over it
        (the per-Gaussian cotangents are already owner-resident through
        the all_gather transpose)."""
        self.residual_fn = residual_fn
        self.residual_fn_jvp = residual_fn_jvp or residual_fn
        self.params = params
        self._mask = _mask_fn(group_mask, alive)
        self.axis_name = axis_name
        self.param_axis = param_axis
        self.reuse_linearization = reuse_linearization
        if reuse_linearization:
            self.residual, self._vjp_fn = jax.vjp(residual_fn, params)
        else:
            self.residual = residual_fn(params)
            self._vjp_fn = None
        # bind collective-aware vector algebra (the static methods stay
        # for the single-device path)
        if axis_name is not None or param_axis is not None:
            self.dot = functools.partial(self._dot_axis, axis_name,
                                         param_axis)
            self.saxpy = LMOperators.saxpy

    @staticmethod
    def _dot_axis(axis_name, param_axis, a, b, damp=1.0):
        if isinstance(a, ResidualState):
            assert damp == 1.0 or not isinstance(damp, dict)
            local = res_dot(a, b) * (1.0 if damp == 1.0 else damp)
            # residuals shard over the view axis AND (in model-parallel
            # mode) the tile-band axis — reduce over every axis present
            axes = tuple(x for x in (axis_name, param_axis) if x)
            return jax.lax.psum(local, axes) if axes else local
        if param_axis is not None:
            return G.vdot_sharded(a, b, damp, param_axis)
        return G.vdot(a, b, damp)   # params replicated: no collective

    # -- operator protocol (reference solver_functions.py:83-138) --------
    def matvec(self, v: GaussianParams) -> ResidualState:
        """J·v via forward-mode."""
        _, jv = jax.jvp(self.residual_fn_jvp, (self.params,),
                        (self._mask(v),))
        return jv

    def matvec_T(self, u: ResidualState) -> GaussianParams:
        """Jᵀ·u via reverse-mode (psum of per-shard partials when the view
        axis is sharded; with model-sharded params only the replicated
        exposure leaf needs the param-axis reduction)."""
        if self._vjp_fn is not None:
            (g,) = self._vjp_fn(u)
        else:
            _, vjp_fn = jax.vjp(self.residual_fn, self.params)
            (g,) = vjp_fn(u)
        if self.param_axis is not None:
            g = g.replace(exposure=jax.lax.psum(g.exposure, self.param_axis))
        if self.axis_name is not None:
            # data-axis views differ per shard: sum partials. NOTE with a
            # tuple axis_name that includes the param_axis this would
            # wrongly multiply per-Gaussian cotangents — callers pass only
            # the data axis here and the tuple only where residuals live.
            g = jax.lax.psum(g, self.axis_name)
        return self._mask(g)

    def get_initial_solution(self) -> GaussianParams:
        return G.zeros_like_params(self.params)

    @property
    def loss_scalar(self):
        axes = tuple(x for x in (self.axis_name, self.param_axis) if x)
        if axes:
            return jax.lax.psum(self.residual.loss_scalar, axes)
        return self.residual.loss_scalar

    # -- generalized vector algebra, dispatching on space -----------------
    @staticmethod
    def dot(a, b, damp=1.0):
        if isinstance(a, ResidualState):
            assert damp == 1.0 or not isinstance(damp, dict)
            return res_dot(a, b) * (1.0 if damp == 1.0 else damp)
        return G.vdot(a, b, damp)

    @staticmethod
    def saxpy(alpha, x, y):
        if isinstance(x, ResidualState):
            return res_saxpy(alpha, x, y)
        return G.saxpy(alpha, x, y)

    @staticmethod
    def dampmul_for(damp: dict[str, float]):
        """D·x for a per-group damping dict (GaussianModelDampMatrix analog)."""
        def dampmul(x: GaussianParams) -> GaussianParams:
            return x.replace(**{g: getattr(x, g) * damp[g]
                                for g in G.PARAM_GROUPS})
        return dampmul


def chunked_residual_fn(residual_of_batch: Callable, cameras_stacked,
                        chunk_size: int, view_valid=None):
    """Micro-batch a residual function over the view axis with lax.map.

    ``cameras_stacked``: a CameraBatch whose leading axis B is a multiple of
    chunk_size (pad views if needed; zero the pads via ``view_valid``).
    ``view_valid``: optional (B,) f32 per-view weights multiplied into the
    residuals (0.0 for padding views). Returns r(θ) evaluating all chunks
    sequentially on-device — bounded memory like the reference's batch_size
    loop (solver_functions.py:38-49), but inside one traced program, so the
    LM operators' jvp/vjp run *through* the chunk loop and peak memory is
    one chunk's render, not the whole window.

    The per-chunk body is ``jax.checkpoint``-ed: without remat, lax.map's
    backward saves EVERY chunk's render intermediates (sorted record
    streams, compositor saves) and the map bounds nothing — the scan would
    hold all B views' intermediates at once, exactly what micro-batching
    exists to avoid. With remat only the chunk inputs are saved and the
    backward replays each chunk's forward (the reference pays the same
    recompute: its batch loop re-renders per chunk in backward_real,
    solver_functions.py:110-121). Pinned by
    test_operators.py::test_chunked_backward_memory_bound.
    """
    def split(x):
        b = x.shape[0]
        assert b % chunk_size == 0, (b, chunk_size)
        return x.reshape(b // chunk_size, chunk_size, *x.shape[1:])

    chunked = jax.tree.map(split, cameras_stacked)
    if view_valid is not None:
        chunked = (chunked, split(view_valid))

    def residual_fn(params):
        if view_valid is None:
            body = jax.checkpoint(
                lambda p, cams: residual_of_batch(p, cams))
            out = jax.lax.map(lambda cams: body(params, cams), chunked)
        else:
            @jax.checkpoint
            def one(params, args):
                cams, w = args
                r = residual_of_batch(params, cams)
                return jax.tree.map(
                    lambda x: x * w[:, None, None, None], r)
            out = jax.lax.map(lambda a: one(params, a), chunked)
        return jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), out)

    return residual_fn
