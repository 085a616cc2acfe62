"""Per-pixel residual vectors for nonlinear least squares.

Functional equivalent of the reference's residual construction
(solver/training_loss.py:10-65, solver/batch_training_loss.py:10-105) and of
its residual-space generalized vectors (solver/loss_image_state.py): the
residual of a camera batch is a pytree ``ResidualState`` whose squared L2
norm is the training loss, so LM can treat the whole render+loss pipeline as
r(θ) and CGLS can do exact vector algebra on pytrees.

Weighting contract (training_loss.py:40-43):
    r_l1   = sqrt((1-λ)/n) * sqrt(|I - gt| + 1e-6)
    r_ssim = sqrt(λ/n)     * sqrt(|1 - SSIM| + 1e-6)
with n = 3·H·W per image, so ‖r‖² = weighted scalar loss. With
``disable_ssim=True`` (the mode the reference LM trainer actually runs,
train_jvp.py:212 → batch_training_loss.py:15-17) the residual is the plain
difference r = I - gt and the ssim slot *aliases* the same tensor — we
reproduce the alias (so ‖r‖² doubles, exactly like the reference).

Padded-canvas handling: residuals are multiplied by the per-view pixel
validity mask, enforcing the padded-region-zero invariant the reference
asserts (loss_image_state.py:25-38). (The reference's sqrt path would break
its own invariant on padded batches; masking is the correct generalization.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslm_tpu.models.cameras import CameraBatch
from gslm_tpu.models.gaussians import GaussianParams
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.ops.ssim import ssim_map
from gslm_tpu.renderer import batch_render
from gslm_tpu.struct import pytree_dataclass


@pytree_dataclass
class ResidualState:
    """Residual-space generalized vector (BatchLossImageState analog)."""

    l1: jnp.ndarray    # (B, 3, H, W)
    ssim: jnp.ndarray  # (B, 3, H, W)

    # -- scalars (squared L2 norms, loss_image_state.py:16-19) --
    @property
    def l1_scalar(self):
        return jnp.vdot(self.l1, self.l1)

    @property
    def ssim_scalar(self):
        return jnp.vdot(self.ssim, self.ssim)

    @property
    def loss_scalar(self):
        return self.l1_scalar + self.ssim_scalar


def res_dot(a: ResidualState, b: ResidualState) -> jnp.ndarray:
    return jnp.vdot(a.l1, b.l1) + jnp.vdot(a.ssim, b.ssim)


def res_saxpy(alpha, x: ResidualState, y: ResidualState) -> ResidualState:
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def res_scale(alpha, x: ResidualState) -> ResidualState:
    return jax.tree.map(lambda xi: alpha * xi, x)


def batch_residuals(params: GaussianParams, cameras: CameraBatch,
                    bg: jnp.ndarray, *, config: RasterConfig = RasterConfig(),
                    lambda_dssim: float = 0.2, disable_ssim: bool = False,
                    use_trained_exp: bool = False,
                    active_sh_degree: int | None = None,
                    alive: jnp.ndarray | None = None) -> ResidualState:
    """Render the batch and build the per-pixel residual vector."""
    out = batch_render(params, cameras, bg, config=config,
                       active_sh_degree=active_sh_degree,
                       use_trained_exp=use_trained_exp, alive=alive)
    images = out.render * cameras.alpha_mask          # (B,3,H,W)
    valid = cameras.pixel_valid()                     # (B,1,H,W)
    gt = cameras.gt_image

    if disable_ssim:
        r = (images - gt) * valid
        return ResidualState(l1=r, ssim=r)

    n = 3.0 * cameras.heights.astype(jnp.float32) * cameras.widths.astype(jnp.float32)
    w_l1 = jnp.sqrt((1.0 - lambda_dssim) / n)[:, None, None, None]
    w_ssim = jnp.sqrt(lambda_dssim / n)[:, None, None, None]

    l1_pp = jnp.abs(images - gt)
    ssim_loss_pp = jnp.abs(1.0 - ssim_map(images, gt))
    r_l1 = w_l1 * jnp.sqrt(l1_pp + 1e-6) * valid
    r_ssim = w_ssim * jnp.sqrt(ssim_loss_pp + 1e-6) * valid
    return ResidualState(l1=r_l1, ssim=r_ssim)


def scalar_training_loss(params: GaussianParams, cameras: CameraBatch,
                         bg: jnp.ndarray, *,
                         config: RasterConfig = RasterConfig(),
                         lambda_dssim: float = 0.2,
                         use_trained_exp: bool = False,
                         active_sh_degree: int | None = None,
                         alive: jnp.ndarray | None = None,
                         mean2d_offset: jnp.ndarray | None = None):
    """First-order scalar loss, mean over views of
    (1-λ)·L1 + λ·(1-SSIM) over each view's valid pixels (reference
    train.py:118-126 / solver/training_loss.py:67-108).

    Returns (loss, aux dict with per-view L1, render output)."""
    out = batch_render(params, cameras, bg, config=config,
                       active_sh_degree=active_sh_degree,
                       use_trained_exp=use_trained_exp, alive=alive,
                       mean2d_offset=mean2d_offset)
    images = out.render * cameras.alpha_mask
    valid = cameras.pixel_valid()
    gt = cameras.gt_image
    npix = 3.0 * jnp.sum(valid, axis=(1, 2, 3))       # (B,)

    l1 = jnp.sum(jnp.abs(images - gt) * valid, axis=(1, 2, 3)) / npix
    smap = ssim_map(images, gt) * valid
    ssim_mean = jnp.sum(smap, axis=(1, 2, 3)) / npix
    loss_per_view = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_mean)
    loss = jnp.mean(loss_per_view)
    return loss, {"l1": l1, "ssim": ssim_mean, "render": out}
