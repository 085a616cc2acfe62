"""Synthetic scenes and cameras for benchmarks, dry runs, and tests.

The reference drives its kernel tests and timing harnesses from recorded
dataset checkpoints (tests/test_jvp_timing.py, tests/test_rasterizer.py);
we keep fully self-contained generators instead so every benchmark is
reproducible with no dataset on disk.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.cameras import CameraBatch, CameraMeta, batch_from_metas
from gslm_tpu.models.gaussians import (GaussianAux, GaussianParams, init_aux,
                                       pad_to_capacity)
from gslm_tpu.ops.sh import num_sh_coeffs
from gslm_tpu.utils.graphics import focal2fov


def make_camera(height=64, width=64, fov_deg=60.0, radius=4.0, angle=0.0,
                exposure_idx=0) -> CameraMeta:
    """Camera on a circle around the origin, looking at the origin."""
    fov = math.radians(fov_deg)
    # camera center in world space
    c = np.array([radius * math.sin(angle), 0.0, -radius * math.cos(angle)])
    # look-at rotation: camera z axis points from c to origin
    z = -c / np.linalg.norm(c)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    # world-to-cam: R_wc rows are camera axes; reference CameraMeta.R stores
    # the transpose (cam-to-world rotation), T the world-to-cam translation.
    R_wc = np.stack([x, y, z], axis=0)
    T = -R_wc @ c
    fovx = fov
    fovy = focal2fov(width / (2 * math.tan(fov / 2)), height)
    return CameraMeta(uid=exposure_idx, colmap_id=exposure_idx, R=R_wc.T, T=T,
                      fovx=fovx, fovy=fovy, width=width, height=height,
                      image_name=f"cam{exposure_idx}",
                      exposure_idx=exposure_idx)


def random_gaussians(rng, n=128, capacity=None, sh_degree=3, num_images=4,
                     spread=1.0, scale_range=(-3.5, -2.0)
                     ) -> tuple[GaussianParams, GaussianAux]:
    """Random cloud of n Gaussians (padded to ``capacity`` if given)."""
    k = num_sh_coeffs(sh_degree) - 1
    params = GaussianParams(
        xyz=jnp.asarray(rng.uniform(-spread, spread, (n, 3)), jnp.float32),
        features_dc=jnp.asarray(rng.normal(0, 0.5, (n, 1, 3)), jnp.float32),
        features_rest=jnp.asarray(rng.normal(0, 0.05, (n, k, 3)), jnp.float32),
        scaling=jnp.asarray(rng.uniform(*scale_range, (n, 3)), jnp.float32),
        rotation=jnp.asarray(rng.normal(0, 1, (n, 4)), jnp.float32),
        opacity=jnp.asarray(rng.uniform(-1.0, 2.0, (n, 1)), jnp.float32),
        exposure=jnp.broadcast_to(jnp.eye(3, 4), (num_images, 3, 4)),
        sh_degree=sh_degree)
    if capacity is not None and capacity > n:
        params = pad_to_capacity(params, capacity)
        aux = init_aux(capacity, n)
    else:
        aux = init_aux(n, n)
    return params, aux


def ring_camera_batch(n_views: int, height: int, width: int, radius=4.0,
                      gt_seed: int | None = 0) -> CameraBatch:
    """A batch of cameras on a ring, with random ground-truth images (so
    losses/gradients are non-degenerate) unless ``gt_seed`` is None."""
    metas = [make_camera(height=height, width=width,
                         angle=2 * math.pi * i / max(n_views, 1),
                         radius=radius, exposure_idx=i)
             for i in range(n_views)]
    batch = batch_from_metas(metas)
    if gt_seed is not None:
        rng = np.random.default_rng(gt_seed)
        gt = rng.uniform(0, 1, batch.gt_image.shape).astype(np.float32)
        batch = batch.replace(gt_image=jnp.asarray(gt))
    return batch
