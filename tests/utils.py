"""Shared test helpers: tiny synthetic scenes + cameras."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.cameras import Camera, CameraBatch, CameraMeta
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
                     spread=1.0, scale_range=(-3.5, -2.0)):
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
