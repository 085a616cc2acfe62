"""Real spherical-harmonics evaluation (degrees 0..3) for view-dependent color.

Same real-SH basis and constants as the reference (utils/sh_utils.py:57-118,
PlenOctree lineage), expressed as a single einsum-friendly basis-matrix product
so the per-Gaussian color evaluation runs as one (P, K) x (P, K, 3) contraction
on the VPU/MXU instead of a chain of scalar fmas.

Layout: sh coefficients are (..., K, 3) with K = (deg+1)^2, matching the
reference's features = cat([features_dc (P,1,3), features_rest (P,15,3)]).
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)

# 3DGS trains at degree 3 (16 coeffs); degree 4 is supported for parity
# with the reference basis (utils/sh_utils.py:98-116).
MAX_SH_DEGREE = 4


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis functions at unit directions.

    Args:
      deg: static SH degree in [0, 3].
      dirs: (..., 3) unit directions.
    Returns:
      (..., (deg+1)^2) basis values, ordered as the reference's eval_sh.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    cols = [C0 * one]
    if deg > 0:
        cols += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        cols += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if deg > 3:
        cols += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(cols, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color: sh (..., K, 3) at unit dirs (..., 3) → (..., 3).

    Only the first (deg+1)^2 coefficients participate (reference
    sh_utils.py:129-131 active-degree semantics)."""
    k = num_sh_coeffs(deg)
    basis = sh_basis(deg, dirs)  # (..., k)
    # Explicit multiply+reduce (not einsum/dot): K<=16 gains nothing on the
    # MXU and the fixed reduction order keeps results identical under vmap.
    return jnp.sum(basis[..., None] * sh[..., :k, :], axis=-2)


def rgb2sh(rgb):
    return (rgb - 0.5) / C0


def sh2rgb(sh):
    return sh * C0 + 0.5
