"""Per-Gaussian preprocess: projection, EWA 2D covariance, SH color, tiling.

TPU-native equivalent of the CUDA rasterizer's ``preprocessCUDA`` kernel
(reference submodule diff-gaussian-rasterization-jvp, API reconstructed at
gaussian_renderer/__init__.py:36-110). One fully-vectorized pass over all P
Gaussians: every step is a (P, ...) elementwise/small-matmul op that XLA
fuses; there is no per-Gaussian control flow, culling is a mask.

Semantics matched to the CUDA kernel:
  - frustum cull at view z <= 0.2
  - perspective-correct projection via the full (proj @ view) matrix with
    w + 1e-7 guard; NDC → pixel as ((ndc+1)*size - 1)/2
  - EWA: cov2d = J W Σ Wᵀ Jᵀ with the 1.3*tanfov frustum clamp on t
  - low-pass dilation += 0.3 px on the diagonal; with antialiasing the
    opacity is rescaled by sqrt(det_orig / det_dilated)
  - radius = ceil(3 sqrt(λ_max)) of the dilated covariance
  - tile rect = tiles overlapped by the radius square, clamped to the grid
  - SH color clamped at 0 (clamp gates the gradient, like the CUDA backward)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslm_tpu.models.cameras import Camera
from gslm_tpu.models.gaussians import GaussianParams
from gslm_tpu.ops.sh import eval_sh
from gslm_tpu.struct import pytree_dataclass
from gslm_tpu.utils.general import quat_normalize

TILE = 16
NEAR_CULL = 0.2
LOWPASS = 0.3


@pytree_dataclass
class Splats2D:
    """Projected per-Gaussian screen-space data (all (P, ...) arrays).

    Invisible Gaussians have ``visible=False`` and all fields sanitized to
    finite values so downstream gathers never produce NaNs."""

    mean2d: jnp.ndarray      # (P, 2) pixel coords
    conic: jnp.ndarray       # (P, 3) upper-tri of inverse 2D covariance
    color: jnp.ndarray       # (P, 3) RGB (>= 0)
    opacity: jnp.ndarray     # (P,) effective opacity (AA-rescaled)
    depth: jnp.ndarray       # (P,) view-space z (sort key)
    invdepth: jnp.ndarray    # (P,) 1/z
    radius: jnp.ndarray      # (P,) int32 pixel radius (0 = culled)
    rect_min: jnp.ndarray    # (P, 2) int32 (tx0, ty0)
    rect_max: jnp.ndarray    # (P, 2) int32 (tx1, ty1) exclusive
    tile_count: jnp.ndarray  # (P,) int32 tiles touched
    visible: jnp.ndarray     # (P,) bool


def quad_min_rect(a, b, c, dx0, dx1, dy0, dy1):
    """Exact minimum of the PSD quadratic q(x,y)=a x² + 2b xy + c y² over
    the axis-aligned rectangle [dx0,dx1]×[dy0,dy1] (all elementwise arrays).

    Used for exact ellipse–tile-rectangle intersection culling: a splat
    contributes to a tile iff min q ≤ s2 = 2·ln(255·opacity) somewhere on
    the tile (the compositor gates alpha < 1/255 — composite.py ALPHA_MIN,
    matching CUDA renderCUDA's skip), so tiles failing this test can be
    dropped from the record stream with *bitwise identical* output. The
    min of a PSD quadratic over a rect is attained at the center (if
    inside) or on one of the 4 edges, where the 1-D restriction is a
    clamped parabola — closed form, no iteration."""
    inside = (dx0 <= 0) & (0 <= dx1) & (dy0 <= 0) & (0 <= dy1)
    ia = 1.0 / jnp.maximum(a, 1e-12)
    ic = 1.0 / jnp.maximum(c, 1e-12)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_x(dx):                      # x fixed, minimize over y
        dy = jnp.clip(-b * dx * ic, dy0, dy1)
        return q(dx, dy)

    def edge_y(dy):                      # y fixed, minimize over x
        dx = jnp.clip(-b * dy * ia, dx0, dx1)
        return q(dx, dy)

    m = jnp.minimum(jnp.minimum(edge_x(dx0), edge_x(dx1)),
                    jnp.minimum(edge_y(dy0), edge_y(dy1)))
    return jnp.where(inside, 0.0, m)


def compute_cov3d(scaling, rotation, scaling_modifier=1.0):
    """Upper-tri components of Σ = (R S)(R S)ᵀ as six (P,) arrays
    (xx, xy, xz, yy, yz, zz).

    Fully elementwise f32 on purpose: a batched (P, 3, 3) matmul is a
    pathological TPU layout (3 of 128 lanes used; measured 5 ms at P=131k
    even at Precision.HIGHEST vs <0.5 ms for the unrolled component math,
    which is also exact f32 — no bf16 matmul passes at all). Same math as
    the CUDA computeCov3D scalar kernel."""
    q = quat_normalize(rotation)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scaling * scaling_modifier
    v0, v1, v2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    return dict(
        xx=r00 * r00 * v0 + r01 * r01 * v1 + r02 * r02 * v2,
        xy=r00 * r10 * v0 + r01 * r11 * v1 + r02 * r12 * v2,
        xz=r00 * r20 * v0 + r01 * r21 * v1 + r02 * r22 * v2,
        yy=r10 * r10 * v0 + r11 * r11 * v1 + r12 * r12 * v2,
        yz=r10 * r20 * v0 + r11 * r21 * v1 + r12 * r22 * v2,
        zz=r20 * r20 * v0 + r21 * r21 * v1 + r22 * r22 * v2)


def preprocess(params: GaussianParams, camera: Camera, *,
               active_sh_degree: int, antialiasing: bool = False,
               scaling_modifier: float = 1.0,
               alive: jnp.ndarray | None = None,
               mean2d_offset: jnp.ndarray | None = None,
               color_override: jnp.ndarray | None = None) -> Splats2D:
    """Project all Gaussians into one camera.

    ``mean2d_offset``: optional (P, 2) zeros added to the projected mean in
    NDC-half units (grad carrier for densification stats — functional
    replacement for the reference's ``screenspace_points`` trick,
    gaussian_renderer/__init__.py:26-30; its gradient scale matches the CUDA
    dL/dmean2D convention of 0.5*W / 0.5*H pixels-per-unit).
    """
    xyz = params.xyz
    P = xyz.shape[0]
    W, H = camera.width, camera.height
    fx = W / (2.0 * camera.tanfovx)
    fy = H / (2.0 * camera.tanfovy)

    # --- view/clip transforms ---
    # Written as explicit multiply-adds (not matmuls): with K=3 there is no
    # MXU win, the VPU fuses these into the surrounding elementwise graph,
    # and the fixed reduction order makes results bitwise-identical whether
    # the camera is a single view or a vmapped batch axis.
    def xform(m):
        """rows of (m @ [xyz, 1]) for a (rows, 4) slice m."""
        return [m[r, 0] * xyz[:, 0] + m[r, 1] * xyz[:, 1]
                + m[r, 2] * xyz[:, 2] + m[r, 3] for r in range(m.shape[0])]

    wv = camera.world_view
    tx_, ty_, tz_ = xform(wv[:3])
    t = jnp.stack([tx_, ty_, tz_], axis=-1)      # (P, 3) view space
    hx, hy, hz, hw = xform(camera.full_proj)
    inv_w = 1.0 / (hw + 1e-7)
    p_proj = jnp.stack([hx * inv_w, hy * inv_w, hz * inv_w], axis=-1)

    in_front = t[:, 2] > NEAR_CULL
    tz = jnp.where(in_front, t[:, 2], 1.0)       # sanitized z

    mean2d = jnp.stack([((p_proj[:, 0] + 1.0) * W - 1.0) * 0.5,
                        ((p_proj[:, 1] + 1.0) * H - 1.0) * 0.5], axis=-1)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset * jnp.array([0.5 * W, 0.5 * H],
                                                    dtype=mean2d.dtype)

    # --- EWA 2D covariance ---
    cov3d = compute_cov3d(params.get_scaling(), params.rotation,
                          scaling_modifier)        # (P, 3, 3)
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    txz = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    tyz = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # T = J @ W expanded analytically (J rows are [fx/tz, 0, -fx*x/tz²] and
    # [0, fy/tz, -fy*y/tz²]) — the same scalar expansion the CUDA
    # computeCov2D uses, elementwise over P.
    j00 = fx / tz
    j02 = -(fx * txz) / (tz * tz)
    j11 = fy / tz
    j12 = -(fy * tyz) / (tz * tz)
    Wrot = wv[:3, :3]                              # view rotation
    T0 = [j00 * Wrot[0, k] + j02 * Wrot[2, k] for k in range(3)]
    T1 = [j11 * Wrot[1, k] + j12 * Wrot[2, k] for k in range(3)]

    # cov2d = T Σ Tᵀ with Σ symmetric: first U = T Σ (2x3), then U Tᵀ.
    def sig_row(v):
        return [cov3d["xx"] * v[0] + cov3d["xy"] * v[1] + cov3d["xz"] * v[2],
                cov3d["xy"] * v[0] + cov3d["yy"] * v[1] + cov3d["yz"] * v[2],
                cov3d["xz"] * v[0] + cov3d["yz"] * v[1] + cov3d["zz"] * v[2]]

    U0 = sig_row(T0)
    U1 = sig_row(T1)
    c00 = U0[0] * T0[0] + U0[1] * T0[1] + U0[2] * T0[2]
    c01 = U0[0] * T1[0] + U0[1] * T1[1] + U0[2] * T1[2]
    c11 = U1[0] * T1[0] + U1[1] * T1[1] + U1[2] * T1[2]
    det_orig = c00 * c11 - c01 * c01
    c00d = c00 + LOWPASS
    c11d = c11 + LOWPASS
    det = c00d * c11d - c01 * c01
    det_ok = det > 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c11d * inv_det, -c01 * inv_det, c00d * inv_det], -1)

    if antialiasing:
        conv_scale = jnp.sqrt(jnp.maximum(
            1e-6, jnp.where(det_ok, det_orig / jnp.where(det_ok, det, 1.0), 1e-6)))
    else:
        conv_scale = jnp.ones_like(det)

    opacity = jax.nn.sigmoid(params.opacity[:, 0]) * conv_scale

    # --- screen radius & tile rect ---
    # ``radius`` keeps the CUDA semantics (ceil(3 sqrt(lambda_max)), used
    # for visibility_filter / max_radii2D / densification pruning), but the
    # tile rect is the *opacity-aware per-axis AABB* of the contributing
    # region: the compositor gates contributions at alpha >= 1/255
    # (composite.py ALPHA_MIN, matching the CUDA renderCUDA skip), so any
    # tile where alpha = opa*exp(power) stays below 1/255 everywhere is
    # dead weight. alpha >= amin <=> d' Sigma^-1 d <= s2 := 2 ln(255 opa),
    # whose AABB half-extents are sqrt(s2 * Sigma_xx/yy) = sqrt(s2 * c00d/
    # c11d). This is exact (tighter than the CUDA 3-sigma *square*, which
    # both truncates opaque splats early and pads transparent ones) and
    # cuts the (gaussian, tile) record stream ~2x at typical opacities —
    # every downstream stage (sort, gather, compositor, backward) scales
    # with that stream.
    mid = 0.5 * (c00d + c11d)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    s2 = 2.0 * jnp.log(jnp.maximum(opacity * 255.0, 1e-12))
    opa_vis = s2 > 0.0
    s2 = jnp.maximum(s2, 0.0)
    margin = 0.01                     # conservative float-rounding pad (px)
    rx = jnp.sqrt(s2 * jnp.maximum(c00d, 0.0)) + margin
    ry = jnp.sqrt(s2 * jnp.maximum(c11d, 0.0)) + margin

    ntx = -(-W // TILE)
    nty = -(-H // TILE)
    px, py = mean2d[:, 0], mean2d[:, 1]
    tx0 = jnp.clip((px - rx).astype(jnp.int32) // TILE, 0, ntx)
    ty0 = jnp.clip((py - ry).astype(jnp.int32) // TILE, 0, nty)
    tx1 = jnp.clip(((px + rx + TILE - 1) / TILE).astype(jnp.int32), 0, ntx)
    ty1 = jnp.clip(((py + ry + TILE - 1) / TILE).astype(jnp.int32), 0, nty)
    # CUDA getRect truncates toward zero after the divide; for in-range
    # values the clamp makes floor-divide equivalent.
    tile_count = jnp.maximum(tx1 - tx0, 0) * jnp.maximum(ty1 - ty0, 0)

    visible = in_front & det_ok & opa_vis & (radius_f > 0) & (tile_count > 0)
    if alive is not None:
        visible = visible & alive
    tile_count = jnp.where(visible, tile_count, 0)
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # --- color ---
    if color_override is not None:
        color = color_override
    else:
        dirs = xyz - camera.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        color = jnp.maximum(
            eval_sh(active_sh_degree, params.get_features(), dirs) + 0.5, 0.0)

    # --- sanitize invisible rows so gathers stay NaN-free ---
    vis_f = visible.astype(mean2d.dtype)[:, None]
    mean2d = jnp.where(jnp.isfinite(mean2d), mean2d, 0.0) * vis_f - (1.0 - vis_f) * 1e4
    conic = jnp.nan_to_num(conic, nan=0.0, posinf=0.0, neginf=0.0) * vis_f
    color = jnp.nan_to_num(color, nan=0.0, posinf=0.0, neginf=0.0)
    opacity = jnp.where(visible, opacity, 0.0)
    depth = jnp.where(visible, tz, jnp.inf)
    invdepth = jnp.where(visible, 1.0 / tz, 0.0)

    return Splats2D(mean2d=mean2d, conic=conic, color=color, opacity=opacity,
                    depth=depth, invdepth=invdepth, radius=radius,
                    rect_min=jnp.stack([tx0, ty0], -1),
                    rect_max=jnp.stack([tx1, ty1], -1),
                    tile_count=tile_count, visible=visible)
