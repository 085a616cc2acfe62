"""Dense reference rasterizer (golden model).

Plays the role of the reference's ``diff_gaussian_rasterization_orig`` golden
path (gaussian_renderer/reference_render.py:14, tests/test_rasterizer.py:4):
a slow, obviously-correct implementation the production tiled/Pallas paths
are tested against at tight tolerances.

Every Gaussian is evaluated at every pixel — O(P·H·W) memory — so this is
for small scenes/tests only. Same semantics as the tiled path, including the
tile-rect spatial gate (a Gaussian never contributes to a pixel whose tile
its rect does not cover, exactly like the CUDA binning), so the two paths
agree to float tolerance. Differentiable end-to-end with plain jax.grad /
jax.jvp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslm_tpu.ops.composite import alpha_from_conic, composite_weights
from gslm_tpu.ops.projection import TILE, Splats2D


def rasterize_ref(splats: Splats2D, height: int, width: int,
                  bg: jnp.ndarray) -> dict:
    """Composite all splats over a (height, width) canvas.

    Returns dict(render (3,H,W), invdepth (1,H,W), t_final (H,W))."""
    depth_key = jnp.where(splats.visible, splats.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    mean2d = splats.mean2d[order]
    conic = splats.conic[order]
    color = splats.color[order]
    opacity = splats.opacity[order]
    invdepth = splats.invdepth[order]
    rect_min = splats.rect_min[order]
    rect_max = splats.rect_max[order]
    visible = splats.visible[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")      # (H, W)

    tx = (jnp.arange(width) // TILE)[None, :]          # (1, W)
    ty = (jnp.arange(height) // TILE)[:, None]         # (H, 1)
    in_rect = ((rect_min[:, 0][:, None, None] <= tx[None]) &
               (tx[None] < rect_max[:, 0][:, None, None]) &
               (rect_min[:, 1][:, None, None] <= ty[None]) &
               (ty[None] < rect_max[:, 1][:, None, None]))
    gate = in_rect & visible[:, None, None]

    alpha = alpha_from_conic(mean2d, conic, opacity, px, py, gate)  # (P,H,W)
    weights, t_final = composite_weights(alpha)

    image = jnp.einsum("phw,pc->chw", weights, color) + t_final[None] * bg[:, None, None]
    invd = jnp.einsum("phw,p->hw", weights, invdepth)[None]
    return {"render": image, "invdepth": invd, "t_final": t_final}
