"""High-level render API.

Functional counterpart of the reference's render wrappers
(gaussian_renderer/__init__.py:18-128 single view,
gaussian_renderer/batch_render.py:8-135 batched). Returns the same logical
contract: clamped RGB image, per-Gaussian radii/visibility, inverse-depth
map — as a pytree instead of a dict of CUDA tensors.

Batching is ``jax.vmap`` over the camera pytree: the per-Gaussian preprocess
and the tile pipeline batch across views inside one XLA program, which is
what the reference's fused BatchGaussianRasterizer launch achieves, and with
a ``data``-sharded camera batch under pjit it spreads views across chips.
Unlike the reference, batched exposure works (batch_render.py:112 raises
NotImplementedError).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gslm_tpu.models.cameras import Camera, CameraBatch
from gslm_tpu.models.gaussians import GaussianParams
from gslm_tpu.ops.projection import preprocess
from gslm_tpu.ops.rasterize_ref import rasterize_ref
from gslm_tpu.ops.rasterize_tiled import RasterConfig, rasterize_tiled
from gslm_tpu.struct import pytree_dataclass


@pytree_dataclass
class RenderOutput:
    render: jnp.ndarray       # (3, H, W) in [0, 1]
    invdepth: jnp.ndarray     # (1, H, W)
    radii: jnp.ndarray        # (P,) int32
    visibility: jnp.ndarray   # (P,) bool
    n_duplicates: jnp.ndarray  # () int32 diagnostics
    overflow: jnp.ndarray      # () int32
    max_tile_load: jnp.ndarray  # () int32


def resolve_impl(impl: str) -> str:
    """Resolve "auto" to the concrete compositor for this backend."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "tiled"
    return impl


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """image (3,H,W), exposure (3,4) affine: out_d = Σ_c img_c E[c,d] + E[d,3]
    (reference gaussian_renderer/__init__.py:113-115). Elementwise mul+sum so
    batched and single-view renders agree bitwise."""
    return (jnp.sum(image[:, None] * exposure[:3, :3][:, :, None, None], axis=0)
            + exposure[:3, 3][:, None, None])


def render(params: GaussianParams, camera: Camera, bg: jnp.ndarray, *,
           config: RasterConfig = RasterConfig(),
           active_sh_degree: int | None = None,
           scaling_modifier: float = 1.0,
           use_trained_exp: bool = False,
           alive: jnp.ndarray | None = None,
           mean2d_offset: jnp.ndarray | None = None,
           impl: str | None = None) -> RenderOutput:
    """Render one view. ``impl`` (defaulting to ``config.impl``) selects
    the compositor: "tiled" (XLA tile pipeline), "pallas" (TPU kernel with
    custom VJP), "pallas_jvp" (TPU kernel with custom JVP, for LM J·v),
    "auto" (pallas on TPU else tiled), or "ref" (dense golden
    rasterizer)."""
    if impl is None:
        impl = config.impl
    if active_sh_degree is None:
        active_sh_degree = params.sh_degree

    splats = preprocess(params, camera, active_sh_degree=active_sh_degree,
                        antialiasing=config.antialiasing,
                        scaling_modifier=scaling_modifier, alive=alive,
                        mean2d_offset=mean2d_offset)

    if impl == "ref":
        out = rasterize_ref(splats, camera.height, camera.width, bg)
        out.setdefault("n_duplicates", jnp.int32(0))
        out.setdefault("overflow", jnp.int32(0))
        out.setdefault("max_tile_load", jnp.int32(0))
    elif resolve_impl(impl) in ("pallas", "pallas_jvp"):
        from gslm_tpu.ops.rasterize_pallas import rasterize_pallas
        out = rasterize_pallas(splats, camera.height, camera.width, bg,
                               config,
                               interpret=jax.default_backend() != "tpu",
                               mode="jvp" if impl == "pallas_jvp" else "vjp")
    else:
        out = rasterize_tiled(splats, camera.height, camera.width, bg, config)

    image = out["render"]
    if use_trained_exp:
        image = apply_exposure(image, params.exposure[camera.exposure_idx])
    image = jnp.clip(image, 0.0, 1.0)

    return RenderOutput(render=image, invdepth=out["invdepth"],
                        radii=splats.radius, visibility=splats.radius > 0,
                        n_duplicates=jnp.asarray(out["n_duplicates"], jnp.int32),
                        overflow=jnp.asarray(out["overflow"], jnp.int32),
                        max_tile_load=jnp.asarray(out["max_tile_load"], jnp.int32))


def batch_render(params: GaussianParams, cameras: CameraBatch, bg: jnp.ndarray,
                 *, config: RasterConfig = RasterConfig(),
                 active_sh_degree: int | None = None,
                 scaling_modifier: float = 1.0,
                 use_trained_exp: bool = False,
                 alive: jnp.ndarray | None = None,
                 mean2d_offset: jnp.ndarray | None = None,
                 impl: str | None = None) -> RenderOutput:
    """Render a padded camera batch as ONE fused raster problem.

    The TPU analog of the reference's fused BatchGaussianRasterizer launch
    (batch_render.py:8-135): per-Gaussian preprocess is vmapped over views
    (pure elementwise), then the B per-view tile grids are stacked
    vertically into a single virtual canvas — view v's splats get their
    pixel-y and tile-row coordinates offset by v*H_tiles, making tile ids
    view-disjoint, so ONE duplicate/sort/ranges pass and ONE compositor
    launch cover the whole batch. (A naive ``vmap(render)`` instead puts
    ``jnp.repeat``/sort under vmap, which XLA lowers to per-row gathers —
    measured 4x slower at 2x540p.) Within each tile the global depth-rank
    order restricted to that view's Gaussians is exactly the per-view
    depth order, so compositing semantics are unchanged.

    ``mean2d_offset`` is deliberately **unbatched** ((P, 2)): it broadcasts
    over views, so its cotangent sums over views — exactly the accumulated
    viewspace-gradient statistic densification needs (reference
    batch_render.py:120-133 + gaussian_model.py:561-563).

    Output fields gain a leading B axis; ``radii`` is (B, P) — reduce with
    max for the reference's ``max_radii`` / any for ``visibility_filter``.
    """
    from gslm_tpu.ops.projection import TILE, Splats2D
    from gslm_tpu.ops.rasterize_tiled import _cdiv

    if impl is None:
        impl = config.impl
    if active_sh_degree is None:
        active_sh_degree = params.sh_degree

    batched_cam = Camera(
        world_view=cameras.world_view, full_proj=cameras.full_proj,
        campos=cameras.campos, tanfovx=cameras.tanfovx,
        tanfovy=cameras.tanfovy, exposure_idx=cameras.exposure_idx,
        height=cameras.height, width=cameras.width)

    if resolve_impl(impl) == "ref":
        # dense golden path: per-view loop is fine (it has no sort stage)
        fn = functools.partial(render, config=config,
                               active_sh_degree=active_sh_degree,
                               scaling_modifier=scaling_modifier,
                               use_trained_exp=use_trained_exp, impl=impl)

        def one_view(camera):
            return fn(params, camera, bg, alive=alive,
                      mean2d_offset=mean2d_offset)

        return jax.vmap(one_view)(batched_cam)

    H, W = cameras.height, cameras.width
    B = cameras.world_view.shape[0]
    P = params.xyz.shape[0]
    nty = _cdiv(H, TILE)

    def pre_view(camera):
        return preprocess(params, camera, active_sh_degree=active_sh_degree,
                          antialiasing=config.antialiasing,
                          scaling_modifier=scaling_modifier, alive=alive,
                          mean2d_offset=mean2d_offset)

    sv = jax.vmap(pre_view)(batched_cam)            # (B, P, ...) splats

    # stack the B view canvases vertically: only TILE-row rects shift (the
    # compositors wrap pixel rows modulo view_rows, so splat coordinates
    # stay view-local and the alpha math is bitwise identical to
    # single-view renders)
    voff = jnp.arange(B, dtype=jnp.int32)[:, None]
    rect_min = jnp.stack([sv.rect_min[..., 0],
                          sv.rect_min[..., 1] + voff * nty], axis=-1)
    rect_max = jnp.stack([sv.rect_max[..., 0],
                          sv.rect_max[..., 1] + voff * nty], axis=-1)

    def flat(x):
        return x.reshape((B * P,) + x.shape[2:])

    splats = Splats2D(
        mean2d=flat(sv.mean2d), conic=flat(sv.conic), color=flat(sv.color),
        opacity=flat(sv.opacity), depth=flat(sv.depth),
        invdepth=flat(sv.invdepth), radius=flat(sv.radius),
        rect_min=flat(rect_min), rect_max=flat(rect_max),
        tile_count=flat(sv.tile_count), visible=flat(sv.visible))

    stacked_h = B * nty * TILE
    if resolve_impl(impl) in ("pallas", "pallas_jvp"):
        from gslm_tpu.ops.rasterize_pallas import rasterize_pallas
        out = rasterize_pallas(splats, stacked_h, W, bg, config,
                               interpret=jax.default_backend() != "tpu",
                               mode="jvp" if impl == "pallas_jvp" else "vjp",
                               view_rows=nty)
    else:
        out = rasterize_tiled(splats, stacked_h, W, bg, config,
                              view_rows=nty)

    canvas = out["render"].reshape(3, B, nty * TILE, -1)[:, :, :H, :W]
    image = jnp.moveaxis(canvas, 1, 0)              # (B, 3, H, W)
    invd = jnp.moveaxis(
        out["invdepth"].reshape(1, B, nty * TILE, -1)[:, :, :H, :W], 1, 0)
    if use_trained_exp:
        image = jax.vmap(apply_exposure)(
            image, params.exposure[cameras.exposure_idx])
    image = jnp.clip(image, 0.0, 1.0)

    return RenderOutput(
        render=image, invdepth=invd, radii=sv.radius,
        visibility=sv.radius > 0,
        n_duplicates=jnp.asarray(out["n_duplicates"], jnp.int32),
        overflow=jnp.asarray(out["overflow"], jnp.int32),
        max_tile_load=jnp.asarray(out["max_tile_load"], jnp.int32))


def overflow_probe(params: GaussianParams, cameras: CameraBatch, *,
                   config: RasterConfig = RasterConfig(),
                   active_sh_degree: int | None = None,
                   alive: jnp.ndarray | None = None,
                   per_view: bool = False, n_model: int = 1):
    """P-level duplicate-count probe: would rendering this camera batch
    overflow ``config``'s record capacities?

    Runs only the per-Gaussian preprocess (+ the cull cell masks when
    culling is on) — no duplication, sort, or compositing — so it costs
    O(B·P) elementwise work, cheap enough to gate every LM outer step.
    The reference instead resizes its CUDA buffers on demand
    (rasterizer re-allocates per launch); XLA capacities are static, so
    trainers probe-then-grow (train.py / train_lm.py retry loops).

    ``per_view=False``: dict(n_aabb, n_live, overflow) summed over views;
    overflow mirrors the rasterizer's flag (live total over the effective
    capacity OR AABB total over dup_capacity). NOTE: capacities bound one
    RENDER, so when views are rendered in micro-batch chunks the caller
    must compare per-chunk sums, not the whole-window sum — use
    ``per_view=True``, which returns (B,) arrays instead, plus, when
    ``n_model`` > 1, ``band_aabb`` (B, M) per-tile-row-band AABB record
    counts (what each model shard's band-local stream pays; the reference
    has no analog — its P axis is single-GPU) and, when
    ``config.mp_route_capacity`` > 0, ``route_counts`` (B, M_src, M_dst)
    routed-record counts per source shard block and destination band."""
    from gslm_tpu.ops.rasterize_tiled import _cdiv, _cell_masks

    if active_sh_degree is None:
        active_sh_degree = params.sh_degree
    batched_cam = Camera(
        world_view=cameras.world_view, full_proj=cameras.full_proj,
        campos=cameras.campos, tanfovx=cameras.tanfovx,
        tanfovy=cameras.tanfovy, exposure_idx=cameras.exposure_idx,
        height=cameras.height, width=cameras.width)
    from gslm_tpu.ops.projection import TILE
    ntx = _cdiv(cameras.width, TILE)
    nty = _cdiv(cameras.height, TILE)
    bh = _cdiv(nty, n_model)
    P = params.xyz.shape[0]

    def one_view(camera):
        from gslm_tpu.ops.projection import TILE as _T
        sp = preprocess(params, camera, active_sh_degree=active_sh_degree,
                        antialiasing=config.antialiasing, alive=alive)
        BK = config.bucket
        if BK > 1:
            # bucket-binned raster: capacities count BUCKET records
            # (rasterize_pallas bins stages 1-3 at BK x BK-tile granularity)
            vis = sp.tile_count > 0
            bx0 = sp.rect_min[:, 0] // BK
            by0 = sp.rect_min[:, 1] // BK
            bx1 = -(-sp.rect_max[:, 0] // BK)
            by1 = -(-sp.rect_max[:, 1] // BK)
            spb = sp.replace(
                rect_min=jnp.stack([bx0, by0], axis=-1),
                rect_max=jnp.stack([bx1, by1], axis=-1),
                tile_count=jnp.where(vis, (bx1 - bx0) * (by1 - by0), 0))
            n_aabb = jnp.sum(spb.tile_count)
            if config.cull:
                cwb = max(_cdiv(_cdiv(ntx, BK), 8).bit_length(), 1)
                *_, nlive = _cell_masks(spb, _cdiv(nty, BK), cwb,
                                        tile_px=_T * BK)
                n_live = jnp.sum(nlive)
            else:
                n_live = n_aabb
        else:
            n_aabb = jnp.sum(sp.tile_count)
            if config.cull:
                cwb = max(_cdiv(ntx, 8).bit_length(), 1)
                *_, nlive = _cell_masks(sp, nty, cwb)
                n_live = jnp.sum(nlive)
            else:
                n_live = n_aabb
        out = {"n_aabb": n_aabb, "n_live": n_live}
        if n_model > 1:
            w = jnp.maximum(sp.rect_max[:, 0] - sp.rect_min[:, 0], 0)
            vis = sp.tile_count > 0
            bands, routed = [], []
            for d in range(n_model):
                rows = (jnp.clip(sp.rect_max[:, 1], d * bh, (d + 1) * bh)
                        - jnp.clip(sp.rect_min[:, 1], d * bh, (d + 1) * bh))
                bands.append(jnp.sum(jnp.where(vis, w * rows, 0)))
                if config.mp_route_capacity > 0:
                    ind = (vis & (rows > 0)).astype(jnp.int32)
                    routed.append(ind.reshape(n_model, P // n_model)
                                  .sum(axis=1))
            out["band_aabb"] = jnp.stack(bands)             # (M,)
            if config.mp_route_capacity > 0:
                out["route_counts"] = jnp.stack(routed, 1)  # (M_src, M_dst)
        return out

    out = jax.vmap(one_view)(batched_cam)
    if per_view:
        return out
    n_aabb, n_live = jnp.sum(out["n_aabb"]), jnp.sum(out["n_live"])
    over = ((n_live > config.eff_capacity())
            | (n_aabb > config.dup_capacity)).astype(jnp.int32)
    return {"n_aabb": n_aabb, "n_live": n_live, "overflow": over}


# scaling_modifier stays dynamic (traced) so the viewer's slider doesn't
# trigger a recompile per value.
_STATIC = ("config", "active_sh_degree", "use_trained_exp", "impl")

# Jitted entry points (compile once per (shape, static-config) signature).
render_jit = jax.jit(render, static_argnames=_STATIC)
batch_render_jit = jax.jit(batch_render, static_argnames=_STATIC)
overflow_probe_jit = jax.jit(
    overflow_probe,
    static_argnames=("config", "active_sh_degree", "per_view", "n_model"))
