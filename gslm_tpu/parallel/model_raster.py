"""Model-parallel raster path: Gaussians sharded, tiles banded.

The reference keeps the whole P axis resident on one GPU
(scene/gaussian_model.py:256-266); this module supplies the multi-chip
model-parallel decomposition of the raster pipeline (SURVEY §5.7/§7,
BASELINE.json north star) as per-device functions meant to run inside a
``shard_map`` over a ("data", "model") mesh:

  1. each device preprocesses only its OWN Gaussian shard (P/M rows) for
     its own view shard (B/D views) — the parameter-heavy stage splits
     both ways and parameters are never replicated;
  2. the projected splats (screen-space activations: ~15 f32/Gaussian,
     orders of magnitude lighter than the parameter rows) are
     ``all_gather``-ed over the "model" axis; XLA transposes this to a
     psum_scatter of the cotangents in the backward pass, i.e. each shard
     receives exactly its own Gaussians' gradients, reduced over all tile
     owners, for free;
  3. every model shard owns a horizontal BAND of tile rows of every view
     (rows [m*band_rows, (m+1)*band_rows)); it clips the gathered rects to
     its band and runs the ordinary duplicate→sort→composite pipeline on a
     band-local canvas — the sort/compositor work divides M-ways (and
     D-ways over views);
  4. band images concatenate back to full frames through the shard_map
     out_specs (rows axis sharded over "model").

Band-local coordinates are exact: the pixel-space shift ``y -= band_lo*16``
subtracts a representable integer from an f32 whose ulp divides 1, so the
alpha math is bitwise identical to the single-device render. (The only
permitted deviation is depth-tie ordering: gathered Gaussians are
shard-major, so equal-depth splats may swap — measure-zero for real
scenes.)

Two exchange strategies (``RasterConfig.mp_route_capacity``):

* ``0`` — all_gather every shard's projected splats (fine at small P:
  ~8 MB over ICI at 131k; O(P) per-device memory and preprocess-dup work).
* ``R > 0`` — record-level routing (SURVEY §2.3 "all-to-all by tile
  ownership"): each shard compacts, per destination band, only its splats
  whose tile rect intersects that band and ships them in ONE all_to_all of
  (M, R, fields); every other shard's non-band splats never land on this
  device. Per-device exchange bytes drop from P·f to M·R·f (R is a static
  per-(src,dst) capacity; the routed count is band-local, ~P/M + boundary
  stragglers, so R ≈ 2·Pl/M has slack). The backward transposes
  automatically: all_to_all is self-transposing and the compaction gather
  becomes a scatter-add into the source shard's rows — gradients stay
  owner-resident, parameters are never replicated in either mode.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from gslm_tpu.models.cameras import Camera, CameraBatch
from gslm_tpu.models.gaussians import GaussianParams
from gslm_tpu.ops.projection import TILE, Splats2D, preprocess
from gslm_tpu.ops.rasterize_tiled import RasterConfig, _cdiv


_EXCHANGE_LOGGED: set = set()


def band_rows(height: int, n_model: int) -> int:
    """Tile rows per model shard (static)."""
    return _cdiv(_cdiv(height, TILE), n_model)


def exchange_bytes(Bd: int, Pl: int, n_model: int,
                   route_capacity: int) -> int:
    """Per-device splat-exchange traffic (bytes) of the two strategies:
    all_gather ships Bd·(M·Pl) full splat rows; routing ships M·R routed
    records. Logged at trace time so runs record both paths' cost."""
    splat_row = (2 + 3 + 3 + 1 + 1 + 1) * 4 + (1 + 2 + 2 + 1 + 1) * 4
    record_row = (2 + 3 + 3 + 1 + 1 + 1) * 4 + 4 * 4 + 4 + 4
    if route_capacity > 0:
        return n_model * route_capacity * record_row
    return Bd * n_model * Pl * splat_row


def _route_band_splats(sv_local, R: int, bh: int, n_model: int,
                       model_axis: str, band_lo):
    """Record-level splat routing (SURVEY §2.3 "all-to-all by tile
    ownership"): ship each local (view, splat) record only to the model
    shards whose tile-row band its rect intersects.

    For each destination band d the local survivors are compacted into a
    fixed-capacity row block via cumsum positions + one scatter; a single
    ``all_to_all`` then exchanges the (M, R, fields) blocks, so this device
    receives ≤ M·R records instead of the P-row gather. Records straddling
    a band boundary go to BOTH owners (their gradients sum over
    destinations through the gather transpose, which is exactly the band
    partials' sum). Invalid rows carry opacity 0 / empty rects → the
    duplicate stage drops them, and a dropped record's cotangents are
    identically zero, so the slack rows never touch gradients.

    Returns (band-local flat Splats2D of length M·R, overflow flag (this
    sender's worst per-destination count vs R; pmax'd by the caller's
    diags reduction)). The reference has no analog — its whole P axis is
    resident on one GPU (scene/gaussian_model.py:256-266)."""
    Bd, Pl = sv_local.mean2d.shape[:2]
    M = n_model
    N = Bd * Pl

    fl = jax.tree.map(lambda x: x.reshape((N,) + x.shape[2:]), sv_local)
    viewid = jnp.arange(N, dtype=jnp.int32) // Pl
    vis = fl.visible & (fl.tile_count > 0)
    iota_n = jnp.arange(N, dtype=jnp.int32)

    idx_rows, counts = [], []
    for d in range(M):
        m_d = vis & (fl.rect_max[:, 1] > d * bh) \
            & (fl.rect_min[:, 1] < (d + 1) * bh)
        pos = jnp.where(m_d, jnp.cumsum(m_d.astype(jnp.int32)) - 1, R)
        idx_rows.append(jnp.full((R,), -1, jnp.int32)
                        .at[pos].set(iota_n, mode="drop"))
        counts.append(jnp.sum(m_d.astype(jnp.int32)))
    idx = jnp.stack(idx_rows)                     # (M, R)
    counts = jnp.stack(counts)                    # (M,)
    valid = idx >= 0
    g = jnp.maximum(idx, 0)

    send = {
        "mean2d": fl.mean2d[g], "conic": fl.conic[g], "color": fl.color[g],
        "opacity": jnp.where(valid, fl.opacity[g], 0.0),
        "depth": jnp.where(valid, fl.depth[g], jnp.inf),
        "invdepth": fl.invdepth[g],
        "rect": jnp.where(valid[..., None], jnp.concatenate(
            [fl.rect_min[g], fl.rect_max[g]], axis=-1), 0),
        "view": jnp.where(valid, viewid[g], 0),
        "valid": valid.astype(jnp.int32),
    }
    rx = jax.tree.map(
        lambda x: jax.lax.all_to_all(
            x.reshape((M * R,) + x.shape[2:]), model_axis,
            split_axis=0, concat_axis=0, tiled=True),
        send)                                     # (M*R, ...): shard-major

    x0r, y0r = rx["rect"][:, 0], rx["rect"][:, 1]
    x1r, y1r = rx["rect"][:, 2], rx["rect"][:, 3]
    y0b = jnp.clip(y0r, band_lo, band_lo + bh) - band_lo
    y1b = jnp.clip(y1r, band_lo, band_lo + bh) - band_lo
    tc = jnp.maximum(x1r - x0r, 0) * jnp.maximum(y1b - y0b, 0)
    viz = (rx["valid"] > 0) & (tc > 0)
    yshift = (band_lo * TILE).astype(jnp.float32)
    mean2d = jnp.stack([rx["mean2d"][:, 0], rx["mean2d"][:, 1] - yshift], -1)
    v = rx["view"]
    splats = Splats2D(
        mean2d=mean2d, conic=rx["conic"], color=rx["color"],
        opacity=jnp.where(viz, rx["opacity"], 0.0),
        depth=jnp.where(viz, rx["depth"], jnp.inf),
        invdepth=rx["invdepth"],
        radius=jnp.zeros((M * R,), sv_local.radius.dtype),
        rect_min=jnp.stack([x0r, y0b + v * bh], -1),
        rect_max=jnp.stack([x1r, y1b + v * bh], -1),
        tile_count=jnp.where(viz, tc, 0), visible=viz)
    return splats, (jnp.max(counts) > R).astype(jnp.int32)


def mp_render_views(params_local: GaussianParams, cameras: CameraBatch,
                    bg: jnp.ndarray, *, config: RasterConfig,
                    n_model: int, model_axis: str = "model",
                    active_sh_degree: int | None = None,
                    use_trained_exp: bool = False,
                    alive_local: jnp.ndarray | None = None,
                    mean2d_offset_local: jnp.ndarray | None = None,
                    impl: str | None = None):
    """Per-device body: render this device's view shard restricted to this
    device's tile-row band, from model-sharded parameters.

    Returns (band_images (Bd, 3, band_rows*TILE, W), band_invdepth,
    radii_local (Bd, Pl), diagnostics dict). Must run inside shard_map with
    ``model_axis`` in scope; cameras are this device's data shard
    (replicated over the model axis).
    """
    from gslm_tpu.renderer import apply_exposure, resolve_impl

    if impl is None:
        impl = config.impl
    if active_sh_degree is None:
        active_sh_degree = params_local.sh_degree

    H, W = cameras.height, cameras.width
    Bd = cameras.world_view.shape[0]
    nty = _cdiv(H, TILE)
    ntx = _cdiv(W, TILE)
    bh = band_rows(H, n_model)
    m = jax.lax.axis_index(model_axis)
    band_lo = m * bh                              # first tile row of my band

    batched_cam = Camera(
        world_view=cameras.world_view, full_proj=cameras.full_proj,
        campos=cameras.campos, tanfovx=cameras.tanfovx,
        tanfovy=cameras.tanfovy, exposure_idx=cameras.exposure_idx,
        height=H, width=W)

    def pre_view(camera):
        return preprocess(params_local, camera,
                          active_sh_degree=active_sh_degree,
                          antialiasing=config.antialiasing,
                          alive=alive_local,
                          mean2d_offset=mean2d_offset_local)

    sv_local = jax.vmap(pre_view)(batched_cam)    # (Bd, Pl, ...)
    radii_local = sv_local.radius                 # for densify/visibility

    Pl = params_local.xyz.shape[0]
    log_key = (Bd, Pl, n_model, config.mp_route_capacity)
    if log_key not in _EXCHANGE_LOGGED:      # once per shape, not per trace
        _EXCHANGE_LOGGED.add(log_key)
        print(f"[mp raster] splat exchange: "
              f"{'route' if config.mp_route_capacity else 'all_gather'} "
              f"{exchange_bytes(Bd, Pl, n_model, config.mp_route_capacity)} "
              f"B/device (gather would be "
              f"{exchange_bytes(Bd, Pl, n_model, 0)} B)")
    route_overflow = jnp.int32(0)
    if config.mp_route_capacity > 0:
        splats, route_overflow = _route_band_splats(
            sv_local, config.mp_route_capacity, bh, n_model, model_axis,
            band_lo)
    else:
        # ---- gather splats over the model axis (activations, not params)
        sv = jax.tree.map(
            lambda x: jax.lax.all_gather(x, model_axis, axis=1, tiled=True),
            sv_local)                             # (Bd, P, ...)

        # ---- clip rects to my band; shift to band-local coordinates -----
        x0 = sv.rect_min[..., 0]
        y0 = jnp.clip(sv.rect_min[..., 1], band_lo, band_lo + bh) - band_lo
        x1 = sv.rect_max[..., 0]
        y1 = jnp.clip(sv.rect_max[..., 1], band_lo, band_lo + bh) - band_lo
        tile_count = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
        visible = sv.visible & (tile_count > 0)
        yshift = (band_lo * TILE).astype(jnp.float32)
        mean2d = jnp.stack([sv.mean2d[..., 0], sv.mean2d[..., 1] - yshift],
                           -1)

        # ---- stack the Bd per-view bands vertically (renderer.batch_render
        # pattern: view-disjoint tile rows, one sort) ----
        voff = jnp.arange(Bd, dtype=jnp.int32)[:, None]
        rect_min = jnp.stack([x0, y0 + voff * bh], axis=-1)
        rect_max = jnp.stack([x1, y1 + voff * bh], axis=-1)

        def flat(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        splats = Splats2D(
            mean2d=flat(mean2d), conic=flat(sv.conic), color=flat(sv.color),
            opacity=flat(jnp.where(visible, sv.opacity, 0.0)),
            depth=flat(jnp.where(visible, sv.depth, jnp.inf)),
            invdepth=flat(sv.invdepth), radius=flat(sv.radius),
            rect_min=flat(rect_min), rect_max=flat(rect_max),
            tile_count=flat(jnp.where(visible, tile_count, 0)),
            visible=flat(visible))

    stacked_h = Bd * bh * TILE
    if resolve_impl(impl) in ("pallas", "pallas_jvp"):
        from gslm_tpu.ops.rasterize_pallas import rasterize_pallas
        out = rasterize_pallas(splats, stacked_h, ntx * TILE, bg, config,
                               interpret=jax.default_backend() != "tpu",
                               mode="jvp" if impl == "pallas_jvp" else "vjp",
                               view_rows=bh)
    else:
        from gslm_tpu.ops.rasterize_tiled import rasterize_tiled
        out = rasterize_tiled(splats, stacked_h, ntx * TILE, bg, config,
                              view_rows=bh)

    bandH = bh * TILE
    image = jnp.moveaxis(
        out["render"].reshape(3, Bd, bandH, -1)[..., :W], 1, 0)
    invd = jnp.moveaxis(
        out["invdepth"].reshape(1, Bd, bandH, -1)[..., :W], 1, 0)
    if use_trained_exp:
        image = jax.vmap(apply_exposure)(
            image, params_local.exposure[cameras.exposure_idx])
    image = jnp.clip(image, 0.0, 1.0)

    diags = {"n_duplicates": out["n_duplicates"],
             "overflow": jnp.maximum(jnp.asarray(out["overflow"], jnp.int32),
                                     route_overflow),
             "max_tile_load": out["max_tile_load"]}
    return image, invd, radii_local, diags


def halo_exchange_rows(x: jnp.ndarray, halo: int, n_model: int,
                       model_axis: str) -> jnp.ndarray:
    """Extend band images (..., bandH, W) with ``halo`` rows from the
    vertical neighbors via ppermute; devices at the global top/bottom
    receive zeros (ppermute's unpaired-destination semantics) — exactly
    the zero-'SAME' padding the windowed SSIM applies at image edges, so
    band-local SSIM maps match the single-device map bitwise."""
    top = jax.lax.ppermute(
        x[..., -halo:, :], model_axis,
        [(i, i + 1) for i in range(n_model - 1)])     # from m-1's bottom
    bot = jax.lax.ppermute(
        x[..., :halo, :], model_axis,
        [(i, i - 1) for i in range(1, n_model)])      # from m+1's top
    return jnp.concatenate([top, x, bot], axis=-2)


def mp_scalar_training_loss(params_local: GaussianParams,
                            cameras: CameraBatch, bg: jnp.ndarray, *,
                            config: RasterConfig, n_model: int,
                            lambda_dssim: float = 0.2,
                            use_trained_exp: bool = False,
                            active_sh_degree: int | None = None,
                            alive_local: jnp.ndarray | None = None,
                            mean2d_offset_local: jnp.ndarray | None = None,
                            data_axis: str = "data",
                            model_axis: str = "model"):
    """Band-local first-order loss, exactly equal (up to psum ordering) to
    scalar_training_loss on the full frames. Returns (loss, info) with
    info["radii_local"] (Bd, Pl) and band diagnostics.

    The 11x11 SSIM windows straddle band boundaries; a 5-row halo exchange
    (ppermute over the model axis) supplies the neighbor rows, and rows at
    or past the canvas height are zeroed to reproduce the single-device
    crop-then-zero-pad semantics."""
    from gslm_tpu.ops.ssim import ssim_map

    H = cameras.height
    image, invd, radii_local, diags = mp_render_views(
        params_local, cameras, bg, config=config, n_model=n_model,
        model_axis=model_axis, active_sh_degree=active_sh_degree,
        use_trained_exp=use_trained_exp, alive_local=alive_local,
        mean2d_offset_local=mean2d_offset_local)

    bh_px = band_rows(H, n_model) * TILE
    m = jax.lax.axis_index(model_axis)
    row_in_canvas = (m * bh_px + jnp.arange(bh_px)) < H
    amask = band_slice(cameras.alpha_mask, H, n_model, model_axis)
    raw_image = image
    image = image * amask * row_in_canvas[:, None].astype(image.dtype)
    gt = band_slice(cameras.gt_image, H, n_model, model_axis)
    valid = band_slice(cameras.pixel_valid(), H, n_model, model_axis)

    npix_local = 3.0 * jnp.sum(valid, axis=(1, 2, 3))           # (Bd,)
    npix = jnp.maximum(
        jax.lax.psum(jax.lax.stop_gradient(npix_local), model_axis), 1.0)
    l1_sum_local = jnp.sum(jnp.abs(image - gt) * valid, axis=(1, 2, 3))

    halo = 5                                        # (11//2) window radius
    ext1 = halo_exchange_rows(image, halo, n_model, model_axis)
    ext2 = halo_exchange_rows(gt, halo, n_model, model_axis)
    smap = ssim_map(ext1, ext2)[..., halo:-halo, :] * valid
    ssim_sum_local = jnp.sum(smap, axis=(1, 2, 3))

    # GRADIENT CONTRACT: the returned loss is this device's LOCAL partial
    # of the global objective (constants dropped). Differentiating the
    # local partial is the correct SPMD pattern — cross-device terms enter
    # the gradient through the collective transposes (all_gather →
    # psum_scatter, ppermute → reverse ppermute). Do NOT psum inside the
    # differentiated region: each device's unit cotangent seed would then
    # be summed by the psum transpose, inflating every gradient by the
    # axis size (Adam's scale invariance masks this for parameters but
    # densification stats see the raw 2x/4x).
    lc = ((1.0 - lambda_dssim) * l1_sum_local
          - lambda_dssim * ssim_sum_local) / npix            # (Bd,)
    loss_local = jnp.mean(lc) + lambda_dssim / n_model

    # replicated VALUES for reporting (stop-gradient psums)
    lc_g = jax.lax.psum(jax.lax.stop_gradient(lc), model_axis)
    loss_value = jnp.mean(lc_g) + lambda_dssim
    l1 = jax.lax.psum(jax.lax.stop_gradient(l1_sum_local),
                      model_axis) / npix
    ssim_mean = jax.lax.psum(jax.lax.stop_gradient(ssim_sum_local),
                             model_axis) / npix
    info = {"l1": l1, "ssim": ssim_mean, "loss": loss_value,
            "radii_local": radii_local,
            "band_render": image,
            # pre-alpha-mask render (rows past the canvas zeroed) for the
            # PSNR metric: the single-device metric uses the raw render
            "band_render_raw": raw_image
            * row_in_canvas[:, None].astype(image.dtype),
            "band_invdepth": invd, "diags": diags}
    return loss_local, info


def mp_batch_residuals(params_local: GaussianParams, cameras: CameraBatch,
                       bg: jnp.ndarray, *, config: RasterConfig,
                       n_model: int, lambda_dssim: float = 0.2,
                       disable_ssim: bool = False,
                       use_trained_exp: bool = False,
                       active_sh_degree: int | None = None,
                       alive_local: jnp.ndarray | None = None,
                       model_axis: str = "model", impl: str | None = None):
    """Band-local residual vector from model-sharded parameters: each
    device's ResidualState holds its tile-row band of every view, so the
    distributed residual is exactly the single-device one re-laid-out
    (solver/residuals.py weighting contract; the squared-norm psums over
    ("data", model_axis) happen in the LM operators, NOT here — no psum
    may sit inside the differentiated region, see mp_scalar_training_loss).
    """
    from gslm_tpu.solver.residuals import ResidualState

    H = cameras.height
    image, invd, radii_local, diags = mp_render_views(
        params_local, cameras, bg, config=config, n_model=n_model,
        model_axis=model_axis, active_sh_degree=active_sh_degree,
        use_trained_exp=use_trained_exp, alive_local=alive_local, impl=impl)

    bh_px = band_rows(H, n_model) * TILE
    m = jax.lax.axis_index(model_axis)
    row_in_canvas = (m * bh_px + jnp.arange(bh_px)) < H
    amask = band_slice(cameras.alpha_mask, H, n_model, model_axis)
    image = image * amask * row_in_canvas[:, None].astype(image.dtype)
    gt = band_slice(cameras.gt_image, H, n_model, model_axis)
    valid = band_slice(cameras.pixel_valid(), H, n_model, model_axis)

    if disable_ssim:
        r = (image - gt) * valid
        return ResidualState(l1=r, ssim=r)

    from gslm_tpu.ops.ssim import ssim_map
    n = 3.0 * cameras.heights.astype(jnp.float32) \
        * cameras.widths.astype(jnp.float32)
    w_l1 = jnp.sqrt((1.0 - lambda_dssim) / n)[:, None, None, None]
    w_ssim = jnp.sqrt(lambda_dssim / n)[:, None, None, None]
    halo = 5
    ext1 = halo_exchange_rows(image, halo, n_model, model_axis)
    ext2 = halo_exchange_rows(gt, halo, n_model, model_axis)
    smap = ssim_map(ext1, ext2)[..., halo:-halo, :]
    r_l1 = w_l1 * jnp.sqrt(jnp.abs(image - gt) + 1e-6) * valid
    r_ssim = w_ssim * jnp.sqrt(jnp.abs(1.0 - smap) + 1e-6) * valid
    return ResidualState(l1=r_l1, ssim=r_ssim)


def mp_lm_outer_step(params_local, alive_local, window: CameraBatch,
                     val: CameraBatch, bg, win_valid=None, val_valid=None,
                     *, rcfg: RasterConfig, lm,
                     active_sh_degree: int, use_exp: bool, n_model: int,
                     lambda_dssim: float = 0.2, data_axis: str = "data",
                     model_axis: str = "model"):
    """Model-parallel LM outer step body (run inside shard_map over
    (data, model)): Gaussians sharded, residuals band+view sharded, the
    whole CGLS recurrence and line search distributed — parameter dots
    psum over the model axis, residual dots over both axes, Jᵀ·u
    owner-resident via the all_gather transpose (train_lm.lm_outer_step
    anatomy, reference train_jvp.py:221-288)."""
    from gslm_tpu.models import gaussians as G
    from gslm_tpu.renderer import resolve_impl
    from gslm_tpu.solver.cg import cgls_damped_unrolled
    from gslm_tpu.solver.operators import LMOperators

    # no depth residual in LM (reference training_loss.py:57) — trim the
    # invdepth cotangents from the Pallas backward
    rcfg = rcfg.replace(depth_grad=False)

    def weighted(r, w):
        if w is None:
            return r
        return jax.tree.map(lambda x: x * w[:, None, None, None], r)

    def res_of(cfg):
        def f(p):
            r = mp_batch_residuals(
                p, window, bg, config=cfg, n_model=n_model,
                lambda_dssim=lambda_dssim, disable_ssim=lm.disable_ssim,
                use_trained_exp=use_exp, active_sh_degree=active_sh_degree,
                alive_local=alive_local, model_axis=model_axis)
            return weighted(r, win_valid)
        return f

    residual_fn = res_of(rcfg)
    residual_fn_jvp = None
    if resolve_impl(rcfg.impl) == "pallas":
        residual_fn_jvp = res_of(rcfg.replace(impl="pallas_jvp"))

    def val_loss(p):
        r = mp_batch_residuals(
            p, val, bg, config=rcfg, n_model=n_model,
            lambda_dssim=lambda_dssim, disable_ssim=lm.disable_ssim,
            use_trained_exp=use_exp, active_sh_degree=active_sh_degree,
            alive_local=alive_local, model_axis=model_axis)
        r = weighted(r, val_valid)
        return jax.lax.psum(r.loss_scalar, (data_axis, model_axis))

    group_mask = G.param_group_mask(mask_xyz=lm.mask_xyz)
    ops = LMOperators(residual_fn, params_local, group_mask=group_mask,
                      alive=alive_local, residual_fn_jvp=residual_fn_jvp,
                      axis_name=data_axis, param_axis=model_axis)
    start_loss = ops.loss_scalar

    b = jax.tree.map(jnp.negative, ops.residual)
    damp = lm.damp_dict()
    s = cgls_damped_unrolled(
        ops.matvec, ops.matvec_T, ops.dot, ops.saxpy,
        LMOperators.dampmul_for(damp), b, ops.get_initial_solution(), damp,
        max_iter=lm.cg_max_iter, restart_iter=lm.cg_restart_iter,
        check_divergence=lm.check_divergence)

    alphas = jnp.asarray([lm.line_search_alpha0 * (0.5 ** i)
                          for i in range(lm.line_search_steps + 1)])
    losses = jax.lax.map(lambda a: val_loss(G.saxpy(a, s, params_local)),
                         alphas)
    best = jnp.argmin(losses)
    best_alpha = alphas[best]
    new_params = G.saxpy(best_alpha, s, params_local)
    info = {"start_loss": start_loss, "val_losses": losses,
            "best_alpha": best_alpha, "best_val_loss": losses[best]}
    return new_params, info


def mp_rebalance(params_l, aux_l, opt_l, *, n_model: int,
                 donate_cap: int = 256, model_axis: str = "model"):
    """Rebalance alive Gaussians across model shards after densification.

    Clone/split allocate slots shard-locally, so shards drift apart and a
    full shard starts dropping densification requests while others have
    room. This moves up to ``donate_cap`` rows per shard from overfull
    (> ceil(total/M) alive) to underfull shards in one collective round:

      1. all_gather per-shard alive counts; donors pick their
         highest-index alive rows (up to their excess), assign them
         donor-major global ordinals;
      2. one all_gather ships the donated parameter + Adam-moment rows
         (optimizer state travels with the row — the reference's
         optimizer surgery, gaussian_model.py:439-497, as gather/scatter);
      3. receivers claim disjoint ordinal ranges (prefix sums of the
         deficits — deterministic, no negotiation) and scatter the rows
         into their lowest free slots; donors kill exactly the claimed
         ordinals (the union of claim ranges is [0, total_claims)).

    Rendering is slot/shard-permutation invariant, so the model is
    unchanged up to depth-sort tie order. Densification stats of moved
    rows reset (they are per-slot accumulators).

    Run inside shard_map over the model axis (all state model-sharded);
    returns (params_l, aux_l, opt_l, moved int32).
    """
    from gslm_tpu.densify import PER_GAUSSIAN

    Cl = params_l.xyz.shape[0]
    donate_cap = min(donate_cap, Cl)
    iota = jnp.arange(Cl, dtype=jnp.int32)
    cap_iota = jnp.arange(donate_cap, dtype=jnp.int32)
    alive = aux_l.alive
    m = jax.lax.axis_index(model_axis)

    n_alive = jnp.sum(alive.astype(jnp.int32))
    counts = jax.lax.all_gather(n_alive, model_axis)       # (M,)
    total = jnp.sum(counts)
    target = (total + n_model - 1) // n_model
    excess = jnp.maximum(counts - target, 0)
    donate = jnp.minimum(excess, donate_cap)
    free = Cl - counts
    deficit = jnp.minimum(jnp.minimum(jnp.maximum(target - counts, 0),
                                      free), donate_cap)
    n_donations = jnp.sum(donate)
    total_claims = jnp.minimum(jnp.sum(deficit), n_donations)

    # --- donor side ----------------------------------------------------
    my_donate = donate[m]
    donor_rows = jnp.argsort(
        -jnp.where(alive, iota, -1))[:donate_cap].astype(jnp.int32)
    donor_base = jnp.cumsum(donate)[m] - donate[m]
    donor_ord = donor_base + cap_iota
    donor_claimed = (cap_iota < my_donate) & (donor_ord < total_claims)

    buf = {}
    for g in PER_GAUSSIAN:
        buf[g] = getattr(params_l, g)[donor_rows]
        buf[f"mu_{g}"] = getattr(opt_l.mu, g)[donor_rows]
        buf[f"nu_{g}"] = getattr(opt_l.nu, g)[donor_rows]
    gathered = jax.tree.map(
        lambda x: jax.lax.all_gather(x, model_axis), buf)  # (M, cap, ...)
    flat = jax.tree.map(
        lambda x: x.reshape((n_model * donate_cap,) + x.shape[2:]),
        gathered)

    # ordinal -> flattened-donation index (donor-major; invalid sort last)
    base_all = jnp.cumsum(donate) - donate                 # (M,)
    ord_flat = (base_all[:, None] + cap_iota[None, :]).reshape(-1)
    valid_flat = (cap_iota[None, :] < donate[:, None]).reshape(-1)
    big = jnp.int32(n_model * donate_cap)
    perm = jnp.argsort(jnp.where(valid_flat, ord_flat, big)).astype(jnp.int32)

    # --- receiver side -------------------------------------------------
    claim_base = jnp.cumsum(deficit)[m] - deficit[m]
    my_claim = jnp.clip(total_claims - claim_base, 0, deficit[m])
    want = claim_base + cap_iota
    src = perm[jnp.clip(want, 0, big - 1)]
    take = cap_iota < my_claim
    dst = jnp.argsort(jnp.where(~alive, iota, Cl))[:donate_cap]
    dst = jnp.where(take, dst, Cl).astype(jnp.int32)       # Cl -> dropped

    new_p, new_mu, new_nu = {}, {}, {}
    for g in PER_GAUSSIAN:
        new_p[g] = getattr(params_l, g).at[dst].set(
            flat[g][src], mode="drop")
        new_mu[g] = getattr(opt_l.mu, g).at[dst].set(
            flat[f"mu_{g}"][src], mode="drop")
        new_nu[g] = getattr(opt_l.nu, g).at[dst].set(
            flat[f"nu_{g}"][src], mode="drop")
    params_l = params_l.replace(**new_p)
    opt_l = opt_l.replace(mu=opt_l.mu.replace(**new_mu),
                          nu=opt_l.nu.replace(**new_nu))

    kill = jnp.where(donor_claimed, donor_rows, Cl)
    alive = alive.at[dst].set(True, mode="drop")
    alive = alive.at[kill].set(False, mode="drop")
    zero_dst = jnp.zeros((donate_cap,), jnp.float32)
    aux_l = aux_l.replace(
        alive=alive,
        max_radii2d=aux_l.max_radii2d.at[dst].set(zero_dst, mode="drop"),
        xyz_gradient_accum=aux_l.xyz_gradient_accum.at[dst].set(
            zero_dst, mode="drop"),
        denom=aux_l.denom.at[dst].set(zero_dst, mode="drop"))
    moved = jnp.sum(take.astype(jnp.int32))
    return params_l, aux_l, opt_l, moved


def band_slice(x: jnp.ndarray, height: int, n_model: int, model_axis: str,
               fill: float = 0.0):
    """Slice this device's tile-row band out of per-view images
    (..., H, W) -> (..., band_rows*TILE, W), zero-padded past H.

    Use inside shard_map to band-shard ground-truth images/masks so the
    loss is computed band-locally (psum the scalars over the model axis).
    """
    bh_px = band_rows(height, n_model) * TILE
    m = jax.lax.axis_index(model_axis)
    pad = n_model * bh_px - height
    if pad:
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
        x = jnp.pad(x, cfg, constant_values=fill)
    start = (m * bh_px).astype(jnp.int32)
    starts = [jnp.int32(0)] * (x.ndim - 2) + [start, jnp.int32(0)]
    sizes = x.shape[:-2] + (bh_px, x.shape[-1])
    return jax.lax.dynamic_slice(x, starts, sizes)
