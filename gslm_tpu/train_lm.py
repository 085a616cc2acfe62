"""Two-phase Levenberg–Marquardt trainer.

Equivalent of the reference's train_jvp.py:56-341: first-order Adam
iterations until ``--jvp_start``, then LM outer steps — a contiguous window
of ``--num_images`` views, matrix-free damped CGLS on the linearized
residuals (J·v / Jᵀ·v through the renderer), and a backtracking line search
on a fixed validation view set.

TPU-first difference: one LM outer step — initial forward, the whole CGLS
recurrence (JVP/VJP matvecs, damped dots), the 7-point line search, and the
parameter update — is a single jitted XLA program with zero host syncs,
where the reference pays a host round-trip per CG scalar
(gaussian_model_state.py:252-273) and re-renders for every Jᵀv.

Usage: python -m gslm_tpu.train_lm -s <dataset> -m <output> [flags]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu import config as cfg_mod
from gslm_tpu.models import gaussians as G
from gslm_tpu.models.cameras import CameraBatch
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.solver.cg import cgls_damped_unrolled
from gslm_tpu.solver.operators import LMOperators, chunked_residual_fn
from gslm_tpu.solver.residuals import batch_residuals


def downscale_val_batch(val: CameraBatch, s: int) -> CameraBatch:
    """The same views at 1/s resolution for line-search RANKING renders.

    Cameras keep their matrices/FOV (the NDC->pixel map uses the static
    height/width, so halving the canvas is resolution-exact); gt/mask/
    depth images are s x s average-pooled. Per-view true extents divide
    by s — edge pixels of partially-padded views blend valid and pad
    content in the pooled gt, a ranking-only approximation (the winner
    is re-scored on the full-resolution set)."""
    H, W = val.height, val.width
    assert H % s == 0 and W % s == 0, (H, W, s)

    def pool(img):
        B, C = img.shape[:2]
        return img.reshape(B, C, H // s, s, W // s, s).mean(axis=(3, 5))

    return val.replace(
        gt_image=pool(val.gt_image), alpha_mask=pool(val.alpha_mask),
        invdepth_gt=pool(val.invdepth_gt),
        depth_mask=pool(val.depth_mask),
        heights=val.heights // s, widths=val.widths // s,
        height=H // s, width=W // s)


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "lm", "active_sh_degree", "use_exp",
                     "lambda_dssim", "axis_name"))
def lm_outer_step(params, alive, window: CameraBatch, val: CameraBatch, bg,
                  win_valid=None, val_valid=None,
                  *, rcfg: RasterConfig, lm: cfg_mod.LMParams,
                  active_sh_degree: int, use_exp: bool,
                  lambda_dssim: float = 0.2, axis_name: str | None = None):
    """One LM outer step (reference train_jvp.py:221-288). Returns
    (new_params, info dict).

    When the window exceeds ``lm.micro_batch`` views, the residual function
    micro-batches over view chunks with lax.map (the reference's
    batch_size=20 chunk loop, solver_functions.py:38-49,88-97,110-121) —
    peak memory is one chunk's render regardless of ``--num_images``. Pad
    the window to a chunk multiple and zero the pads via ``win_valid``
    ((B,) f32; ``val_valid`` likewise for the validation views).

    ``axis_name``: set when the window/val view axes are sharded across a
    mesh axis inside shard_map — residual dots, Jᵀ·u partials, and the
    line-search losses then psum over it (parallel/steps.py wires this)."""

    # the LM residual has no depth term (reference training_loss.py:57
    # raises NotImplementedError) — invdepth cotangents are identically
    # zero, so trim them from the Pallas backward
    rcfg = rcfg.replace(depth_grad=False)

    def res_of(cfg):
        def f(p, cams):
            return batch_residuals(p, cams, bg, config=cfg,
                                   lambda_dssim=lambda_dssim,
                                   disable_ssim=lm.disable_ssim,
                                   use_trained_exp=use_exp,
                                   active_sh_degree=active_sh_degree,
                                   alive=alive)
        return f

    nwin = window.world_view.shape[0]
    mb = lm.micro_batch if lm.micro_batch > 0 else nwin
    if nwin % mb != 0:
        import warnings
        warnings.warn(
            f"lm_outer_step: window of {nwin} views is not a multiple of "
            f"micro_batch={mb}; falling back to ONE whole-window render "
            "(peak memory scales with the window — pad to a chunk "
            "multiple with win_valid weights as lm_phase does)",
            stacklevel=2)
        mb = nwin
    chunked = nwin > mb

    def make_residual_fn(cfg):
        if chunked:
            return chunked_residual_fn(res_of(cfg), window, mb,
                                       view_valid=win_valid)
        f = res_of(cfg)
        if win_valid is None:
            return lambda p: f(p, window)
        return lambda p: jax.tree.map(
            lambda x: x * win_valid[:, None, None, None], f(p, window))

    residual_fn = make_residual_fn(rcfg)

    # forward-mode twin for J·v when the VJP path renders through the
    # custom-VJP Pallas kernel (see LMOperators.residual_fn_jvp)
    from gslm_tpu.renderer import resolve_impl
    residual_fn_jvp = None
    if resolve_impl(rcfg.impl) == "pallas":
        residual_fn_jvp = make_residual_fn(rcfg.replace(impl="pallas_jvp"))

    nval = val.world_view.shape[0]
    val_mb = mb if nval > mb else nval
    if nval % val_mb != 0:
        val_mb = nval      # direct callers with odd sizes: one chunk
    # val/line-search renders are forward-only with one chunk live at a
    # time: lm.val_pack lets them use a faster record packing than the
    # window's footprint-driven choice (config.py LMParams.val_pack)
    vcfg = rcfg if lm.val_pack == 0 else rcfg.replace(pack=lm.val_pack)

    def make_val_loss(valb, cfg):
        """Chunked sum of squared residual norms over a val batch:
        bounded memory for the 50 validation views (reference
        train_jvp.py:214-216,264-280). The returned fn's ``chunk_idx``
        (static tuple) selects a chunk subset for the staged search."""
        chunks = jax.tree.map(
            lambda x: x.reshape(nval // val_mb, val_mb, *x.shape[1:]),
            valb)
        wts = (jnp.ones((nval,), jnp.float32) if val_valid is None
               else val_valid).reshape(nval // val_mb, val_mb)
        res = res_of(cfg)

        def loss_chunks(p, chunk_idx=None):
            def one(args):
                cams, w = args
                r = res(p, cams)
                r = jax.tree.map(lambda x: x * w[:, None, None, None], r)
                return r.loss_scalar
            if chunk_idx is None:
                sel, w = chunks, wts
            else:
                ci = jnp.asarray(chunk_idx, jnp.int32)
                sel = jax.tree.map(lambda x: x[ci], chunks)
                w = wts[ci]
            loss = jnp.sum(jax.lax.map(one, (sel, w)))
            if axis_name is not None:
                return jax.lax.psum(loss, axis_name)
            return loss

        return loss_chunks

    val_loss_chunks = make_val_loss(val, vcfg)
    nch_total = nval // val_mb

    def val_loss(p):
        return val_loss_chunks(p)

    group_mask = G.param_group_mask(
        mask_xyz=lm.mask_xyz)  # reference masks xyz only (train_jvp.py:221)
    ops = LMOperators(residual_fn, params, group_mask=group_mask, alive=alive,
                      residual_fn_jvp=residual_fn_jvp, axis_name=axis_name)
    start_loss = ops.loss_scalar

    b = jax.tree.map(jnp.negative, ops.residual)     # b = -r (train_jvp.py:243)
    damp = lm.damp_dict()
    s = cgls_damped_unrolled(
        ops.matvec, ops.matvec_T, ops.dot, ops.saxpy,
        LMOperators.dampmul_for(damp), b, ops.get_initial_solution(), damp,
        max_iter=lm.cg_max_iter, restart_iter=lm.cg_restart_iter,
        check_divergence=lm.check_divergence)

    # line search: alpha0 halved line_search_steps times, best val loss wins
    alphas = jnp.asarray([lm.line_search_alpha0 * (0.5 ** i)
                          for i in range(lm.line_search_steps + 1)])
    ks = lm.ls_subset_views
    vsc = lm.ls_val_scale
    if ((0 < ks < nval) or vsc > 1) and lm.line_search_steps > 0:
        # staged search: rank every alpha on a cheaper proxy — a
        # stride-sampled subset of val chunks (ls_subset_views; the
        # subset STRIDES the chunk axis, since a first-k prefix of a
        # camera ring is spatially correlated — the reference's own val
        # selection is stride-19, train_jvp.py:214-216) and/or the val
        # views rendered at 1/ls_val_scale resolution (2x2-avg-pooled gt,
        # same cameras/FOV — the scene content driving the ranking is
        # unchanged, only pixel sampling density drops) — then score just
        # the winning alpha on the FULL set at FULL resolution, so
        # best_val_loss is always exact. The selected alpha can differ
        # from the reference's full ranking when the proxy disagrees
        # (selection-equality evidence: scripts/ls_selection_check.py).
        if vsc > 1:
            val_r = downscale_val_batch(val, vsc)
            # the half-res stream shrinks ~vsc^2 for multi-tile splats
            # but never below 1 record/splat: keep a 2x margin over the
            # area scaling (ranking-only; the final score re-renders at
            # full resolution with the probed capacities)
            cap = max(512, vcfg.dup_capacity // (vsc * vsc) * 2)
            lcap = max(512, vcfg.live_capacity // (vsc * vsc) * 2) \
                if vcfg.live_capacity else 0
            rank_cfg = vcfg.replace(dup_capacity=cap // 256 * 256,
                                    live_capacity=lcap // 256 * 256)
            rank_loss = make_val_loss(val_r, rank_cfg)
        else:
            rank_loss = val_loss_chunks
        if 0 < ks < nval:
            nch_sub = min(nch_total, max(1, -(-ks // val_mb)))
            sub_idx = tuple(i * nch_total // nch_sub
                            for i in range(nch_sub))
        else:
            sub_idx = None
        losses = jax.lax.map(
            lambda a: rank_loss(G.saxpy(a, s, params), sub_idx),
            alphas)
        best = jnp.argmin(losses)
        best_alpha = alphas[best]
        new_params = G.saxpy(best_alpha, s, params)
        best_val_loss = val_loss(new_params)
    else:
        losses = jax.lax.map(lambda a: val_loss(G.saxpy(a, s, params)),
                             alphas)
        best = jnp.argmin(losses)
        best_alpha = alphas[best]
        best_val_loss = losses[best]
        new_params = G.saxpy(best_alpha, s, params)

    info = {"start_loss": start_loss, "val_losses": losses,
            "best_alpha": best_alpha, "best_val_loss": best_val_loss,
            "step_norms": {g: jnp.linalg.norm(getattr(s, g))
                           for g in G.PARAM_GROUPS}}
    return new_params, info


def select_window(num_cams: int, num_images: int, rng: np.random.Generator,
                  stride: int = 1) -> list[int]:
    """Contiguous stride-1 window of views (train_jvp.py:193-206)."""
    n = min(num_images, num_cams)
    start = int(rng.integers(0, max(num_cams - n * stride, 1)))
    return [start + i * stride for i in range(n)]


def val_indices(num_cams: int, lm: cfg_mod.LMParams) -> list[int]:
    """Fixed validation views (train_jvp.py:214-216)."""
    return [(i * lm.val_view_stride) % num_cams
            for i in range(lm.num_val_views)]


_DP_LM_CACHE: dict = {}


def lm_phase(scene, params, aux, all_train: CameraBatch, rcfg, bg, lm,
             iteration: int, rng: np.random.Generator, use_exp: bool,
             lambda_dssim: float, active_sh_degree: int, verbose=True,
             mesh=None):
    """Host driver for one LM iteration: pick windows, run the jitted step.
    With a mesh, the window/val views shard over its "data" axis (the
    shard_map path — works with the Pallas kernels).

    Returns (params, info, rcfg): overflow recovery mirrors the first-order
    loop's retry — the window's record count is probed at P level before
    the step AND on the accepted parameters after it (densify spikes and
    line-search moves can both push past capacity), and on overflow the
    whole outer step re-runs from the pre-step state at doubled capacities
    (reference train_jvp.py inherits the CUDA rasterizer's on-demand buffer
    resize; XLA capacities are static)."""
    n = all_train.batch_size
    win = select_window(n, lm.num_images, rng)
    vidx = val_indices(n, lm)

    def pad_to_chunk(idx):
        """Pad a view-index list to a micro_batch multiple — and, on a
        mesh, to a data-axis multiple so each shard's slice still chunks
        evenly (pads repeat the first view and carry weight 0 so
        residuals/losses are unchanged)."""
        mb = lm.micro_batch
        multiple = mb if (mb > 0 and len(idx) > mb) else 1
        if mesh is not None:
            multiple *= mesh.shape["data"]
        if multiple <= 1:
            return idx, None
        pad = (-len(idx)) % multiple
        w = np.ones(len(idx) + pad, np.float32)
        if pad:
            w[len(idx):] = 0.0
            idx = idx + [idx[0]] * pad
        return idx, jnp.asarray(w)

    win, win_valid = pad_to_chunk(win)
    vidx, val_valid = pad_to_chunk(vidx)
    window = jax.tree.map(lambda x: x[jnp.asarray(win)], all_train)
    val = jax.tree.map(lambda x: x[jnp.asarray(vidx)], all_train)

    def run_step(p, cfg):
        if mesh is not None:
            # key includes cfg: overflow recovery doubles capacities
            # mid-run and stale compiled steps must not survive it.
            # jax.sharding.Mesh hashes by devices+axis names — a stable
            # identity, unlike id(mesh) which a GC'd mesh can alias
            key = (mesh, active_sh_degree, cfg, lm, use_exp, lambda_dssim)
            if key not in _DP_LM_CACHE:
                kw = dict(rcfg=cfg, lm=lm,
                          active_sh_degree=active_sh_degree,
                          use_exp=use_exp, lambda_dssim=lambda_dssim)
                if mesh.shape.get("model", 1) > 1:
                    from gslm_tpu.parallel import make_mp_lm_step
                    _DP_LM_CACHE[key] = make_mp_lm_step(mesh, p, **kw)
                else:
                    from gslm_tpu.parallel import make_dp_lm_step
                    _DP_LM_CACHE[key] = make_dp_lm_step(mesh, **kw)
            ones = lambda n: jnp.ones((n,), jnp.float32)   # noqa: E731
            wv = win_valid if win_valid is not None else ones(len(win))
            vv = val_valid if val_valid is not None else ones(len(vidx))
            return _DP_LM_CACHE[key](p, aux.alive, window, val, bg, wv, vv)
        return lm_outer_step(p, aux.alive, window, val, bg,
                             win_valid, val_valid, rcfg=cfg, lm=lm,
                             active_sh_degree=active_sh_degree,
                             use_exp=use_exp, lambda_dssim=lambda_dssim)

    from gslm_tpu.renderer import overflow_probe_jit

    n_model = mesh.shape.get("model", 1) if mesh is not None else 1
    n_data = mesh.shape.get("data", 1) if mesh is not None else 1

    def render_groups(n_views: int) -> list[list[int]]:
        """View-index groups that share ONE record stream (= one fused
        render): capacities bound a render, not the whole window, so the
        probe must compare per-group sums (a 20-view window chunked at
        micro_batch 5 needs 4x LESS capacity than its total). Mirrors
        lm_outer_step's chunking: contiguous per-data-shard slices, then
        micro_batch chunks within each slice."""
        per_dev = n_views // n_data
        mb = lm.micro_batch
        # mp_lm_outer_step renders its whole per-device slice in one fused
        # pass (no micro-batch chunk inside the mp path)
        step = mb if (n_model == 1 and 0 < mb < per_dev
                      and per_dev % mb == 0) else per_dev
        return [list(range(d * per_dev + c, d * per_dev + c + step))
                for d in range(n_data) for c in range(0, per_dev, step)]

    def probe(p, cfg):
        """True iff ANY render unit of the window or the line search's
        validation views would overflow cfg's record (or routed-exchange)
        capacities. Model-parallel shards pay only their band's stream:
        band_aabb is exact for the AABB ceiling and a conservative proxy
        for the post-cull live ceiling (aabb ≥ live)."""
        over = False
        for cams, nv in ((window, len(win)), (val, len(vidx))):
            out = overflow_probe_jit(
                p, cams, config=cfg, active_sh_degree=active_sh_degree,
                alive=aux.alive, per_view=True, n_model=n_model)
            na = np.asarray(out["n_aabb"])
            nl = np.asarray(out["n_live"])
            for grp in render_groups(nv):
                if n_model > 1:
                    band = np.asarray(out["band_aabb"])[grp].sum(0)
                    need_aabb = need_live = int(band.max())
                else:
                    need_aabb = int(na[grp].sum())
                    need_live = int(nl[grp].sum())
                over |= (need_live > cfg.eff_capacity()
                         or need_aabb > cfg.dup_capacity)
                if n_model > 1 and cfg.mp_route_capacity > 0:
                    rc = np.asarray(out["route_counts"])[grp].sum(0)
                    over |= int(rc.max()) > cfg.mp_route_capacity
        return over

    params0 = params
    for attempt in range(4):
        if probe(params0, rcfg):
            rcfg = rcfg.grow()
            print(f"\n[ITER {iteration}] LM window exceeds record capacity: "
                  f"growing to dup_capacity={rcfg.dup_capacity}")
            continue
        params, info = run_step(params0, rcfg)
        # the accepted parameters (params0 + alpha*s) can cross the ceiling
        # the starting point cleared — the step is only valid if they fit
        if not probe(params, rcfg):
            break
        rcfg = rcfg.grow()
        print(f"\n[ITER {iteration}] LM step overflowed record capacity: "
              f"re-running at dup_capacity={rcfg.dup_capacity}")
    else:
        print(f"\n[ITER {iteration}] WARNING: LM overflow persists after "
              f"retries (dup_capacity={rcfg.dup_capacity}); this step used "
              f"a degraded render")
        params, info = run_step(params0, rcfg)

    if verbose:
        print(f"\n[ITER {iteration}] LM window {win}: "
              f"loss {float(info['start_loss']):.6f} → val "
              f"{float(info['best_val_loss']):.6f} "
              f"(alpha {float(info['best_alpha']):.3f})")
    return params, info, rcfg


def main():
    from gslm_tpu.train import build_parser, training

    parser = build_parser()
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)

    lm = cfg_mod.extract(args, cfg_mod.LMParams)
    model = cfg_mod.extract(args, cfg_mod.ModelParams)
    opt = cfg_mod.extract(args, cfg_mod.OptimizationParams)
    tpu = cfg_mod.extract(args, cfg_mod.TpuParams)
    rng = np.random.default_rng(0)

    mesh = None
    if tpu.mesh_data * tpu.mesh_model > 1:
        if getattr(args, "platform", ""):
            # training() applies this too, but the mesh is built first
            jax.config.update("jax_platforms", args.platform)
        from gslm_tpu.parallel import make_mesh
        mesh = make_mesh(tpu.mesh_data, tpu.mesh_model)
        # window/val sizes need not divide mesh_data: lm_phase pads
        # with zero-weight views (pad_to_chunk)

    def hook(scene, params, aux, opt_state, iteration, all_train, rcfg, bg):
        active_sh = min(iteration // 1000, params.sh_degree)
        params, info, rcfg = lm_phase(
            scene, params, aux, all_train, rcfg, bg, lm, iteration, rng,
            model.train_test_exp, opt.lambda_dssim, active_sh, mesh=mesh,
            verbose=not getattr(args, "quiet", False))
        return params, aux, opt_state, info, rcfg

    print("Optimizing " + args.model_path + f" (LM from {lm.jvp_start})")
    training(args, lm_phase_hook=hook)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
