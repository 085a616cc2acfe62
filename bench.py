"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: forward-render throughput (rays/s = pixels/s) at 1080p over a
synthetic 128k-Gaussian cloud on one chip. Baseline: the reference's only
concrete rate claim — real-time rendering >= 30 fps at 1080p on an
RTX-class GPU (reference README.md:14) = 62.208e6 rays/s.

Sub-metrics (the honest training comparators, VERDICT r2 weak #2):
  - fwd+bwd rays/s through jax.grad of the training loss;
  - adam_iter_ms: one full jitted Adam training iteration (render + loss +
    backward + optimizer + densify stats) at 1080p — comparator: the
    A6000's ~65 ms/iter implied by the reference's 7 h / 13-scene eval
    (README.md:271, 390k iterations);
  - LM operator throughput (J.v / J^T.u matvecs/s) and the FULL LM outer
    step at reference settings (window 5 @1080p, 50 val views x 7
    line-search alphas, cg 2 — train_jvp.py:428-429,255-256,214-216);
  - a million-Gaussian configuration (P=2^20 @1080p, pack=8 record
    stream) probing the reference's multi-million-splat envelope
    (README.md:88).

Driver-budget discipline (VERDICT r4 #1 — BENCH_r04 was rc:124/null):
  - a persistent XLA compilation cache (.jax_cache/, env GSLM_CACHE_DIR)
    makes the ~15 large program compiles a once-per-machine cost;
  - ``--budget SECS`` (default 840) is a soft deadline checked between
    sections — sections that don't fit are skipped and *recorded* as
    skipped — plus a hard watchdog at budget+120 s that prints the JSON
    accumulated so far and exits 0 (a partial record beats rc:124);
  - sections run cheapest-first so a timeout loses the least;
  - the four LM outer variants are trimmed to full+staged by default
    (``--lm_variants all`` restores ls1/nodiv; their stage split is
    derivable from the full/staged/ls-off triple anyway).

Usage: python bench.py [--quick] [--budget SECS] [--lm_variants all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_RAYS_PER_S = 30.0 * 1920 * 1080   # reference README.md:14
A6000_ITER_MS = 65.0                       # README.md:271: 7h/390k iters

_t_start = time.monotonic()
_result_lock = threading.Lock()
_result: dict = {"metric": "render_1080p_rays_per_s", "value": 0.0,
                 "unit": "rays/s/chip", "vs_baseline": 0.0, "extra": {}}
_emitted = False


def _progress(name: str, val=None) -> None:
    """Per-section stderr progress line (the JSON stays one stdout line;
    without these a stuck run is indistinguishable from a compiling one —
    exactly how r4 lost its record)."""
    t = time.monotonic() - _t_start
    print(f"bench: {name} done at {t:.0f}s"
          + (f" ({val})" if val is not None else ""),
          file=sys.stderr, flush=True)


def _emit(partial: bool = False) -> None:
    """Print the single JSON line exactly once (watchdog or main path)."""
    global _emitted
    with _result_lock:
        if _emitted:
            return
        _emitted = True
        if partial:
            _result["extra"]["budget_exceeded"] = True
        _result["extra"]["elapsed_s"] = round(time.monotonic() - _t_start, 1)
        print(json.dumps(_result), flush=True)


def _watchdog(hard_deadline_s: float) -> None:
    """Emit whatever completed and exit if the main thread is stuck past
    the hard deadline (XLA compiles release the GIL, so this thread runs
    even while a giant program compiles)."""
    delay = hard_deadline_s - (time.monotonic() - _t_start)
    if delay > 0:
        time.sleep(delay)
    print(f"bench watchdog: hard deadline hit at "
          f"{time.monotonic() - _t_start:.0f}s; emitting partial record",
          file=sys.stderr, flush=True)
    _emit(partial=True)
    sys.stdout.flush()
    os._exit(0)


def _time_calls(fn, args, iters: int, warmup: int = 2, reps: int = 3,
                readback: bool = False) -> float:
    """Median-of-reps wall time per call; one device sync per block.

    ``readback=True`` syncs by fetching the output's VALUE instead of
    block_until_ready — over the axon tunnel, block_until_ready can
    return before real execution on some programs (observed on the
    ls_val_scale LM variant, which "timed" 0.0 s; the same mechanism the
    r4 verify notes flagged for pure-XLA programs). Use it whenever the
    output is a cheap scalar."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    if readback:
        np.asarray(jax.tree.leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        if readback:
            np.asarray(jax.tree.leaves(out)[0])
        else:
            jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CI/CPU smoke)")
    ap.add_argument("--skip_1m", action="store_true",
                    help="skip the million-Gaussian config")
    ap.add_argument("--budget", type=float, default=840.0,
                    help="soft wall-clock budget (s); sections that don't "
                         "fit are skipped and recorded as skipped")
    ap.add_argument("--lm_variants", choices=["default", "all", "none"],
                    default="default",
                    help="LM outer variants: default=full+staged, "
                         "all=+ls1/nodiv, none=skip")
    ap.add_argument("--no_cache", action="store_true",
                    help="disable the persistent compilation cache")
    args = ap.parse_args()

    threading.Thread(target=_watchdog, args=(args.budget + 120.0,),
                     daemon=True).start()

    import jax

    if not args.no_cache:
        cache_dir = os.environ.get(
            "GSLM_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from gslm_tpu import config as cfg_mod
    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.optim import init_adam
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import render
    from gslm_tpu.solver.residuals import batch_residuals
    from gslm_tpu.train import train_step
    from gslm_tpu.train_lm import lm_outer_step
    from gslm_tpu.utils.synthetic import (make_camera, random_gaussians,
                                          ring_camera_batch)

    extra = _result["extra"]
    skipped: list[str] = []
    extra["skipped"] = skipped

    def budget_left() -> float:
        return args.budget - (time.monotonic() - _t_start)

    def fits(name: str, need_s: float) -> bool:
        """Soft-deadline gate: skip (and record) sections that don't fit."""
        if budget_left() >= need_s:
            return True
        print(f"bench: skipping {name} (needs ~{need_s:.0f}s, "
              f"{budget_left():.0f}s left)", file=sys.stderr, flush=True)
        skipped.append(name)
        return False

    on_tpu = jax.default_backend() == "tpu"
    if args.quick:
        n_gauss, H, W, iters = 4096, 256, 256, 5
        lm_views, lm_hw, lm_val = 2, 128, 2
        cfg = RasterConfig(dup_capacity=1 << 15, max_per_tile=256,
                           tile_chunk=16, impl="auto",
                           live_capacity=(1 << 15) - (1 << 12))
    else:
        n_gauss, H, W, iters = 131_072, 1080, 1920, 10
        lm_views, lm_hw, lm_val = 5, 1080, 50
        # capacity: bench scene peaks ~1.27M AABB records with the
        # opacity-aware rects; exact culling survives ~82% of that, so the
        # post-sort stream gets its own (smaller) ceiling
        cfg = RasterConfig(dup_capacity=1_638_400, max_per_tile=1024,
                           tile_chunk=64, impl="auto",
                           live_capacity=1_280_000)

    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=max(lm_views, 50), spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)

    # ---- on-hardware parity: the COMPILED pallas kernels (Mosaic) vs the
    # XLA tile pipeline, before any timing. The full matrix (all 7 param
    # groups x both bwd_reduce x cull/pack/batch variants x JVP paths,
    # gslm_tpu/utils/paritycheck.py) is how the r3 sortseg regression
    # class gets caught before it ships (VERDICT r3 weak #7).
    extra["parity_ok"] = True
    extra["parity"] = None
    if on_tpu:
        from gslm_tpu.utils.paritycheck import run_parity_matrix
        pm = run_parity_matrix(quick=args.quick)
        extra["parity_ok"] = pm["ok"]
        extra["parity"] = {k: {"ok": v["ok"],
                               "max_err": round(v["max_err"], 9)}
                           for k, v in pm["variants"].items()}
        for k, v in pm["variants"].items():
            if not v["ok"]:
                print(f"PARITY FAILURE {k}: max_err={v['max_err']:.3e} "
                      f"{v.get('per_group', '')}", file=sys.stderr)
        _progress("parity", "ok" if pm["ok"] else "FAIL")

    extra.update(n_gaussians=n_gauss, resolution=f"{W}x{H}",
                 device=str(jax.devices()[0]), quick=args.quick)

    # ---- forward render (headline) ------------------------------------
    @jax.jit
    def fwd(p, cam, bg):
        return render(p, cam, bg, config=cfg, alive=aux.alive).render

    t_fwd = _time_calls(fwd, (params, camera, bg), iters)
    rays_fwd = H * W / t_fwd
    _result.update(value=round(rays_fwd, 1),
                   vs_baseline=round(rays_fwd / BASELINE_RAYS_PER_S, 4))
    extra["fwd_ms"] = round(t_fwd * 1e3, 3)
    _progress("fwd", extra["fwd_ms"])

    # ---- forward + backward -------------------------------------------
    @jax.jit
    def fwd_bwd(p, cam, bg, gt):
        def loss_fn(p):
            img = render(p, cam, bg, config=cfg, alive=aux.alive).render
            return jnp.mean(jnp.abs(img - gt))
        loss, g = jax.value_and_grad(loss_fn)(p)
        return loss, g.xyz

    t_fb = _time_calls(fwd_bwd, (params, camera, bg, gt), max(iters // 2, 3))
    extra["fwd_bwd_rays_per_s"] = round(H * W / t_fb, 1)
    extra["fwd_bwd_ms"] = round(t_fb * 1e3, 3)
    _progress("fwd_bwd", extra["fwd_bwd_ms"])

    # ---- full Adam training iteration (A6000 ~65 ms/iter comparator) ---
    cam1 = ring_camera_batch(1, H, W)
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    adam_args = (params, aux, opt_state, cam1, bg, jnp.int32(100),
                 jnp.float32(1.0), jnp.float32(0.0))
    adam_kw = dict(rcfg=cfg, opt=opt, active_sh_degree=3, use_exp=False,
                   sparse_adam=False, update_stats=True)
    t_adam = _time_calls(lambda *a: train_step(*a, **adam_kw), adam_args,
                         max(iters // 2, 3))
    extra["adam_iter_ms"] = round(t_adam * 1e3, 3)
    extra["adam_iter_vs_a6000"] = round(A6000_ITER_MS / (t_adam * 1e3), 4)
    _progress("adam_iter", extra["adam_iter_ms"])

    # ---- FULL LM outer step at reference settings (SURVEY §3.2) --------
    # window 5 @1080p, 50 val views x 7 line-search alphas, cg 2:
    # the cost anatomy the LM phase must win at. Variants: staged
    # (ls_subset_views=10) ranks alphas on a stride-sampled val subset;
    # ls1/nodiv (--lm_variants all) isolate the line-search and
    # check_divergence costs (measured r4: ls ~20 s of 26.7, nodiv ~0.2 s).
    lm_win = ring_camera_batch(lm_views, H, W)
    lm_valb = ring_camera_batch(lm_val, H, W, gt_seed=1)
    # 5-view fused window: ~5x the single-view record stream. Capacities
    # from the r5 on-chip probe over the 50-view ring (worst 5-view
    # window AABB 6,337,123 / live 5,209,072) + 5% — the sort pays
    # dup_capacity per chunk render, so the old x5 ceilings carried ~29%
    # pure overhead through every line-search render.
    if args.quick:
        win_cfg = RasterConfig(
            dup_capacity=cfg.dup_capacity * lm_views, max_per_tile=2048,
            tile_chunk=cfg.tile_chunk, impl=cfg.impl,
            live_capacity=(cfg.live_capacity * lm_views) // 256 * 256)
    else:
        win_cfg = RasterConfig(
            dup_capacity=6_654_208, max_per_tile=2048,
            tile_chunk=cfg.tile_chunk, impl=cfg.impl,
            pack=8 if on_tpu else 0, live_capacity=5_469_696)
    variants = []
    if args.lm_variants != "none" and not args.quick:
        # val_pack=1: line-search/val renders (fwd-only, one chunk live)
        # take the fast pack=1 kernel while the window ops keep pack=8's
        # 8x smaller stream (LMParams.val_pack)
        vp = 1 if on_tpu else 0
        variants = [("lm_outer_step_s", cfg_mod.LMParams(val_pack=vp)),
                    ("lm_outer_staged_s",
                     cfg_mod.LMParams(ls_subset_views=10, val_pack=vp)),
                    # resolution-staged ranking (alphas ranked at 540p,
                    # winner scored at full res; selection-equality
                    # evidence in scripts/ls_selection_check.py)
                    ("lm_outer_res2_s",
                     cfg_mod.LMParams(ls_val_scale=2, val_pack=vp))]
        if args.lm_variants == "all":
            variants += [
                ("lm_outer_ls1_s",
                 cfg_mod.LMParams(line_search_steps=0, val_pack=vp)),
                ("lm_outer_nodiv_s",
                 cfg_mod.LMParams(check_divergence=False, val_pack=vp))]

    def outer(lmp):
        def f(p):
            return lm_outer_step(p, aux.alive, lm_win, lm_valb, bg,
                                 rcfg=win_cfg, lm=lmp, active_sh_degree=3,
                                 use_exp=False)[1]["best_val_loss"]
        return f

    def run_variant(name, lmp, need_s):
        # need_s: warm-cache estimate (1 warmup + 2 reps)
        if not fits(name, need_s):
            return
        try:
            t = _time_calls(outer(lmp), (params,), 1, warmup=1, reps=2,
                            readback=True)
            extra[name] = round(t, 3)
            _progress(name, extra[name])
        except Exception as e:   # noqa: BLE001 - report, don't die
            print(f"{name} failed: {e}", file=sys.stderr)
            extra[name] = None



    # ---- million-Gaussian configuration (reference 24 GB envelope) -----
    if on_tpu and not args.quick and not args.skip_1m \
            and fits("m1", 120):
        try:
            P1 = 1 << 20
            p1, a1 = random_gaussians(np.random.default_rng(2), n=P1,
                                      capacity=P1, num_images=1, spread=1.5,
                                      scale_range=(-5.5, -3.5))
            # pack=8 shrinks the HBM stream 8x; bucket=4 bins records at
            # 64x64-pixel granularity — the m1 kernel early-exits after
            # reading ~20% of the stream, so the row-bound sort/gather
            # dominate and 4x fewer records bought fwd 460 -> 152 ms,
            # fwd+bwd 1392 -> 455 ms (r5 on-chip; bucket=2 measured
            # 239/673). Capacities from the bucket-record probe (AABB
            # 2,207,812 / live 2,075,156) + 5%.
            cfg1 = RasterConfig(dup_capacity=2_318_336, max_per_tile=8192,
                                tile_chunk=64, impl="auto", pack=8,
                                live_capacity=2_179_072, bucket=4)

            @jax.jit
            def fwd1(p, cam, bg):
                return render(p, cam, bg, config=cfg1, alive=a1.alive).render

            @jax.jit
            def fwd_bwd1(p, cam, bg, gt):
                def loss_fn(p):
                    img = render(p, cam, bg, config=cfg1,
                                 alive=a1.alive).render
                    return jnp.mean(jnp.abs(img - gt))
                return jax.value_and_grad(loss_fn)(p)[1].xyz

            t1f = _time_calls(fwd1, (p1, camera, bg), 3)
            t1fb = _time_calls(fwd_bwd1, (p1, camera, bg, gt), 3)
            diag = jax.jit(lambda p, cam: render(
                p, cam, bg, config=cfg1, alive=a1.alive).n_duplicates)
            extra["m1"] = {"fwd_ms": round(t1f * 1e3, 3),
                           "fwd_bwd_ms": round(t1fb * 1e3, 3),
                           "n_gaussians": P1,
                           "n_records": int(diag(p1, camera)),
                           "dup_capacity": cfg1.dup_capacity}
            _progress("m1", extra["m1"]["fwd_ms"])
        except Exception as e:       # noqa: BLE001 - report, don't die
            print(f"1M config failed: {e}", file=sys.stderr)
            extra["m1"] = {"error": str(e)[:200]}

    # m1 first, then the LM variants, then the (3-rounds-unchanged)
    # operator microbenchmarks last: tunnel latency varies ~2x run to
    # run, so under the driver's 840-s budget the least-informative
    # sections are the ones that drop
    if variants:
        run_variant(*variants[0], 90)
    for name, lmp in variants[1:]:
        run_variant(name, lmp, 75)

    # ---- LM operators (tests/test_jvp_timing.py analog, 2x540^2) -------
    lm_cams_small = ring_camera_batch(2, lm_hw if args.quick else 540,
                                      lm_hw if args.quick else 540)
    lm_cfg = RasterConfig(dup_capacity=cfg.dup_capacity // 2,
                          max_per_tile=cfg.max_per_tile,
                          tile_chunk=cfg.tile_chunk, impl=cfg.impl,
                          live_capacity=cfg.live_capacity // 2,
                          depth_grad=False)   # LM has no depth residual

    from gslm_tpu.renderer import resolve_impl

    def residual_fn(p):
        return batch_residuals(p, lm_cams_small, bg, config=lm_cfg,
                               disable_ssim=True, alive=aux.alive)

    residual_fn_jvp = None
    if resolve_impl(lm_cfg.impl) == "pallas":
        jcfg = lm_cfg.replace(impl="pallas_jvp")

        def residual_fn_jvp(p):
            return batch_residuals(p, lm_cams_small, bg, config=jcfg,
                                   disable_ssim=True, alive=aux.alive)

    # J.v / J^T.u with the linearization traced INSIDE the jit: jitting a
    # pre-built jax.vjp closure would embed the saved residuals/kernels in
    # the program (and is how CG consumes the operators anyway — the whole
    # solve is one jitted while_loop; see solver/cg.py).
    fn_jvp = residual_fn_jvp or residual_fn
    v = jax.tree.map(jnp.ones_like, params)
    matvec = jax.jit(lambda p, vv: jax.jvp(fn_jvp, (p,), (vv,))[1])
    matvec_T = jax.jit(lambda p, uu: jax.vjp(residual_fn, p)[1](uu)[0])

    if fits("lm_operators", 60):
        t_mv = _time_calls(matvec, (params, v), max(iters // 2, 3))
        u = matvec(params, v)
        t_mvT = _time_calls(matvec_T, (params, u), max(iters // 2, 3))
        extra["lm_matvec_per_s"] = round(1.0 / t_mv, 3)
        extra["lm_matvec_T_per_s"] = round(1.0 / t_mvT, 3)
        _progress("lm_operators")

    _emit()


if __name__ == "__main__":
    sys.exit(main())
