"""Stage-profile the full Adam training iteration at the bench shapes.

BENCH_r03: adam_iter_ms 281.4 vs plain fwd+bwd 84.0 — ~197 ms of
non-raster cost (VERDICT r3 weak #3). This script times each suspect in
isolation at 131k Gaussians / 1080p on the chip:

  render fwd / fwd+bwd (L1 only)     — the raster floor
  ssim_map fwd / ssim loss fwd+bwd   — 11x11 depthwise convs (5 fwd,
                                       +backward convs under grad)
  full scalar_training_loss fwd+bwd  — L1 + SSIM + exposure plumbing
  + depth regularization             — invdepth L1 term
  + mean2d grad plumbing             — the (C,2) zeros argument
  full train_step                    — + Adam update + densify stats

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_adam.py
"""
from __future__ import annotations

import time

import numpy as np


def timeit(fn, args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gslm_tpu import config as cfg_mod
    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.optim import init_adam
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.ops.ssim import ssim_map
    from gslm_tpu.renderer import render
    from gslm_tpu.train import scalar_training_loss, train_step
    from gslm_tpu.utils.synthetic import (make_camera, random_gaussians,
                                          ring_camera_batch)

    n_gauss, H, W = 131_072, 1080, 1920
    cfg = RasterConfig(dup_capacity=1_638_400, max_per_tile=1024,
                       tile_chunk=64, impl="auto",
                       live_capacity=1_280_000)
    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=50, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    cam1 = ring_camera_batch(1, H, W)

    rows = []

    def rec(name, ms):
        rows.append((name, ms))
        print(f"{name:34s} {ms:9.3f} ms", flush=True)

    # raster floor
    fwd = jax.jit(lambda p: render(p, camera, bg, config=cfg,
                                   alive=aux.alive).render)
    rec("render fwd", timeit(fwd, (params,)))

    def l1_loss(p):
        img = render(p, camera, bg, config=cfg, alive=aux.alive).render
        return jnp.mean(jnp.abs(img - gt))

    rec("render fwd+bwd (L1)",
        timeit(jax.jit(jax.grad(l1_loss)), (params,)))

    # SSIM in isolation (image-level, no raster)
    img0 = fwd(params)
    rec("ssim_map fwd", timeit(jax.jit(
        lambda a, b: ssim_map(a, b)), (img0, gt)))
    rec("ssim scalar fwd+bwd (no raster)", timeit(jax.jit(
        jax.grad(lambda a: jnp.mean(ssim_map(a, gt)))), (img0,)))

    def ssim_through_raster(p):
        img = render(p, camera, bg, config=cfg, alive=aux.alive).render
        return 0.8 * jnp.mean(jnp.abs(img - gt)) \
            + 0.2 * (1 - jnp.mean(ssim_map(img, gt)))

    rec("render+L1+SSIM fwd+bwd",
        timeit(jax.jit(jax.grad(ssim_through_raster)), (params,)))

    # full scalar_training_loss (adds exposure/batch plumbing)
    def stl(p):
        loss, _ = scalar_training_loss(
            p, cam1, bg, config=cfg, lambda_dssim=0.2,
            use_trained_exp=False, active_sh_degree=3, alive=aux.alive,
            mean2d_offset=None)
        return loss

    rec("scalar_training_loss fwd+bwd",
        timeit(jax.jit(jax.grad(stl)), (params,)))

    # + mean2d plumbing
    def stl_m2d(p, m2d):
        loss, _ = scalar_training_loss(
            p, cam1, bg, config=cfg, lambda_dssim=0.2,
            use_trained_exp=False, active_sh_degree=3, alive=aux.alive,
            mean2d_offset=m2d)
        return loss

    m2d0 = jnp.zeros((params.capacity, 2), jnp.float32)
    rec("+ mean2d grad plumbing",
        timeit(jax.jit(jax.grad(stl_m2d, argnums=(0, 1))),
               (params, m2d0)))

    # + depth-L1 term (train.py's depth regularization with traced weight)
    def stl_depth(p, m2d, dw):
        loss, info = scalar_training_loss(
            p, cam1, bg, config=cfg, lambda_dssim=0.2,
            use_trained_exp=False, active_sh_degree=3, alive=aux.alive,
            mean2d_offset=m2d)
        out = info["render"]
        npix = jnp.maximum(jnp.sum(cam1.depth_mask), 1.0)
        depth_l1 = jnp.sum(jnp.abs(out.invdepth - cam1.invdepth_gt)
                           * cam1.depth_mask) / npix
        return loss + dw * depth_l1

    rec("+ depth-L1 (traced weight 0)",
        timeit(jax.jit(jax.grad(stl_depth, argnums=(0, 1))),
               (params, m2d0, jnp.float32(0.0))))

    # full train_step
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    adam_args = (params, aux, opt_state, cam1, bg, jnp.int32(100),
                 jnp.float32(1.0), jnp.float32(0.0))
    adam_kw = dict(rcfg=cfg, opt=opt, active_sh_degree=3, use_exp=False,
                   sparse_adam=False, update_stats=True)
    rec("full train_step",
        timeit(lambda *a: train_step(*a, **adam_kw), adam_args))

    print("\nstage deltas:")
    for i in range(1, len(rows)):
        print(f"  {rows[i][0]:32s} +{rows[i][1] - rows[i - 1][1]:8.3f} ms")


if __name__ == "__main__":
    main()
