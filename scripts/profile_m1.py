"""Stage-profile the million-Gaussian configuration (VERDICT r3 #4).

BENCH_r03 m1: fwd 460 ms / fwd+bwd 887 ms at P=2^20, 8.3M live records,
pack=8 — far from the reference's real-time envelope (README.md:14,88).
This script answers, on hardware:
  - where the time goes (preprocess, duplicate+sort, gather, forward
    kernel, backward kernel, cotangent reduction) at the m1 scale;
  - whether a lower pack (bigger HBM stream, fewer VPU issue slots per
    record) is net faster AND still fits;
  - what cull/live_capacity buy at this scale.

Usage: python scripts/profile_m1.py [--packs 8 4 2] [--rows 0 64 128 256]
                                    [--reduce scatter sortseg] [--stages]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def t_ms(fn, args, iters=3):
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

    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.ops.projection import TILE, preprocess
    from gslm_tpu.ops.rasterize_tiled import (RasterConfig, _cdiv,
                                              duplicate_sort_ranges)
    from gslm_tpu.renderer import render
    from gslm_tpu.utils.synthetic import make_camera, random_gaussians

    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", type=int, nargs="*", default=[8, 4, 2])
    ap.add_argument("--rows", type=int, nargs="*", default=[0],
                    help="chunk_rows values to sweep (0 = legacy default)")
    ap.add_argument("--reduce", nargs="*", default=["scatter"],
                    choices=["scatter", "sortseg"],
                    help="bwd_reduce variants for the fwd+bwd timing")
    ap.add_argument("--stages", action="store_true",
                    help="also run the isolated front-end stage timings")
    ap.add_argument("--fwd_only", action="store_true",
                    help="skip the fwd+bwd timing (cheap chunk_rows sweeps)")
    ap.add_argument("--bucket", type=int, default=1,
                    help="record-binning granularity in tiles (1/2/4); "
                         "capacities below are auto-scaled from the "
                         "bucket-record probe")
    args = ap.parse_args()
    packs = args.packs
    rng = np.random.default_rng(2)
    P1, H, W = 1 << 20, 1080, 1920
    params, aux = random_gaussians(rng, n=P1, capacity=P1, num_images=1,
                                   spread=1.5, scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)

    caps = {1: (10_579_968, 8_650_752)}   # r5 probe +5% (AABB/live)
    if args.bucket > 1:
        from gslm_tpu.renderer import overflow_probe_jit
        from gslm_tpu.utils.synthetic import ring_camera_batch
        pcfg = RasterConfig(dup_capacity=8, max_per_tile=8192, tile_chunk=64,
                            impl="pallas", pack=8, bucket=args.bucket)
        pout = overflow_probe_jit(params, ring_camera_batch(1, H, W),
                                  config=pcfg, alive=aux.alive,
                                  per_view=True)
        na = int(np.asarray(pout["n_aabb"])[0])
        nl = int(np.asarray(pout["n_live"])[0])
        print(f"bucket={args.bucket} records: AABB {na} live {nl}",
              flush=True)
        caps[args.bucket] = (int(na * 1.05) // 1024 * 1024 + 1024,
                             int(nl * 1.05) // 1024 * 1024 + 1024)
    dup_c, live_c = caps[args.bucket]
    for pack in packs:
        for rows in args.rows:
            for red in args.reduce:
                cfg = RasterConfig(dup_capacity=dup_c, max_per_tile=8192,
                                   tile_chunk=64, impl="pallas", pack=pack,
                                   live_capacity=live_c, chunk_rows=rows,
                                   bwd_reduce=red, bucket=args.bucket)
                try:
                    fwd = jax.jit(lambda p, cfg=cfg: render(
                        p, camera, bg, config=cfg, alive=aux.alive).render)

                    def fb(p, cfg=cfg):
                        def loss(p):
                            img = render(p, camera, bg, config=cfg,
                                         alive=aux.alive).render
                            return jnp.mean(jnp.abs(img - gt))
                        return jax.value_and_grad(loss)(p)[1].xyz
                    msg = (f"pack={pack} rows={rows:3d} {red:7s}  "
                           f"fwd {t_ms(fwd, (params,)):8.2f} ms")
                    if not args.fwd_only:
                        msg += f"   fwd+bwd {t_ms(jax.jit(fb), (params,)):8.2f} ms"
                    print(msg, flush=True)
                except Exception as e:   # noqa: BLE001 — OOM: report, go on
                    print(f"pack={pack} rows={rows} {red}  FAILED: "
                          f"{str(e)[:160]}", flush=True)

    if not args.stages:
        return

    # ---- isolated stages at m1 scale (pack-independent front-end) ------
    cfg = RasterConfig(dup_capacity=12 << 20, max_per_tile=8192,
                       tile_chunk=64, impl="pallas", pack=8,
                       live_capacity=10 << 20)
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)
    splats = jax.jit(lambda p: preprocess(
        p, camera, active_sh_degree=3, alive=aux.alive))(params)
    jax.block_until_ready(splats.mean2d)
    pre = jax.jit(lambda p: preprocess(
        p, camera, active_sh_degree=3, alive=aux.alive).mean2d)
    print(f"preprocess       {t_ms(pre, (params,)):8.2f} ms", flush=True)
    sort_fn = jax.jit(lambda s: duplicate_sort_ranges(
        s, ntx, nty, cfg.dup_capacity, view_rows=nty, cull=cfg.cull,
        live_capacity=cfg.live_capacity)[1])
    print(f"dup+sort+ranges  {t_ms(sort_fn, (splats,)):8.2f} ms", flush=True)

    diag = jax.jit(lambda p: render(p, camera, bg, config=cfg,
                                    alive=aux.alive).n_duplicates)
    n_live = int(diag(params))
    print(f"records: live={n_live} dup_capacity={cfg.dup_capacity} "
          f"live_capacity={cfg.live_capacity}", flush=True)

    Leff = cfg.eff_capacity()
    gid = jnp.asarray(rng.integers(0, P1, Leff), jnp.int32)
    for pack in packs:
        fw = 128 // pack
        rec = jnp.asarray(rng.normal(0, 1, (P1, fw)), jnp.float32)
        gath = jax.jit(lambda r, g: r[g])
        rows = Leff // pack
        gid_r = gid[:rows]
        print(f"gather pack={pack} ({rows}x{fw*pack})  "
              f"{t_ms(gath, (rec, gid_r)):8.2f} ms", flush=True)
    d10 = jnp.asarray(rng.normal(0, 1, (Leff, 10)), jnp.float32)
    scat = jax.jit(lambda d, g: jnp.zeros((P1, 10), jnp.float32).at[g].add(d))
    print(f"scatter (L,10)   {t_ms(scat, (d10, gid)):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
