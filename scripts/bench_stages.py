"""Stage breakdown of the Pallas raster pipeline on hardware (the r2
profbwd harness, extended for round-3 culling knobs).

Times, at bench shapes (131k Gaussians @1080p):
  - fwd / fwd+bwd end-to-end (cull on vs off, live_capacity on/off,
    depth_grad on/off);
  - isolated stages: duplicate+sort front-end, record gather, forward
    kernel, backward kernel, L->P cotangent scatter.

Usage: python scripts/bench_stages.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t_ms(fn, args, iters=10):
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

    rng = np.random.default_rng(0)
    n_gauss, H, W = 131_072, 1080, 1920
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=1, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    base = RasterConfig(dup_capacity=1_638_400, max_per_tile=1024,
                        tile_chunk=64, impl="pallas")

    variants = {
        "cull_off": base.replace(cull=False),
        "cull_on": base,
        "cull+live": base.replace(live_capacity=1_280_000),
        "cull+live+nodg": base.replace(live_capacity=1_280_000,
                                       depth_grad=False),
    }
    for name, cfg in variants.items():
        fwd = jax.jit(lambda p, cfg=cfg: render(
            p, camera, bg, config=cfg, alive=aux.alive).render)

        def fb(p, cfg=cfg):
            def loss(p):
                img = render(p, camera, bg, config=cfg,
                             alive=aux.alive).render
                return jnp.mean(jnp.abs(img - gt))
            return jax.value_and_grad(loss)(p)[1].xyz
        fbj = jax.jit(fb)
        out = jax.jit(lambda p, cfg=cfg: render(
            p, camera, bg, config=cfg, alive=aux.alive).n_duplicates)
        print(f"{name:16s} fwd {t_ms(fwd, (params,)):7.2f} ms   "
              f"fwd+bwd {t_ms(fbj, (params,), 5):7.2f} ms   "
              f"records {int(out(params))}", flush=True)

    # ---- isolated stages (cull+live config) -----------------------------
    cfg = variants["cull+live"]
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)
    splats = jax.jit(lambda p: preprocess(
        p, camera, active_sh_degree=3, alive=aux.alive))(params)
    jax.block_until_ready(splats.mean2d)

    pre = jax.jit(lambda p: preprocess(
        p, camera, active_sh_degree=3, alive=aux.alive).mean2d)
    print(f"preprocess       {t_ms(pre, (params,)):7.2f} ms", flush=True)

    sort_fn = jax.jit(lambda s: duplicate_sort_ranges(
        s, ntx, nty, cfg.dup_capacity, view_rows=nty, cull=cfg.cull,
        live_capacity=cfg.live_capacity)[1])
    print(f"dup+sort+ranges  {t_ms(sort_fn, (splats,)):7.2f} ms", flush=True)

    # gather + scatter costs at the live stream size
    Leff = cfg.eff_capacity()
    P = n_gauss
    gid = jnp.asarray(rng.integers(0, P, Leff), jnp.int32)
    rec = jnp.asarray(rng.normal(0, 1, (P, 128)), jnp.float32)
    gath = jax.jit(lambda r, g: r[g])
    print(f"gather (L,128)   {t_ms(gath, (rec, gid)):7.2f} ms", flush=True)
    d10 = jnp.asarray(rng.normal(0, 1, (Leff, 10)), jnp.float32)
    scat = jax.jit(lambda d, g: jnp.zeros((P, 10), jnp.float32).at[g].add(d))
    print(f"scatter (L,10)   {t_ms(scat, (d10, gid)):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
