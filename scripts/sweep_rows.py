"""Sweep pack x chunk_rows at bench scale (131k @1080p) on hardware.

The pack=1 default is fastest per-record on v5e but moves 8x the HBM
stream; pack=8 shrinks the stream but the default 16-row DMA chunks
starve the VPU ((16,256) sub-arrays per packed slot + tiny DMAs). This
sweep answers whether raising ``chunk_rows`` closes the pack>1 kernel
gap — if it does, the LM window/val renders (currently pack=8 for
footprint) and the m1 configuration both get the fast kernel AND the
small stream (VERDICT r5 targets #2/#3/#4).

Usage: python scripts/sweep_rows.py [--packs 1 8] [--rows 0 64 128 256]
                                    [--bwd] [--n 131072]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t_ms(fn, args, iters=5):
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
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import render
    from gslm_tpu.utils.synthetic import make_camera, random_gaussians

    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--rows", type=int, nargs="*", default=[0, 64, 128, 256])
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--n", type=int, default=131_072)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    H, W = 1080, 1920
    params, aux = random_gaussians(rng, n=args.n, capacity=args.n,
                                   num_images=1, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)

    for pack in args.packs:
        for rows in args.rows:
            if rows and rows * pack < 64:
                continue   # chunks below 64 records: pointless
            cfg = RasterConfig(dup_capacity=1_638_400, max_per_tile=1024,
                               tile_chunk=64, impl="pallas", pack=pack,
                               live_capacity=1_280_000, chunk_rows=rows)
            try:
                fwd = jax.jit(lambda p, cfg=cfg: render(
                    p, camera, bg, config=cfg, alive=aux.alive).render)
                msg = (f"pack={pack} rows={rows:3d}  "
                       f"fwd {t_ms(fwd, (params,)):7.2f} ms")
                if args.bwd:
                    def fb(p, cfg=cfg):
                        def loss(p):
                            img = render(p, camera, bg, config=cfg,
                                         alive=aux.alive).render
                            return jnp.mean(jnp.abs(img - gt))
                        return jax.value_and_grad(loss)(p)[1].xyz
                    msg += f"   fwd+bwd {t_ms(jax.jit(fb), (params,)):7.2f} ms"
                print(msg, flush=True)
            except Exception as e:  # noqa: BLE001 — report, go on
                print(f"pack={pack} rows={rows}  FAILED: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
