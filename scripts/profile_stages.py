"""Stage-by-stage A/B timing of the forward raster pipeline on the real chip.

Times successively larger prefixes of the pipeline as REAL jitted graphs
(per memory: in-jit microbenchmarks lie; only full-graph A/B is trustworthy):
  p0: preprocess only
  p1: + duplicate_sort_ranges (keys sort + histogram)
  p2: + record gather into the packed stream
  p3: full pallas forward

Also reports the record count and what a tighter per-axis/opacity-aware
rect would produce.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.projection import preprocess, TILE
from gslm_tpu.ops.rasterize_tiled import RasterConfig, duplicate_sort_ranges, _cdiv
from gslm_tpu.ops.rasterize_pallas import rasterize_pallas, _gather_records, FEAT, PACK
from gslm_tpu.utils.synthetic import make_camera, random_gaussians


from gslm_tpu.utils.profiling import timeit_ms as _timeit_ms


def timeit(fn, args, iters=10):
    return _timeit_ms(fn, args, iters=iters)


def main():
    n_gauss, H, W = 131_072, 1080, 1920
    cfg = RasterConfig(dup_capacity=1 << 21, max_per_tile=1024,
                       tile_chunk=64, impl="pallas")
    L = cfg.dup_capacity
    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=2, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)

    @jax.jit
    def p0(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        return jax.tree.map(lambda x: x.sum(), s)

    @jax.jit
    def p1(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        order, rank, starts, ends, total = duplicate_sort_ranges(s, ntx, nty, L)
        return order.sum(), rank.sum(), starts.sum(), ends.sum(), total

    @jax.jit
    def p2(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        order, rank, starts, ends, total = duplicate_sort_ranges(s, ntx, nty, L)
        P = s.mean2d.shape[0]
        records = jnp.concatenate([
            s.mean2d, s.conic, s.opacity[:, None], s.color,
            s.invdepth[:, None], jnp.zeros((P, FEAT - 10), jnp.float32),
        ], axis=1)[order]
        records = jnp.concatenate(
            [records, jnp.zeros((1, FEAT), jnp.float32)], axis=0)
        feat = _gather_records(records, rank)
        return feat.sum(), starts.sum(), ends.sum()

    @jax.jit
    def p3(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        return rasterize_pallas(s, H, W, bg, cfg)["render"].sum()

    stats = jax.jit(lambda p: _stats(p))

    def _stats(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        cur = jnp.sum(s.tile_count)
        # tighter: per-axis AABB with opacity-aware cutoff
        # (recompute conic->cov2d diag: cov = inv(conic))
        det_c = s.conic[:, 0] * s.conic[:, 2] - s.conic[:, 1] ** 2
        det_c = jnp.where(det_c > 0, det_c, 1.0)
        cxx = s.conic[:, 2] / det_c
        cyy = s.conic[:, 0] / det_c
        s2 = 2.0 * jnp.log(jnp.maximum(s.opacity * 255.0, 1.0))
        rx = jnp.sqrt(jnp.maximum(s2 * cxx, 0.0))
        ry = jnp.sqrt(jnp.maximum(s2 * cyy, 0.0))
        px, py = s.mean2d[:, 0], s.mean2d[:, 1]
        tx0 = jnp.clip((px - rx).astype(jnp.int32) // TILE, 0, ntx)
        ty0 = jnp.clip((py - ry).astype(jnp.int32) // TILE, 0, nty)
        tx1 = jnp.clip(((px + rx + TILE - 1) / TILE).astype(jnp.int32), 0, ntx)
        ty1 = jnp.clip(((py + ry + TILE - 1) / TILE).astype(jnp.int32), 0, nty)
        tight = jnp.where(s.visible & (s.opacity >= 1.0 / 255.0),
                          jnp.maximum(tx1 - tx0, 0) * jnp.maximum(ty1 - ty0, 0),
                          0)
        # per-row exact x-ranges (ellipse slice per tile row): count via
        # sum over rows of that row's x extent
        # x range at offset dy: A dx^2 + 2B dx dy + C dy^2 <= s2
        # dx in [-B dy/A +- sqrt((B^2 dy^2 - A(C dy^2 - s2)))/A]
        A, B, C = s.conic[:, 0], s.conic[:, 1], s.conic[:, 2]
        A = jnp.maximum(A, 1e-12)

        def row_extent(ty):
            ya = ty * TILE - py
            yb = (ty + 1) * TILE - py
            # closest dy to 0 in [ya, yb] and both endpoints
            def xr(dy):
                disc = B * B * dy * dy - A * (C * dy * dy - s2)
                ok = disc >= 0
                r = jnp.sqrt(jnp.maximum(disc, 0.0)) / A
                c = -B * dy / A
                return ok, c - r, c + r
            oka, la, ha = xr(ya)
            okb, lb, hb = xr(yb)
            dyc = jnp.clip(0.0, ya, yb)
            okc, lc, hc = xr(dyc)
            lo = jnp.where(oka, la, jnp.inf)
            lo = jnp.minimum(lo, jnp.where(okb, lb, jnp.inf))
            lo = jnp.minimum(lo, jnp.where(okc, lc, jnp.inf))
            hi = jnp.where(oka, ha, -jnp.inf)
            hi = jnp.maximum(hi, jnp.where(okb, hb, -jnp.inf))
            hi = jnp.maximum(hi, jnp.where(okc, hc, -jnp.inf))
            x0 = jnp.clip(((px + lo).astype(jnp.int32)) // TILE, 0, ntx)
            x1 = jnp.clip(((px + hi + TILE - 1) / TILE).astype(jnp.int32), 0, ntx)
            inrow = (ty >= ty0) & (ty < ty1) & (okc | oka | okb)
            return jnp.where(inrow, jnp.maximum(x1 - x0, 0), 0)

        exact = jnp.sum(jax.vmap(row_extent)(jnp.arange(nty)), axis=0)
        exact = jnp.where(s.visible & (s.opacity >= 1.0 / 255.0), exact, 0)
        return cur, jnp.sum(tight), jnp.sum(exact)

    cur, tight, exact = jax.device_get(stats(params))
    print(f"records: current(3sig square)={cur}  aabb+opacity={tight} "
          f"({tight/cur:.3f})  per-row-exact={exact} ({exact/cur:.3f})")

    for name, fn in [("p0 preprocess", p0), ("p1 +dup_sort_ranges", p1),
                     ("p2 +gather", p2), ("p3 full pallas fwd", p3)]:
        ms = timeit(fn, (params,))
        print(f"{name:24s} {ms:8.2f} ms")
    print(f"PACK={PACK}")


if __name__ == "__main__":
    main()
