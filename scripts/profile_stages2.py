"""Sub-stage A/B timing: preprocess internals + dup_sort internals.

All timed graphs return device arrays (not scalars) — axon's
block_until_ready is unreliable on scalar-only outputs.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.projection import preprocess, TILE, compute_cov3d
from gslm_tpu.ops.rasterize_tiled import RasterConfig, duplicate_sort_ranges, _cdiv
from gslm_tpu.ops.rasterize_pallas import rasterize_pallas
from gslm_tpu.utils.synthetic import make_camera, random_gaussians


from gslm_tpu.utils.profiling import timeit_ms as _timeit_ms


def timeit(fn, args, iters=10):
    return _timeit_ms(fn, args, iters=iters)


def main():
    n_gauss, H, W = 131_072, 1080, 1920
    L = 1 << 21
    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=2, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)

    white = jnp.ones((n_gauss, 3), jnp.float32)

    @jax.jit
    def pre_nosh(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive,
                       color_override=white)
        return s.mean2d, s.conic, s.opacity, s.tile_count

    @jax.jit
    def pre_full(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        return s.mean2d, s.conic, s.color, s.opacity, s.tile_count

    @jax.jit
    def pre_cov(p):
        return compute_cov3d(p.get_scaling(), p.rotation)

    splats = jax.jit(lambda p: preprocess(p, camera, active_sh_degree=3,
                                          alive=aux.alive))(params)
    splats = jax.block_until_ready(splats)
    total = int(jnp.sum(splats.tile_count))
    print(f"total records (tight rects): {total}  L={L}")

    @jax.jit
    def d0(s):
        # P-level depth sort only
        P = s.mean2d.shape[0]
        depth_key = jnp.where(s.visible, s.depth, jnp.inf)
        out = jax.lax.sort(
            (depth_key, jnp.arange(P, dtype=jnp.int32), s.tile_count,
             s.rect_min[:, 0], s.rect_min[:, 1],
             s.rect_max[:, 0], s.rect_max[:, 1]),
            num_keys=1, is_stable=True)
        return out

    @jax.jit
    def d1(s):
        # + repeat
        out = d0.__wrapped__(s)
        _, order, counts, x0, y0, x1, y1 = out
        offsets = jnp.cumsum(counts) - counts
        packed = jnp.stack([
            offsets.astype(jnp.float32),
            (y0 * ntx + x0).astype(jnp.float32),
            jnp.maximum(x1 - x0, 1).astype(jnp.float32),
            jnp.arange(counts.shape[0], dtype=jnp.float32),
        ], axis=1)
        rep = jnp.repeat(packed, counts, axis=0, total_repeat_length=L)
        return rep

    @jax.jit
    def d2(s):
        # + key construction + keys-only sort
        rep = d1.__wrapped__(s)
        iota = jnp.arange(L, dtype=jnp.int32)
        counts = s.tile_count  # just for total
        total = jnp.sum(counts)
        entry_valid = iota < total
        r = iota - rep[:, 0].astype(jnp.int32)
        w = rep[:, 2].astype(jnp.int32)
        dy = r // w
        tile = rep[:, 1].astype(jnp.int32) + dy * ntx + (r - dy * w)
        B = max((s.mean2d.shape[0] - 1).bit_length(), 1)
        ntiles = ntx * nty
        key = jnp.where(entry_valid,
                        (tile << B) | rep[:, 3].astype(jnp.int32),
                        jnp.int32(ntiles << B))
        (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        return skey

    @jax.jit
    def d3(s):
        return duplicate_sort_ranges(s, ntx, nty, L)

    for name, fn in [("pre no-SH", pre_nosh), ("pre full", pre_full),
                     ("pre cov3d only", pre_cov)]:
        print(f"{name:22s} {timeit(fn, (params,)):8.2f} ms", flush=True)
    for name, fn in [("d0 P-sort", d0), ("d1 +repeat", d1),
                     ("d2 +keysort", d2), ("d3 full dup_sort", d3)]:
        print(f"{name:22s} {timeit(fn, (splats,)):8.2f} ms", flush=True)

    cfg = RasterConfig(dup_capacity=L, max_per_tile=1024,
                       tile_chunk=64, impl="pallas")

    @jax.jit
    def full(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        return rasterize_pallas(s, H, W, bg, cfg)["render"]

    print(f"{'full fwd (image out)':22s} {timeit(full, (params,)):8.2f} ms",
          flush=True)

    cfg2 = RasterConfig(dup_capacity=1518848, max_per_tile=1024,
                        tile_chunk=64, impl="pallas")

    @jax.jit
    def full2(p):
        s = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        return rasterize_pallas(s, H, W, bg, cfg2)["render"]

    print(f"{'full fwd (L=1.5M)':22s} {timeit(full2, (params,)):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
