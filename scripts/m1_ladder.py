"""Readback-forced stage ladder for the m1 forward (where do 460 ms go?).

Pure-XLA programs over the axon tunnel can return from block_until_ready
before real execution (verify-skill r4 note), so every rung here forces a
SCALAR READBACK (float(...)) — the host value cannot exist before the
program ran. Rungs are cumulative prefixes of the real forward:

  r0 preprocess            -> sum(mean2d)
  r1 + cell masks          -> sum(nlive)
  r2 + duplicate+sort      -> sum(rank[::4096])
  r3 + gather into stream  -> sum(feat[::4096, :])
  r4 full pallas forward   -> sum(render)

Deltas between rungs bound each stage (XLA may fuse differently per rung;
treat as indicative, the r4 rung is the ground truth total).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/m1_ladder.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t_ms(fn, args, iters=3):
    out = fn(*args)          # compile + warm
    float(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            v = float(fn(*args))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.ops.projection import TILE, preprocess
    import gslm_tpu.ops.rasterize_pallas as rp
    from gslm_tpu.ops.rasterize_tiled import (RasterConfig, _cdiv,
                                              _cell_masks,
                                              duplicate_sort_ranges)
    from gslm_tpu.renderer import render
    from gslm_tpu.utils.synthetic import make_camera, random_gaussians

    rng = np.random.default_rng(2)
    P1, H, W = 1 << 20, 1080, 1920
    params, aux = random_gaussians(rng, n=P1, capacity=P1, num_images=1,
                                   spread=1.5, scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    cfg = RasterConfig(dup_capacity=10_579_968, max_per_tile=8192,
                       tile_chunk=64, impl="pallas", pack=8,
                       live_capacity=8_650_752)
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)
    ntiles = ntx * nty
    ps = rp.get_spec(cfg.pack, cfg.chunk_rows)
    L, Leff, pack = cfg.dup_capacity, cfg.eff_capacity(), cfg.pack

    @jax.jit
    def r0(p):
        sp = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        return jnp.sum(sp.mean2d)

    @jax.jit
    def r1(p):
        sp = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        cwb = max(_cdiv(ntx, 8).bit_length(), 1)
        *_, nlive = _cell_masks(sp, nty, cwb)
        return jnp.sum(nlive) + jnp.sum(sp.mean2d[:, 0])

    @jax.jit
    def r2(p):
        sp = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        _, rank, starts, ends, _ = duplicate_sort_ranges(
            sp, ntx, nty, L, view_rows=nty, cull=cfg.cull,
            live_capacity=cfg.live_capacity)
        return (jnp.sum(rank[::4096]) + jnp.sum(ends - starts)).astype(
            jnp.float32)

    def build_feat(p):
        sp = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        order, sorted_gid, starts, ends, _ = duplicate_sort_ranges(
            sp, ntx, nty, L, view_rows=nty, cull=cfg.cull,
            live_capacity=cfg.live_capacity)
        counts = ends - starts
        P = sp.mean2d.shape[0]
        pcounts = ((counts + pack - 1) // pack) * pack
        poffsets = jnp.cumsum(pcounts) - pcounts
        L2 = Leff + ntiles * pack
        tile_pack = jnp.stack([
            poffsets.astype(jnp.float32), starts.astype(jnp.float32),
            counts.astype(jnp.float32),
            jnp.zeros_like(poffsets, jnp.float32)], axis=1)
        rep = jnp.repeat(tile_pack, pcounts, axis=0, total_repeat_length=L2)
        iota2 = jnp.arange(L2, dtype=jnp.int32)
        rank = iota2 - rep[:, 0].astype(jnp.int32)
        in_seg = rank < rep[:, 2].astype(jnp.int32)
        in_seg = in_seg & (iota2 < poffsets[-1] + pcounts[-1])
        orig = jnp.clip(rep[:, 1].astype(jnp.int32) + rank, 0, Leff - 1)
        gid2 = jnp.where(in_seg, sorted_gid[orig], P)
        records = jnp.concatenate([
            sp.mean2d, sp.conic, sp.opacity[:, None], sp.color,
            sp.invdepth[:, None],
            jnp.zeros((P, ps.feat - 10), jnp.float32)], axis=1)[order]
        records = jnp.concatenate(
            [records, jnp.zeros((1, ps.feat), jnp.float32)], axis=0)
        return records[gid2]

    @jax.jit
    def r3(p):
        feat = build_feat(p)
        return jnp.sum(feat[::4096, :])

    @jax.jit
    def r4(p):
        return jnp.sum(render(p, camera, jnp.zeros(3, jnp.float32),
                              config=cfg, alive=aux.alive).render)

    for name, fn in (("r0 preprocess", r0), ("r1 +cells", r1),
                     ("r2 +dup+sort", r2), ("r3 +gather", r3),
                     ("r4 full fwd", r4)):
        print(f"{name:16s} {t_ms(fn, (params,)):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
