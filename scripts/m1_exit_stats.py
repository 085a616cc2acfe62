"""How much of the m1 record stream does the forward kernel actually read?

The Pallas forward early-exits per tile once every pixel's transmittance
crosses T_EPS; the per-tile exit chunk index is saved in output row 6 for
the backward. This script reproduces the kernel invocation (same stages
as rasterize_pallas) and reads that row to quantify wasted work at the
million-Gaussian scale: the gather materializes ALL live records
(~8.3M rows, row-latency-bound) but the kernel may only composite a
fraction before exiting — if that fraction is small, per-tile record caps
(gather less) beat kernel micro-optimizations.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/m1_exit_stats.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.ops.projection import TILE, preprocess
    import gslm_tpu.ops.rasterize_pallas as rp
    from gslm_tpu.ops.rasterize_tiled import (RasterConfig, _cdiv,
                                              duplicate_sort_ranges)
    from gslm_tpu.utils.synthetic import make_camera, random_gaussians

    rng = np.random.default_rng(2)
    P1, H, W = 1 << 20, 1080, 1920
    params, aux = random_gaussians(rng, n=P1, capacity=P1, num_images=1,
                                   spread=1.5, scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    cfg = RasterConfig(dup_capacity=12 << 20, max_per_tile=8192,
                       tile_chunk=64, impl="pallas", pack=8,
                       live_capacity=10 << 20)
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)
    ntiles = ntx * nty
    ps = rp.get_spec(cfg.pack, cfg.chunk_rows)
    L = cfg.dup_capacity
    Leff = cfg.eff_capacity()
    pack = cfg.pack

    @jax.jit
    def tiles_out(p):
        """Replicates rasterize_pallas stages 1-4 (fwd only) and returns
        the raw (ntiles, 8, 256) tile rows incl. exit state rows 5/6."""
        splats = preprocess(p, camera, active_sh_degree=3, alive=aux.alive)
        order, sorted_gid, starts, ends, totals = duplicate_sort_ranges(
            splats, ntx, nty, L, view_rows=nty, cull=cfg.cull,
            live_capacity=cfg.live_capacity)
        counts = ends - starts
        P = splats.mean2d.shape[0]
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
        total_p = poffsets[-1] + pcounts[-1]
        in_seg = in_seg & (iota2 < total_p)
        orig = jnp.clip(rep[:, 1].astype(jnp.int32) + rank, 0, Leff - 1)
        gid2 = jnp.where(in_seg, sorted_gid[orig], P)
        records = jnp.concatenate([
            splats.mean2d, splats.conic, splats.opacity[:, None],
            splats.color, splats.invdepth[:, None],
            jnp.zeros((P, ps.feat - 10), jnp.float32)], axis=1)[order]
        records = jnp.concatenate(
            [records, jnp.zeros((1, ps.feat), jnp.float32)], axis=0)
        feat = records[gid2]
        feat = jnp.concatenate(
            [feat, jnp.zeros((ps.krec, ps.feat), jnp.float32)], axis=0)
        feat = feat.reshape((L2 + ps.krec) // pack, ps.row)
        n_programs = _cdiv(ntiles, rp.GROUP)
        nt_pad = n_programs * rp.GROUP
        starts_plus = jnp.concatenate(
            [poffsets.astype(jnp.int32),
             jnp.zeros((nt_pad - ntiles,), jnp.int32),
             jnp.array([ntx, nty], jnp.int32)])
        counts_pad = jnp.concatenate(
            [counts, jnp.zeros((nt_pad - ntiles,), jnp.int32)])
        tiles = rp._fwd_call(feat, starts_plus, counts_pad,
                             n_programs=n_programs, interpret=False,
                             pack=pack, chunk_rows=cfg.chunk_rows)
        return tiles[:ntiles], counts

    tiles, counts = tiles_out(params)
    counts = np.asarray(counts)
    exit_chunk = np.asarray(tiles[:, 6, 0])           # same across pixels
    nchunks = -(-counts // ps.krec)
    read = np.minimum(exit_chunk * ps.krec, counts)
    q = np.percentile(counts, [50, 90, 99, 100]).astype(int)
    print(f"per-tile records: p50={q[0]} p90={q[1]} p99={q[2]} max={q[3]} "
          f"total={counts.sum()}", flush=True)
    print(f"records READ before exit: {int(read.sum())} "
          f"({100.0 * read.sum() / max(counts.sum(), 1):.1f}% of live); "
          f"full-walk tiles {(exit_chunk >= nchunks).sum()}/{ntiles}",
          flush=True)
    rq = np.percentile(read, [50, 90, 99, 100]).astype(int)
    print(f"read per tile: p50={rq[0]} p90={rq[1]} p99={rq[2]} max={rq[3]}",
          flush=True)


if __name__ == "__main__":
    main()
