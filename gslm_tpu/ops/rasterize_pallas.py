"""Pallas TPU tile-compositor kernel (forward path).

The production analog of the CUDA ``renderCUDA`` kernel (reference
submodule diff-gaussian-rasterization, API at
gaussian_renderer/__init__.py:91-110), sharing stages 1-3 (duplicate →
sort → ranges) with the XLA compositor (rasterize_tiled.py) and replacing
stage 4 with one Pallas program per 16x16 tile:

- splat records are pre-gathered into sorted order as one (L, 16) f32
  array, so each tile's work is a *contiguous* HBM segment — every DMA is
  coalesced (the CUDA kernel does the same via its sorted key list +
  per-CTA batched shared-memory fetch);
- each program walks its segment in chunks of K splats: a double-buffered
  DMA pipelines the next chunk while the current one composites;
- per-chunk front-to-back compositing is closed-form: the in-chunk
  transmittance prefix is a strict-lower-triangular (K, K) matmul of
  log1p(-alpha) on the MXU, carried across chunks by a running (1, 256)
  transmittance — pixels live as a flat 256-lane vector (two full VPU
  registers), never (16, 16);
- the CUDA early-exit (T < 1e-4) maps to a per-pixel ``done`` mask with a
  whole-chunk skip once every pixel saturates, preserving the exact
  termination semantics of ops/composite.py (weights after the first
  failing splat are zero; the background blends with the transmittance
  frozen at the failure point).

Outputs per tile are (8, 256) rows [r, g, b, invdepth, t_final, pad...];
background blending and canvas assembly happen outside in XLA.

The kernel is forward-only: training uses it through the custom-VJP
wrapper in rasterize_grad.py. On non-TPU backends tests run it in
interpreter mode (interpret=True) against rasterize_tiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslm_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS
from gslm_tpu.ops.projection import TILE, Splats2D
from gslm_tpu.ops.rasterize_tiled import (RasterConfig, _cdiv,
                                          duplicate_sort_ranges)

PIX = TILE * TILE          # 256 pixels per tile, flat lane layout
# Record width is one full lane tile: Mosaic requires DMA'd blocks to be
# 128-aligned in the minor dim. 10 of 128 floats carry data (v1 trade-off:
# 8x DMA volume for fully legal, coalesced copies; a packed 8-records/row
# layout can reclaim it later).
FEAT = 128
K = 256                     # splats per chunk (MXU-friendly)
OUT_ROWS = 8               # r, g, b, invd, t_final, 3x pad
GROUP = 8                  # tiles per program (amortizes grid-step overhead)


def _tile_kernel(starts_ref, counts_ref, feat_hbm, out_ref, scratch, sem):
    """One program = GROUP consecutive 16x16 tiles."""
    ntx = starts_ref[pl.num_programs(0) * GROUP]   # stashed after starts
    # hoisted out of the tile loop: pl.program_id has no lowering inside
    # lax.fori_loop bodies under interpret mode
    pid = pl.program_id(0)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

    # strict lower-triangular prefix matrix (K, K): cum_i = sum_{j<i} l_j
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (col < row).astype(jnp.float32)

    def one_tile(g, _):
        t = pid * GROUP + g
        start = starts_ref[t]
        count = counts_ref[t]
        nchunks = pl.cdiv(count, K)

        txc = ((t % ntx) * TILE).astype(jnp.float32)
        tyc = ((t // ntx) * TILE).astype(jnp.float32)
        px = txc + (lin % TILE).astype(jnp.float32)      # (1, 256)
        py = tyc + (lin // TILE).astype(jnp.float32)

        def dma(slot, chunk):
            return pltpu.make_async_copy(
                feat_hbm.at[pl.ds(start + chunk * K, K), :],
                scratch.at[slot], sem.at[slot])

        @pl.when(nchunks > 0)
        def _():
            dma(0, 0).start()

        def body(carry):
            chunk, t_run, frozen, acc = carry
            slot = chunk % 2

            @pl.when(chunk + 1 < nchunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            f = scratch[slot]                                  # (K, FEAT)

            dx = f[:, 0:1] - px                                # (K, 256)
            dy = f[:, 1:2] - py
            power = (-0.5 * (f[:, 2:3] * dx * dx + f[:, 4:5] * dy * dy)
                     - f[:, 3:4] * dx * dy)
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            in_seg = slot_ids < (count - chunk * K)
            gate = in_seg & (power <= 0.0)
            alpha = jnp.where(gate, f[:, 5:6] * jnp.exp(power), 0.0)
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            contrib = alpha >= ALPHA_MIN
            a = jnp.where(contrib, alpha, 0.0)

            l = jnp.log1p(-a)                                  # (K, 256)
            cum = jax.lax.dot_general(tri, l, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            t_before = t_run * jnp.exp(cum)                    # (K, 256)
            t_after = t_before * (1.0 - a)

            done = frozen > 0.0                                # (1, 256)
            ok = contrib & (t_after >= T_EPS) & ~done
            w = jnp.where(ok, a * t_before, 0.0)               # (K, 256)

            # first T<eps crossing freezes the background transmittance
            fail = contrib & (t_after < T_EPS) & ~done
            t_cand = jnp.max(jnp.where(fail, t_before, 0.0), axis=0,
                             keepdims=True)
            frozen = jnp.where(done, frozen, t_cand)

            rgb_i = jax.lax.dot_general(
                w, f[:, 6:10], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (256, 4)
            acc = acc + rgb_i.T                                # (4, 256)
            t_run = t_run * jnp.exp(jnp.sum(l, axis=0, keepdims=True))
            return chunk + 1, t_run, frozen, acc

        def cond(carry):
            chunk, t_run, frozen, _ = carry
            live = jnp.any((frozen <= 0.0) & (t_run >= T_EPS))
            return (chunk < nchunks) & live

        t_run0 = jnp.ones((1, PIX), jnp.float32)
        frozen0 = jnp.zeros((1, PIX), jnp.float32)
        acc0 = jnp.zeros((4, PIX), jnp.float32)
        last, t_run, frozen, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_run0, frozen0, acc0))

        # early exit leaves the prefetched next-chunk DMA in flight; drain
        # it so its semaphore can't leak into the next tile/grid step
        @pl.when((last > 0) & (last < nchunks))
        def _():
            dma(last % 2, last).wait()

        t_final = jnp.where(frozen > 0.0, frozen, t_run)
        out_ref[g, 0:4, :] = acc
        out_ref[g, 4:5, :] = t_final
        out_ref[g, 5:8, :] = jnp.zeros((3, PIX), jnp.float32)
        return 0

    jax.lax.fori_loop(0, GROUP, one_tile, 0)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "config", "interpret"))
def rasterize_pallas(splats: Splats2D, height: int, width: int,
                     bg: jnp.ndarray, config: RasterConfig,
                     interpret: bool = False) -> dict:
    """Same contract as rasterize_tiled (render/invdepth/diagnostics)."""
    L = config.dup_capacity
    ntx, nty = _cdiv(width, TILE), _cdiv(height, TILE)
    ntiles = ntx * nty

    sorted_gid, starts, ends, total = duplicate_sort_ranges(
        splats, ntx, nty, L)
    counts = ends - starts

    # pre-gather sorted splat records: one coalesced (L, 16) stream; K
    # zero-opacity pad rows absorb the last chunk's over-read
    feat = jnp.concatenate([
        splats.mean2d,                      # 0:2
        splats.conic,                       # 2:5
        splats.opacity[:, None],            # 5
        splats.color,                       # 6:9
        splats.invdepth[:, None],           # 9
        jnp.zeros((splats.mean2d.shape[0], FEAT - 10), jnp.float32),
    ], axis=1)[sorted_gid]
    feat = jnp.concatenate([feat, jnp.zeros((K, FEAT), jnp.float32)], axis=0)

    # pad the tile axis to a GROUP multiple (count 0 => tile renders bg),
    # and stash ntx after the starts so the kernel can derive tile coords
    n_programs = _cdiv(ntiles, GROUP)
    nt_pad = n_programs * GROUP
    starts_plus = jnp.concatenate(
        [starts, jnp.zeros((nt_pad - ntiles,), jnp.int32),
         jnp.array([ntx], jnp.int32)])
    counts_pad = jnp.concatenate(
        [counts, jnp.zeros((nt_pad - ntiles,), jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((GROUP, OUT_ROWS, PIX),
                               lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K, FEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    tiles = pl.pallas_call(
        _tile_kernel,
        out_shape=jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * L * PIX, bytes_accessed=(L + K) * FEAT * 4,
            transcendentals=2 * L * PIX),
    )(starts_plus, counts_pad, feat)
    tiles = tiles[:ntiles]

    def assemble(rows, c):
        x = rows.reshape(nty, ntx, c, TILE, TILE)
        canvas = x.transpose(2, 0, 3, 1, 4).reshape(c, nty * TILE, ntx * TILE)
        return canvas[:, :height, :width]

    rgb = assemble(tiles[:, 0:3, :].reshape(ntiles, 3, TILE, TILE), 3)
    invd = assemble(tiles[:, 3:4, :].reshape(ntiles, 1, TILE, TILE), 1)
    t_final = assemble(tiles[:, 4:5, :].reshape(ntiles, 1, TILE, TILE), 1)
    return {
        "render": rgb + t_final * bg[:, None, None],
        "invdepth": invd,
        "n_duplicates": total,
        "overflow": (total > L).astype(jnp.int32),
        "max_tile_load": jnp.max(counts),
    }
