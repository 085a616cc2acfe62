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


def strict_prefix_sum(x):
    """Strict prefix sum along axis 0 of (K, PIX) via log-shift adds
    (Hillis-Steele): 8 sublane rolls instead of a (K, K) MXU matmul —
    measured faster and exacter (pure f32 adds) than the triangular
    matmul at Precision.HIGHEST."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = x
    sh = 1
    while sh < x.shape[0]:
        s = s + jnp.where(row >= sh, pltpu.roll(s, sh, axis=0), 0.0)
        sh *= 2
    return s - x


def strict_suffix_sum(x):
    """Strict suffix sum along axis 0: s_i = sum_{j>i} x_j."""
    k = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = x
    sh = 1
    while sh < k:
        s = s + jnp.where(row < k - sh, pltpu.roll(s, k - sh, axis=0), 0.0)
        sh *= 2
    return s - x


def _tile_kernel(starts_ref, counts_ref, feat_hbm, out_ref, scratch, sem):
    """One program = GROUP consecutive 16x16 tiles."""
    ntx = starts_ref[pl.num_programs(0) * GROUP]   # stashed after starts
    # hoisted out of the tile loop: pl.program_id has no lowering inside
    # lax.fori_loop bodies under interpret mode
    pid = pl.program_id(0)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

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
            cum = strict_prefix_sum(l)
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
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)            # (256, 4)
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


def _fwd_call(feat, starts_plus, counts_pad, *, n_programs: int,
              interpret: bool):
    """Invoke the forward compositor; returns (n_programs*GROUP, 8, 256)."""
    nt_pad = n_programs * GROUP
    L_pad = feat.shape[0]
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
    return pl.pallas_call(
        _tile_kernel,
        out_shape=jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * L_pad * PIX, bytes_accessed=L_pad * FEAT * 4,
            transcendentals=2 * L_pad * PIX),
    )(starts_plus, counts_pad, feat)


# ---------------------------------------------------------------------------
# Backward (VJP) kernel.
#
# Math (matching the closed-form compositor in ops/composite.py, which the
# CUDA back-to-front backward also implements): with per-splat alpha a_i,
# transmittance T_i = prod_{j<i}(1 - a_j), weight w_i = ok_i a_i T_i, and
# per-pixel output cotangents (g_rgb, g_invd, g_T):
#
#   dL/dw_i = sum_c g_c color_ic + g_invd invd_i           (:= dw_i)
#   dL/da_i = [pre-freeze_i] (ok_i dw_i T_i - S_i / (1 - a_i))
#   S_i      = sum_{j>i} ok_j dw_j w_j + g_T t_final        (suffix sum)
#
# Key structural fact: T only decreases at contributing splats, so
# "pixel already frozen before splat i"  <=>  T_i < T_EPS. That removes
# every piece of forward state from the backward walk — pass 1 only
# accumulates the total log-transmittance; pass 2 walks the chunks in
# REVERSE, recovering the chunk-start transmittance by division (exactly
# the CUDA backward's T /= (1-alpha) trick, but chunked + deterministic)
# and carrying the suffix accumulator S. The frozen-background cotangent
# enters S exactly at the first-fail splat (t_after < eps <= t_before).
# ---------------------------------------------------------------------------


def _tile_bwd_kernel(starts_ref, counts_ref, feat_hbm, gtiles_ref, dfeat_hbm,
                     rscratch, gscratch, rsem, wsem):
    ntx = starts_ref[pl.num_programs(0) * GROUP]
    pid = pl.program_id(0)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

    def one_tile(g, _):
        t = pid * GROUP + g
        start = starts_ref[t]
        count = counts_ref[t]
        nchunks = pl.cdiv(count, K)

        txc = ((t % ntx) * TILE).astype(jnp.float32)
        tyc = ((t // ntx) * TILE).astype(jnp.float32)
        px = txc + (lin % TILE).astype(jnp.float32)
        py = tyc + (lin // TILE).astype(jnp.float32)

        g_r = gtiles_ref[g, 0:1, :]
        g_gg = gtiles_ref[g, 1:2, :]
        g_b = gtiles_ref[g, 2:3, :]
        g_i = gtiles_ref[g, 3:4, :]
        g_T = gtiles_ref[g, 4:5, :]

        def rdma(slot, chunk):
            return pltpu.make_async_copy(
                feat_hbm.at[pl.ds(start + chunk * K, K), :],
                rscratch.at[slot], rsem.at[slot])

        def wdma(slot, chunk):
            return pltpu.make_async_copy(
                gscratch.at[slot],
                dfeat_hbm.at[pl.ds(start + chunk * K, K), :], wsem.at[slot])

        def chunk_geom(f, chunk):
            """Recompute alphas for a chunk (shared by both passes)."""
            dx = f[:, 0:1] - px
            dy = f[:, 1:2] - py
            power = (-0.5 * (f[:, 2:3] * dx * dx + f[:, 4:5] * dy * dy)
                     - f[:, 3:4] * dx * dy)
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            in_seg = slot_ids < (count - chunk * K)
            gate = in_seg & (power <= 0.0)
            expp = jnp.where(gate, jnp.exp(power), 0.0)
            a_raw = f[:, 5:6] * expp
            a = jnp.minimum(a_raw, ALPHA_MAX)
            contrib = a >= ALPHA_MIN
            a = jnp.where(contrib, a, 0.0)
            return dx, dy, expp, a_raw, a, contrib

        # ---- pass 1 (forward): total log-transmittance ------------------
        @pl.when(nchunks > 0)
        def _():
            rdma(0, 0).start()

        def p1_body(chunk, lsum):
            slot = chunk % 2

            @pl.when(chunk + 1 < nchunks)
            def _():
                rdma((chunk + 1) % 2, chunk + 1).start()

            rdma(slot, chunk).wait()
            _, _, _, _, a, _ = chunk_geom(rscratch[slot], chunk)
            return lsum + jnp.sum(jnp.log1p(-a), axis=0, keepdims=True)

        lsum = jax.lax.fori_loop(0, nchunks, p1_body,
                                 jnp.zeros((1, PIX), jnp.float32))
        t_end = jnp.exp(lsum)

        # ---- pass 2 (reverse): suffix accumulator + grads ---------------
        @pl.when(nchunks > 0)
        def _():
            rdma((nchunks - 1) % 2, nchunks - 1).start()

        def p2_body(i, carry):
            s_acc, lsum_upto = carry
            chunk = nchunks - 1 - i
            slot = chunk % 2

            @pl.when(chunk - 1 >= 0)
            def _():
                rdma((chunk - 1) % 2, chunk - 1).start()

            rdma(slot, chunk).wait()
            f = rscratch[slot]
            dx, dy, expp, a_raw, a, contrib = chunk_geom(f, chunk)

            # chunk-start transmittance recovered in LOG space: subtracting
            # this chunk's log-sum from the carried prefix stays <= 0, so
            # exp never overflows — a t_tail/prod division would hit
            # 0 * inf = NaN once a chunk fully saturates (sum l < -88)
            l = jnp.log1p(-a)
            lsum_c = jnp.sum(l, axis=0, keepdims=True)
            lsum_prefix = jnp.minimum(lsum_upto - lsum_c, 0.0)
            cum = lsum_prefix + strict_prefix_sum(l)
            t_before = jnp.exp(cum)
            t_after = t_before * (1.0 - a)

            ok = contrib & (t_after >= T_EPS)
            w = jnp.where(ok, a * t_before, 0.0)
            dw = (f[:, 6:7] * g_r + f[:, 7:8] * g_gg + f[:, 8:9] * g_b
                  + f[:, 9:10] * g_i)

            first_fail = contrib & (t_after < T_EPS) & (t_before >= T_EPS)
            q = jnp.where(ok, dw * w, 0.0) \
                + jnp.where(first_fail, g_T * t_before, 0.0)
            s_i = s_acc + strict_suffix_sum(q)

            pre_freeze = contrib & (t_before >= T_EPS)
            da = jnp.where(
                pre_freeze,
                jnp.where(ok, dw * t_before, 0.0) - s_i / (1.0 - a), 0.0)

            # chain to record fields; alpha clip is straight-through
            # (composite.clip_alpha), so d a/d power = a_raw everywhere
            dpow = da * a_raw
            gbuf = jnp.concatenate([
                jnp.sum(dpow * -(f[:, 2:3] * dx + f[:, 3:4] * dy), axis=1,
                        keepdims=True),                       # d mean_x
                jnp.sum(dpow * -(f[:, 4:5] * dy + f[:, 3:4] * dx), axis=1,
                        keepdims=True),                       # d mean_y
                jnp.sum(dpow * (-0.5 * dx * dx), axis=1, keepdims=True),
                jnp.sum(dpow * (-dx * dy), axis=1, keepdims=True),
                jnp.sum(dpow * (-0.5 * dy * dy), axis=1, keepdims=True),
                jnp.sum(da * expp, axis=1, keepdims=True),    # d opacity
                jnp.sum(w * g_r, axis=1, keepdims=True),      # d color r
                jnp.sum(w * g_gg, axis=1, keepdims=True),
                jnp.sum(w * g_b, axis=1, keepdims=True),
                jnp.sum(w * g_i, axis=1, keepdims=True),      # d invdepth
                jnp.zeros((K, FEAT - 10), jnp.float32),
            ], axis=1)

            # double-buffered writes: the slot's previous write (2 reverse
            # steps ago) must land before the scratch is overwritten
            @pl.when(i >= 2)
            def _():
                wdma(i % 2, chunk + 2).wait()
            gscratch[i % 2] = gbuf
            wdma(i % 2, chunk).start()

            s_acc = s_acc + jnp.sum(q, axis=0, keepdims=True)
            return s_acc, lsum_prefix

        s0 = jnp.where(t_end >= T_EPS, g_T * t_end, 0.0)
        jax.lax.fori_loop(0, nchunks, p2_body,
                          (s0, lsum))

        # drain outstanding grad writes
        @pl.when(nchunks >= 2)
        def _():
            wdma(nchunks % 2, 1).wait()

        @pl.when(nchunks >= 1)
        def _():
            wdma((nchunks - 1) % 2, 0).wait()
        return 0

    jax.lax.fori_loop(0, GROUP, one_tile, 0)


def _bwd_call(feat, starts_plus, counts_pad, gtiles, *, n_programs: int,
              interpret: bool):
    """Invoke the backward compositor; returns dfeat with feat's shape."""
    L_pad = feat.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((GROUP, OUT_ROWS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, K, FEAT), jnp.float32),
            pltpu.VMEM((2, K, FEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        _tile_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((L_pad, FEAT), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=80 * L_pad * PIX, bytes_accessed=3 * L_pad * FEAT * 4,
            transcendentals=4 * L_pad * PIX),
    )(starts_plus, counts_pad, feat, gtiles)


@functools.lru_cache(maxsize=None)
def _make_composite(n_programs: int, ntiles: int, interpret: bool,
                    mode: str):
    """Composite-tiles function with the requested differentiation rule.

    mode="vjp": jax.custom_vjp via the backward kernel (training / J^T u).
    mode="jvp": jax.custom_jvp via the fused tangent kernel (LM J v).
    JAX does not allow both rules on one function, so the LM operators pick
    the variant per matvec direction (solver/operators.py).
    """
    kw = dict(n_programs=n_programs, interpret=interpret)
    if mode == "vjp":
        @jax.custom_vjp
        def comp(feat, starts_plus, counts_pad):
            return _fwd_call(feat, starts_plus, counts_pad, **kw)

        def fwd(feat, starts_plus, counts_pad):
            return comp(feat, starts_plus, counts_pad), \
                (feat, starts_plus, counts_pad)

        def bwd(res, gtiles):
            feat, starts_plus, counts_pad = res
            dfeat = _bwd_call(feat, starts_plus, counts_pad, gtiles, **kw)
            # rows past the last valid entry are never written by any tile:
            # scrub uninitialized HBM (which may hold NaNs) with where — a
            # mask *multiply* would propagate NaN*0=NaN into the gather's
            # scatter-add and poison real parameter gradients
            total = starts_plus[ntiles - 1] + counts_pad[ntiles - 1]
            valid = jnp.arange(dfeat.shape[0], dtype=jnp.int32) < total
            dfeat = jnp.where(valid[:, None], dfeat, 0.0)
            return dfeat, None, None

        comp.defvjp(fwd, bwd)
        return comp
    if mode == "jvp":
        from gslm_tpu.ops.rasterize_pallas_jvp import make_jvp_composite
        return make_jvp_composite(n_programs, interpret, _fwd_call)
    return functools.partial(_fwd_call, **kw)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "config", "interpret",
                                    "mode"))
def rasterize_pallas(splats: Splats2D, height: int, width: int,
                     bg: jnp.ndarray, config: RasterConfig,
                     interpret: bool = False, mode: str = "vjp") -> dict:
    """Same contract as rasterize_tiled (render/invdepth/diagnostics)."""
    L = config.dup_capacity
    ntx, nty = _cdiv(width, TILE), _cdiv(height, TILE)
    ntiles = ntx * nty

    sorted_gid, starts, ends, total = duplicate_sort_ranges(
        splats, ntx, nty, L)
    counts = ends - starts

    # pre-gather sorted splat records: one coalesced (L, FEAT) stream; K
    # zero-opacity pad rows absorb the last chunk's over-read. The gather
    # is differentiable (its VJP is XLA's scatter-add back to the P axis),
    # which routes the kernel's per-entry cotangents to the Gaussians.
    # Entries past ``total`` carry the sentinel tile id, sort past every
    # tile segment, and are never read — no forward masking needed (the
    # custom-VJP bwd scrubs their never-written cotangent rows instead).
    records = jnp.concatenate([
        splats.mean2d,                      # 0:2
        splats.conic,                       # 2:5
        splats.opacity[:, None],            # 5
        splats.color,                       # 6:9
        splats.invdepth[:, None],           # 9
        jnp.zeros((splats.mean2d.shape[0], FEAT - 10), jnp.float32),
    ], axis=1)
    feat = records[sorted_gid]
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

    comp = _make_composite(n_programs, ntiles, interpret, mode)
    tiles = comp(feat, starts_plus, counts_pad)
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
