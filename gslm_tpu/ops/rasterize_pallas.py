"""Pallas TPU tile-compositor kernels (forward + custom-VJP backward).

The production analog of the CUDA ``renderCUDA`` forward/backward kernels
(reference submodule diff-gaussian-rasterization, API at
gaussian_renderer/__init__.py:91-110), sharing stages 1-3 (duplicate →
sort → ranges) with the XLA compositor (rasterize_tiled.py) and replacing
stage 4 with one Pallas program per group of 16x16 tiles:

- splat records (16 f32 fields) are gathered into sorted order and packed
  ``config.pack`` records per 128-lane row, with every tile's segment
  padded to a row multiple — each DMA chunk is a dense, fully-aligned
  (K/pack, 128) block (Mosaic requires 128-aligned minor dims);
- each program walks its segment in chunks of K records: a double-buffered
  DMA pipelines the next chunk while the current composites;
- front-to-back compositing is closed-form: a per-row Hillis-Steele prefix
  over the per-row log1p(-alpha) sums, plus a running in-row offset,
  gives every record's transmittance; a running (1, 256) transmittance
  carries across chunks. Pixels live as a flat 256-lane vector;
- the CUDA early-exit (T < 1e-4) maps to the invariant "pixel frozen
  before record i <=> T_i < eps" (T only decreases at contributing
  records), preserving ops/composite.py semantics exactly: weights after
  the first failing record are zero and the background blends with the
  transmittance frozen at the failure point.

The backward walks the stream in REVERSE, a single pass: the forward
saves its exit-point log-transmittance sum and exit chunk index in the
spare output rows (the CUDA backward likewise reuses final_T/n_contrib
saved by its forward), so no re-walk is needed; each chunk's starting
transmittance is recovered by subtracting chunk log-sums from the carried
prefix (always <= 0: no overflow) and the suffix accumulator
S_i = sum_{j>i} ok_j dw_j w_j + g_T t_final carries across chunks.
The recovered per-record transmittances agree with the forward's to f32
rounding, not bitwise (exp/add-sub orders differ), so a threshold mask can
in principle flip at a knife edge — bounded by one ~1/255-weight record.
Chunks past the forward's early exit have exactly-zero gradients and are
zero-filled without compute. Per-record gradients DMA out and scatter-add
to Gaussians through a lane-narrowed custom VJP of the record gather.

GRADIENT-WRITE INVARIANT: the backward DMAs whole K-record chunks, so a
tile's final partial chunk writes up to K-pack zero rows into the NEXT
tile's dfeat segment. Correctness relies on the grid dimension being
sequential ("arbitrary" semantics, pinned via dimension_semantics below)
and tiles processed in ascending order — the later tile then overwrites
the spill with its own values. Do NOT mark the grid parallel (megacore)
without first narrowing the final chunk's write.

Outputs per tile are (8, 256) rows [r, g, b, invdepth, t_final, pad...];
background blending and canvas assembly happen outside in XLA. On
non-TPU backends tests run everything in interpreter mode.

Record packing (``RasterConfig.pack`` in {1, 2, 4, 8}; the
GSLM_RASTER_PACK env var only sets the default):
  pack=1: one record per 128-lane row (10 of 128 floats used). Measured
          fastest on v5e Mosaic by ~1.8x (packed lane slicing is hostile
          to the VPU issue patterns); 8x the HBM stream/footprint.
  pack=8: dense 16-float records, zero padding — 8x less DMA traffic and
          HBM footprint (million-Gaussian multi-view windows), slower.
"""

from __future__ import annotations

import functools
import os as _os

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
K = int(_os.environ.get("GSLM_RASTER_K", "128"))   # records per chunk
OUT_ROWS = 8               # r, g, b, invd, t_final, 3x pad
GROUP = 8                  # tiles per program (amortizes grid overhead)

DEFAULT_PACK = int(_os.environ.get("GSLM_RASTER_PACK", "1"))


class PackSpec:
    """Static record-packing geometry the kernels close over.

    ``rows``: VMEM rows per DMA chunk (``RasterConfig.chunk_rows``;
    default keeps the historical K-records-per-chunk so pack=1 is
    unchanged). ``krec`` = rows*pack records per chunk — at pack=8 the
    default chunk is only 16 rows = 8 KB per DMA, so raising rows
    amortizes DMA issue + loop overhead for million-Gaussian streams."""

    def __init__(self, pack: int, rows: int | None = None):
        assert pack in (1, 2, 4, 8)
        assert K % pack == 0, \
            f"GSLM_RASTER_K={K} must be a multiple of pack={pack}"
        self.pack = pack
        self.feat = 128 // pack      # f32 fields per record slot (10 used)
        self.row = 128
        self.rpc = rows or (K // pack)    # rows per chunk
        self.krec = self.rpc * pack       # records per chunk
        self.off = [k * self.feat for k in range(pack)]


@functools.lru_cache(maxsize=None)
def get_spec(pack: int, rows: int = 0) -> PackSpec:
    return PackSpec(pack, rows or None)


_SPECS = {p: PackSpec(p) for p in (1, 2, 4, 8)}

# Backward-compatible module constants (profiling scripts import these).
PACK = DEFAULT_PACK
FEAT = _SPECS[PACK].feat
ROW = 128
RPC = _SPECS[PACK].rpc


def strict_prefix_sum(x):
    """Strict prefix sum along axis 0 via log-shift adds (Hillis-Steele):
    sublane rolls instead of a triangular MXU matmul — faster and exact
    f32 (the matmul at Precision.HIGHEST still carries bf16-pass error)."""
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


def _sub(ps: PackSpec, f, k, j, w=1):
    """Lane slice for field j (width w) of packed sub-record k."""
    return f[:, ps.off[k] + j:ps.off[k] + j + w]


def _sub_geometry(ps: PackSpec, f, k, px, py, rank0, count_rem,
                  rect=None):
    """Alpha terms for packed sub-record k of a chunk.

    f: (rpc, 128) packed rows. rank0: in-segment rank of the chunk's first
    record. Returns dict of (rpc, 256) / (rpc, 1) arrays.

    ``rect``: (txc, tyc) scalar pixel origin of the walking tile (y
    view-local) — bucket mode only. Bucket segments hold records for
    bucket² tiles; a record's 3σ AABB rect is a hard truncation in the
    tile pipeline (the CUDA reference's duplicateWithKeys likewise never
    emits outside the rect), and alpha can exceed 1/255 just outside it,
    so bucket walks must gate contributions to the record's own rect
    (stream fields 10-13) to reproduce bucket=1 semantics (up to
    chunk-boundary f32 rounding)."""
    dx = _sub(ps, f, k, 0) - px
    dy = _sub(ps, f, k, 1) - py
    power = (-0.5 * (_sub(ps, f, k, 2) * dx * dx
                     + _sub(ps, f, k, 4) * dy * dy)
             - _sub(ps, f, k, 3) * dx * dy)
    r_local = jax.lax.broadcasted_iota(jnp.int32, (ps.rpc, 1), 0)
    in_seg = (r_local * ps.pack + k) < (count_rem - rank0)
    if rect is not None:
        txc, tyc = rect
        in_seg = in_seg & ((txc >= _sub(ps, f, k, 10))
                           & (txc < _sub(ps, f, k, 11))
                           & (tyc >= _sub(ps, f, k, 12))
                           & (tyc < _sub(ps, f, k, 13)))
    gate = in_seg & (power <= 0.0)
    expp = jnp.where(gate, jnp.exp(power), 0.0)
    a_raw = _sub(ps, f, k, 5) * expp
    a = jnp.minimum(a_raw, ALPHA_MAX)
    contrib = a >= ALPHA_MIN
    a = jnp.where(contrib, a, 0.0)
    return dict(dx=dx, dy=dy, expp=expp, a_raw=a_raw, a=a, contrib=contrib)


@jax.custom_vjp
def _gather_records(records, gid):
    """records[gid] with a lane-narrowed VJP: only fields 0:10 carry data,
    so the backward scatter-add moves 10 lanes instead of the padded row
    width (the XLA TPU scatter cost scales with row width — measured
    42 -> ~30 ms at L=2M, width 128)."""
    return records[gid]


def _gather_records_fwd(records, gid):
    return records[gid], (gid, records.shape[0], records.shape[1])


def _gather_records_bwd(res, dfeat):
    gid, nrec, feat_w = res
    narrow = jnp.zeros((nrec, 10), jnp.float32).at[gid].add(dfeat[:, :10])
    drec = jnp.concatenate(
        [narrow, jnp.zeros((nrec, feat_w - 10), jnp.float32)], axis=1)
    return drec, None


_gather_records.defvjp(_gather_records_fwd, _gather_records_bwd)


# Above this many records the sortseg reduction switches from carrying the
# 10 cotangent columns as sort payloads to sorting a (gid, iota)
# permutation and gathering the rows through it: at L=10.5M (the
# million-Gaussian config) the 11-column sort both explodes compile-helper
# memory (observed tpu_compile_helper SIGKILL) and moves 44 B/entry
# through every bitonic pass, while the permutation gather is one
# row-latency-bound pass. At bench scale (1.3M) the payload sort is
# faster (16 ms vs sort+gather ~20 ms), so the split is size-dispatched.
_SEG_PAYLOAD_SORT_MAX = 4 << 20


def _segment_reduce_sorted(d, gid, offs):
    """Sum rows of ``d`` (L2, 10) into per-Gaussian segments.

    ``gid`` holds each row's Gaussian rank (dead/pad rows carry the
    sentinel rank P, which sorts past every live row); ``offs`` (P+1,) is
    the exclusive prefix of per-Gaussian live counts, so in gid-sorted
    order Gaussian g owns rows [offs[g], offs[g+1]).

    Replaces the XLA scatter-add (row-serial, ~18-19 ns/row on v5e — ~1 s
    at the million-Gaussian L=10.5M) with a sort + SEGMENTED associative
    scan: the combine resets at segment starts, so a segment total only
    ever adds values from inside its own segment (tree order) — error
    ~eps*log(seg_len)*|segment content|, the same class as the
    scatter-add's sequential sum. The r3 variant computed segment sums as
    differences of a global two-level prefix, whose error scales with the
    BLOCK content (measured 3.6e-3 worst-case vs the scatter's 8e-4,
    scripts/bench_scatter.py) and failed the 1e-4 on-hardware gradient
    parity gate (BENCH_r03). Row order within a segment is arbitrary
    (non-stable sort) — segment sums are permutation-invariant up to the
    same f32 reassociation class either way."""
    L2, W = d.shape
    if L2 <= _SEG_PAYLOAD_SORT_MAX:
        op = jax.lax.sort((gid,) + tuple(d[:, i] for i in range(W)),
                          num_keys=1, is_stable=False)
        sg = op[0]
        ds = jnp.stack(op[1:], axis=1)
        flags = jnp.concatenate(
            [jnp.ones((1,), bool), sg[1:] != sg[:-1]])

        def comb(a, b):      # segmented-sum operator (associative)
            af, av = a
            bf, bv = b
            return af | bf, bv + jnp.where(bf[..., None], 0.0, av)

        _, svals = jax.lax.associative_scan(comb, (flags, ds), axis=0)
    else:
        # large-L formulation (the million-Gaussian regime). Two changes,
        # both compile-memory driven — the small-L lowering OOM-killed
        # the TPU compile helper at L=10.5M:
        #   1. sort only a (gid, iota) permutation and gather the rows
        #      through it instead of carrying W f32 sort payloads
        #      (44 B/entry through every bitonic pass);
        #   2. segmented scan as a flat Hillis-Steele shift loop instead
        #      of jax.lax.associative_scan, whose recursive odd/even
        #      lowering nests ~log2(L) levels of interleaves over the
        #      (flags, W-column) tuple.
        # Same math: the combine still resets at segment starts, so sums
        # stay within segments (identical error class).
        iota = jnp.arange(L2, dtype=jnp.int32)
        sg, perm = jax.lax.sort((gid, iota), num_keys=1, is_stable=False)
        ds = d[perm]
        flags = jnp.concatenate(
            [jnp.ones((1,), bool), sg[1:] != sg[:-1]])
        svals, f = ds, flags
        sh = 1
        while sh < L2:
            ps = jnp.concatenate(
                [jnp.zeros((sh, W), svals.dtype), svals[:-sh]], axis=0)
            pf = jnp.concatenate(
                [jnp.ones((sh,), bool), f[:-sh]], axis=0)
            svals = svals + jnp.where(f[:, None], 0.0, ps)
            f = f | pf
            sh *= 2
    last = jnp.clip(offs[1:] - 1, 0, L2 - 1)      # last row of segment g
    tot = svals[last]
    return jnp.where((offs[1:] > offs[:-1])[:, None], tot, 0.0)


@jax.custom_vjp
def _gather_records_seg(records, gid, offs):
    """records[gid], like ``_gather_records``, but the VJP reduces the
    per-entry cotangents by sort + segment-sum instead of scatter-add.
    ``offs`` (P+1,) int32: exclusive prefix of per-Gaussian live counts in
    gid (depth-rank) order; requires dead/pad entries remapped to gid=P
    (the zero record row) so they sort past every live segment."""
    return records[gid]


def _gather_records_seg_fwd(records, gid, offs):
    return records[gid], (gid, offs, records.shape[0], records.shape[1])


def _gather_records_seg_bwd(res, dfeat):
    gid, offs, nrec, feat_w = res
    seg = _segment_reduce_sorted(dfeat[:, :10], gid, offs)   # (nrec-1, 10)
    drec = jnp.concatenate(
        [seg, jnp.zeros((1, 10), jnp.float32)], axis=0)
    drec = jnp.concatenate(
        [drec, jnp.zeros((nrec, feat_w - 10), jnp.float32)], axis=1)
    return drec, None, None


_gather_records_seg.defvjp(_gather_records_seg_fwd, _gather_records_seg_bwd)


def _tile_px(starts_ref, t, lin):
    """Pixel coords for tile t. Tile rows wrap modulo ``view_rows`` (the
    scalar stashed after ntx): a fused multi-view batch stacks per-view
    tile grids vertically with view-LOCAL splat coordinates, keeping the
    alpha math bitwise identical to single-view renders (a global-y shift
    would cost ~ulp(B*H) per pixel of rounding)."""
    ntx = starts_ref[pl.num_programs(0) * GROUP]
    view_rows = starts_ref[pl.num_programs(0) * GROUP + 1]
    txc = ((t % ntx) * TILE).astype(jnp.float32)
    tyc = (((t // ntx) % view_rows) * TILE).astype(jnp.float32)
    px = txc + (lin % TILE).astype(jnp.float32)
    py = tyc + (lin // TILE).astype(jnp.float32)
    return px, py, txc, tyc


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
def _make_tile_kernel(ps: PackSpec, rect_gate: bool = False):
    def _tile_kernel(starts_ref, counts_ref, feat_hbm, out_ref, scratch,
                     sem):
        pid = pl.program_id(0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

        def one_tile(g, _):
            t = pid * GROUP + g
            start = starts_ref[t]     # padded record offset (pack-aligned)
            count = counts_ref[t]     # true record count
            nchunks = pl.cdiv(count, ps.krec)
            px, py, txc, tyc = _tile_px(starts_ref, t, lin)
            row0 = start // ps.pack

            def dma(slot, chunk):
                return pltpu.make_async_copy(
                    feat_hbm.at[pl.ds(row0 + chunk * ps.rpc, ps.rpc), :],
                    scratch.at[slot], sem.at[slot])

            @pl.when(nchunks > 0)
            def _():
                dma(0, 0).start()

            def body(carry):
                chunk, t_run, lsum_run, frozen, acc = carry
                slot = chunk % 2

                @pl.when(chunk + 1 < nchunks)
                def _():
                    dma((chunk + 1) % 2, chunk + 1).start()

                dma(slot, chunk).wait()
                f = scratch[slot]                          # (rpc, 128)

                subs = [_sub_geometry(ps, f, k, px, py, chunk * ps.krec,
                                      count,
                                      rect=(txc, tyc) if rect_gate
                                      else None)
                        for k in range(ps.pack)]
                ls = [jnp.log1p(-s["a"]) for s in subs]
                p_row = ls[0]
                for k in range(1, ps.pack):
                    p_row = p_row + ls[k]
                row_pref = strict_prefix_sum(p_row)        # (rpc, 256)

                off = jnp.zeros_like(p_row)
                new_acc = acc
                new_frozen = frozen
                for k in range(ps.pack):
                    a = subs[k]["a"]
                    t_before = t_run * jnp.exp(row_pref + off)
                    t_after = t_before * (1.0 - a)
                    contrib = subs[k]["contrib"]
                    ok = contrib & (t_after >= T_EPS) & (t_before >= T_EPS)
                    w = jnp.where(ok, a * t_before, 0.0)
                    ff = (contrib & (t_after < T_EPS)
                          & (t_before >= T_EPS)).astype(jnp.float32)
                    new_frozen = new_frozen + jnp.sum(
                        ff * t_before, axis=0, keepdims=True)
                    # color/invdepth accumulation on the VPU: a tiny-
                    # contraction MXU matmul here is latency-bound
                    new_acc = new_acc + jnp.concatenate(
                        [jnp.sum(w * _sub(ps, f, k, 6 + c), axis=0,
                                 keepdims=True) for c in range(4)],
                        axis=0)                            # (4, 256)
                    off = off + ls[k]

                lsum_c = jnp.sum(p_row, axis=0, keepdims=True)
                t_run = t_run * jnp.exp(lsum_c)
                return (chunk + 1, t_run, lsum_run + lsum_c, new_frozen,
                        new_acc)

            def cond(carry):
                chunk, t_run, _, frozen, _ = carry
                live = jnp.any((frozen <= 0.0) & (t_run >= T_EPS))
                return (chunk < nchunks) & live

            t_run0 = jnp.ones((1, PIX), jnp.float32)
            zero1 = jnp.zeros((1, PIX), jnp.float32)
            acc0 = jnp.zeros((4, PIX), jnp.float32)
            last, t_run, lsum_run, frozen, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), t_run0, zero1, zero1, acc0))

            # drain the prefetched next-chunk DMA on early exit
            @pl.when((last > 0) & (last < nchunks))
            def _():
                dma(last % 2, last).wait()

            t_final = jnp.where(frozen > 0.0, frozen, t_run)
            out_ref[g, 0:4, :] = acc
            out_ref[g, 4:5, :] = t_final
            # rows 5-6 feed the backward (killing its re-walk pass 1): the
            # exact log-transmittance sum at the exit point (carried
            # additively so the backward's recovery chain sees the same
            # values pass 1 produced) and the exit chunk index. Downstream
            # assembly slices rows 0-4 only, so no cotangent leaks.
            out_ref[g, 5:6, :] = lsum_run
            out_ref[g, 6:7, :] = jnp.full((1, PIX), last.astype(jnp.float32))
            out_ref[g, 7:8, :] = jnp.zeros((1, PIX), jnp.float32)
            return 0

        jax.lax.fori_loop(0, GROUP, one_tile, 0)

    return _tile_kernel


def _fwd_call(feat, starts_plus, counts_pad, *, n_programs: int,
              interpret: bool, pack: int = DEFAULT_PACK,
              chunk_rows: int = 0, rect_gate: bool = False):
    """Invoke the forward compositor; returns (n_programs*GROUP, 8, 256)."""
    ps = get_spec(pack, chunk_rows)
    nt_pad = n_programs * GROUP
    nrec = feat.shape[0] * ps.pack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((GROUP, OUT_ROWS, PIX),
                               lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        _make_tile_kernel(ps, rect_gate),
        out_shape=jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=30 * nrec * PIX, bytes_accessed=nrec * ps.feat * 4,
            transcendentals=2 * nrec * PIX),
    )(starts_plus, counts_pad, feat)


# ---------------------------------------------------------------------------
# backward kernel (see module docstring for the math)
# ---------------------------------------------------------------------------
def _make_tile_bwd_kernel(ps: PackSpec, depth_grad: bool = True):
    def _tile_bwd_kernel(starts_ref, counts_ref, feat_hbm, gtiles_ref,
                         tiles_ref, dfeat_hbm, rscratch, gscratch, rsem,
                         wsem):
        pid = pl.program_id(0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

        def one_tile(g, _):
            t = pid * GROUP + g
            start = starts_ref[t]
            count = counts_ref[t]
            nchunks = pl.cdiv(count, ps.krec)
            px, py, txc, tyc = _tile_px(starts_ref, t, lin)
            row0 = start // ps.pack

            g_r = gtiles_ref[g, 0:1, :]
            g_gg = gtiles_ref[g, 1:2, :]
            g_b = gtiles_ref[g, 2:3, :]
            g_i = gtiles_ref[g, 3:4, :]
            g_T = gtiles_ref[g, 4:5, :]


            def rdma(slot, chunk):
                return pltpu.make_async_copy(
                    feat_hbm.at[pl.ds(row0 + chunk * ps.rpc, ps.rpc), :],
                    rscratch.at[slot], rsem.at[slot])

            def wdma(slot, chunk):
                return pltpu.make_async_copy(
                    gscratch.at[slot],
                    dfeat_hbm.at[pl.ds(row0 + chunk * ps.rpc, ps.rpc), :],
                    wsem.at[slot])

            # ---- exit state saved by the forward (no re-walk pass):
            # rows 5/6 of the primal output hold the exact
            # log-transmittance sum at the exit point and the exit chunk
            # index. Records in chunks past the forward's early exit have
            # exactly-zero gradients (weights are zero and t_final is
            # frozen before them), so the reverse walk covers [0, n_eff)
            # and skipped chunks zero-fill.
            lsum = tiles_ref[g, 5:6, :]
            n_eff = jnp.max(tiles_ref[g, 6:7, :]).astype(jnp.int32)
            t_end = jnp.exp(lsum)

            @pl.when(n_eff < nchunks)
            def _():
                gscratch[0] = jnp.zeros((ps.rpc, ps.row), jnp.float32)

                def zero_fill(c, _):
                    cp = pltpu.make_async_copy(
                        gscratch.at[0],
                        dfeat_hbm.at[pl.ds(row0 + c * ps.rpc, ps.rpc), :],
                        wsem.at[0])
                    cp.start()
                    cp.wait()
                    return 0

                jax.lax.fori_loop(n_eff, nchunks, zero_fill, 0)

            # ---- reverse pass: suffix accumulator + grads ----------------
            @pl.when(n_eff > 0)
            def _():
                rdma((n_eff - 1) % 2, n_eff - 1).start()

            def p2_body(i, carry):
                s_acc, lsum_upto = carry
                chunk = n_eff - 1 - i
                slot = chunk % 2

                @pl.when(chunk - 1 >= 0)
                def _():
                    rdma((chunk - 1) % 2, chunk - 1).start()

                rdma(slot, chunk).wait()
                f = rscratch[slot]

                subs = [_sub_geometry(ps, f, k, px, py, chunk * ps.krec, count)
                        for k in range(ps.pack)]
                ls = [jnp.log1p(-s["a"]) for s in subs]
                p_row = ls[0]
                for k in range(1, ps.pack):
                    p_row = p_row + ls[k]
                lsum_c = jnp.sum(p_row, axis=0, keepdims=True)
                lsum_prefix = jnp.minimum(lsum_upto - lsum_c, 0.0)
                row_pref = lsum_prefix + strict_prefix_sum(p_row)

                # per-sub t_before / weights / dw / q terms (forward order)
                tb, ws, dws, qs = [], [], [], []
                off = jnp.zeros_like(p_row)
                for k in range(ps.pack):
                    a = subs[k]["a"]
                    t_before = jnp.exp(row_pref + off)
                    t_after = t_before * (1.0 - a)
                    contrib = subs[k]["contrib"]
                    ok = contrib & (t_after >= T_EPS) & (t_before >= T_EPS)
                    w = jnp.where(ok, a * t_before, 0.0)
                    dw = (_sub(ps, f, k, 6) * g_r + _sub(ps, f, k, 7) * g_gg
                          + _sub(ps, f, k, 8) * g_b)
                    if depth_grad:
                        dw = dw + _sub(ps, f, k, 9) * g_i
                    first_fail = contrib & (t_after < T_EPS) \
                        & (t_before >= T_EPS)
                    q = jnp.where(ok, dw * w, 0.0) \
                        + jnp.where(first_fail, g_T * t_before, 0.0)
                    tb.append(t_before)
                    ws.append(w)
                    dws.append(dw)
                    qs.append(q)
                    off = off + ls[k]

                q_row = qs[0]
                for k in range(1, ps.pack):
                    q_row = q_row + qs[k]
                row_suf = strict_suffix_sum(q_row)

                # suffix for sub k = carried + row suffix + later subs
                gcols = []
                tail = jnp.zeros_like(q_row)
                for k in reversed(range(ps.pack)):
                    s_i = s_acc + row_suf + tail
                    a = subs[k]["a"]
                    contrib = subs[k]["contrib"]
                    pre_freeze = contrib & (tb[k] >= T_EPS)
                    ok = contrib & ((tb[k] * (1.0 - a)) >= T_EPS)
                    da = jnp.where(
                        pre_freeze,
                        jnp.where(ok, dws[k] * tb[k], 0.0) - s_i / (1.0 - a),
                        0.0)
                    dpow = da * subs[k]["a_raw"]
                    # NOTE: an MXU formulation of these 10 per-record
                    # pixel reductions (polynomial moments of dpow against
                    # a tile-local basis + w @ G) was tried and measured
                    # SLOWER (35 vs 30.6 ms) at both HIGHEST and manual
                    # split-bf16 — Mosaic's small-N dot lowering pads N to
                    # 128 per pass. Cross-lane jnp.sum stays.
                    dx, dy = subs[k]["dx"], subs[k]["dy"]
                    f2 = _sub(ps, f, k, 2)
                    f3 = _sub(ps, f, k, 3)
                    f4 = _sub(ps, f, k, 4)
                    cols = jnp.concatenate([
                        jnp.sum(dpow * -(f2 * dx + f3 * dy), axis=1,
                                keepdims=True),
                        jnp.sum(dpow * -(f4 * dy + f3 * dx), axis=1,
                                keepdims=True),
                        jnp.sum(dpow * (-0.5 * dx * dx), axis=1,
                                keepdims=True),
                        jnp.sum(dpow * (-dx * dy), axis=1, keepdims=True),
                        jnp.sum(dpow * (-0.5 * dy * dy), axis=1,
                                keepdims=True),
                        jnp.sum(da * subs[k]["expp"], axis=1,
                                keepdims=True),
                        jnp.sum(ws[k] * g_r, axis=1, keepdims=True),
                        jnp.sum(ws[k] * g_gg, axis=1, keepdims=True),
                        jnp.sum(ws[k] * g_b, axis=1, keepdims=True),
                        (jnp.sum(ws[k] * g_i, axis=1, keepdims=True)
                         if depth_grad else
                         jnp.zeros((ps.rpc, 1), jnp.float32)),
                        jnp.zeros((ps.rpc, ps.feat - 10), jnp.float32),
                    ], axis=1)                             # (rpc, feat)
                    gcols.append(cols)
                    tail = tail + qs[k]

                gbuf = jnp.concatenate(gcols[::-1], axis=1)  # (rpc, 128)

                @pl.when(i >= 2)
                def _():
                    wdma(i % 2, chunk + 2).wait()
                gscratch[i % 2] = gbuf
                wdma(i % 2, chunk).start()

                s_acc = s_acc + jnp.sum(q_row, axis=0, keepdims=True)
                return s_acc, lsum_prefix

            s0 = jnp.where(t_end >= T_EPS, g_T * t_end, 0.0)
            jax.lax.fori_loop(0, n_eff, p2_body, (s0, lsum))

            # drain outstanding grad writes
            @pl.when(n_eff >= 2)
            def _():
                wdma(n_eff % 2, 1).wait()

            @pl.when(n_eff >= 1)
            def _():
                wdma((n_eff - 1) % 2, 0).wait()
            return 0

        jax.lax.fori_loop(0, GROUP, one_tile, 0)

    return _tile_bwd_kernel


def _bwd_call(feat, starts_plus, counts_pad, gtiles, tiles, *,
              n_programs: int, interpret: bool, pack: int = DEFAULT_PACK,
              depth_grad: bool = True, chunk_rows: int = 0,
              rect_gate: bool = False):
    """Invoke the backward compositor; returns dfeat with feat's shape.

    ``tiles`` is the saved forward output — its exit-state rows replace
    the old total-transmittance re-walk (pass 1), halving backward DMA
    and alpha recomputation. ``rect_gate`` is accepted for kw-compat with
    _fwd_call but unused: bucket segments never reach this per-tile
    backward (they go through _bucket_bwd_call)."""
    assert not rect_gate, "bucket segments use _bucket_bwd_call"
    ps = get_spec(pack, chunk_rows)
    nrec = feat.shape[0] * ps.pack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((GROUP, OUT_ROWS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, OUT_ROWS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        _make_tile_bwd_kernel(ps, depth_grad),
        out_shape=jax.ShapeDtypeStruct(feat.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # sequential ascending grid REQUIRED: see GRADIENT-WRITE INVARIANT
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=50 * nrec * PIX, bytes_accessed=2 * nrec * ps.feat * 4,
            transcendentals=2 * nrec * PIX),
    )(starts_plus, counts_pad, feat, gtiles, tiles)


# ---------------------------------------------------------------------------
# bucket-mode backward: one program per GROUP_B buckets, accumulating the
# bucket² member tiles' per-record cotangents before each chunk write
# ---------------------------------------------------------------------------
def _make_bucket_bwd_kernel(ps: PackSpec, B2: int, group_b: int,
                            depth_grad: bool = True):
    def _kernel(bstarts_ref, bcounts_ref, morigin_ref, mvalid_ref,
                feat_hbm, gtiles_ref, tiles_ref, dfeat_hbm, rscratch,
                gscratch, rsem, wsem):
        pid = pl.program_id(0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

        def one_bucket(g, _):
            b = pid * group_b + g
            start = bstarts_ref[b]
            count = bcounts_ref[b]
            nchunks = pl.cdiv(count, ps.krec)
            row0 = start // ps.pack

            # per-member-tile saved state (slot-local rows of the
            # bucket-major reordered cotangent/saved-output blocks)
            pxs, pys, g_rs, g_gs, g_bs, g_is, g_Ts = [], [], [], [], [], [], []
            txcs, tycs, lsums, neffs = [], [], [], []
            for m in range(B2):
                slot = g * B2 + m
                og = morigin_ref[b * B2 + m]
                valid = mvalid_ref[b * B2 + m]
                txc = ((og & 0xFFFF) * TILE).astype(jnp.float32)
                tyc = ((og >> 16) * TILE).astype(jnp.float32)
                txcs.append(txc)
                tycs.append(tyc)
                pxs.append(txc + (lin % TILE).astype(jnp.float32))
                pys.append(tyc + (lin // TILE).astype(jnp.float32))
                g_rs.append(gtiles_ref[slot, 0:1, :])
                g_gs.append(gtiles_ref[slot, 1:2, :])
                g_bs.append(gtiles_ref[slot, 2:3, :])
                g_is.append(gtiles_ref[slot, 3:4, :])
                g_Ts.append(gtiles_ref[slot, 4:5, :])
                lsums.append(tiles_ref[slot, 5:6, :])
                neffs.append(jnp.max(tiles_ref[slot, 6:7, :])
                             .astype(jnp.int32) * valid)
            n_eff = neffs[0]
            for m in range(1, B2):
                n_eff = jnp.maximum(n_eff, neffs[m])

            def rdma(slot_, chunk):
                return pltpu.make_async_copy(
                    feat_hbm.at[pl.ds(row0 + chunk * ps.rpc, ps.rpc), :],
                    rscratch.at[slot_], rsem.at[slot_])

            def wdma(slot_, chunk):
                return pltpu.make_async_copy(
                    gscratch.at[slot_],
                    dfeat_hbm.at[pl.ds(row0 + chunk * ps.rpc, ps.rpc), :],
                    wsem.at[slot_])

            @pl.when(n_eff < nchunks)
            def _():
                gscratch[0] = jnp.zeros((ps.rpc, ps.row), jnp.float32)

                def zero_fill(c, _):
                    cp = pltpu.make_async_copy(
                        gscratch.at[0],
                        dfeat_hbm.at[pl.ds(row0 + c * ps.rpc, ps.rpc), :],
                        wsem.at[0])
                    cp.start()
                    cp.wait()
                    return 0

                jax.lax.fori_loop(n_eff, nchunks, zero_fill, 0)

            @pl.when(n_eff > 0)
            def _():
                rdma((n_eff - 1) % 2, n_eff - 1).start()

            def p2_body(i, carry):
                chunk = n_eff - 1 - i
                slot_ = chunk % 2

                @pl.when(chunk - 1 >= 0)
                def _():
                    rdma((chunk - 1) % 2, chunk - 1).start()

                rdma(slot_, chunk).wait()
                f = rscratch[slot_]

                gbuf = None
                new_carry = []
                for m in range(B2):
                    s_acc, lsum_upto = carry[2 * m], carry[2 * m + 1]
                    active = chunk < neffs[m]
                    px, py = pxs[m], pys[m]
                    g_r, g_gg, g_b = g_rs[m], g_gs[m], g_bs[m]
                    g_i, g_T = g_is[m], g_Ts[m]

                    subs = [_sub_geometry(ps, f, k, px, py,
                                          chunk * ps.krec, count,
                                          rect=(txcs[m], tycs[m]))
                            for k in range(ps.pack)]
                    ls = [jnp.log1p(-s["a"]) for s in subs]
                    p_row = ls[0]
                    for k in range(1, ps.pack):
                        p_row = p_row + ls[k]
                    lsum_c = jnp.sum(p_row, axis=0, keepdims=True)
                    lsum_prefix = jnp.minimum(lsum_upto - lsum_c, 0.0)
                    row_pref = lsum_prefix + strict_prefix_sum(p_row)

                    tb, ws, dws, qs = [], [], [], []
                    off = jnp.zeros_like(p_row)
                    for k in range(ps.pack):
                        a = subs[k]["a"]
                        t_before = jnp.exp(row_pref + off)
                        t_after = t_before * (1.0 - a)
                        contrib = subs[k]["contrib"]
                        ok = contrib & (t_after >= T_EPS) \
                            & (t_before >= T_EPS)
                        w = jnp.where(ok, a * t_before, 0.0)
                        dw = (_sub(ps, f, k, 6) * g_r
                              + _sub(ps, f, k, 7) * g_gg
                              + _sub(ps, f, k, 8) * g_b)
                        if depth_grad:
                            dw = dw + _sub(ps, f, k, 9) * g_i
                        first_fail = contrib & (t_after < T_EPS) \
                            & (t_before >= T_EPS)
                        q = jnp.where(ok, dw * w, 0.0) \
                            + jnp.where(first_fail, g_T * t_before, 0.0)
                        tb.append(t_before)
                        ws.append(w)
                        dws.append(dw)
                        qs.append(q)
                        off = off + ls[k]

                    q_row = qs[0]
                    for k in range(1, ps.pack):
                        q_row = q_row + qs[k]
                    row_suf = strict_suffix_sum(q_row)

                    gcols = []
                    tail = jnp.zeros_like(q_row)
                    for k in reversed(range(ps.pack)):
                        s_i = s_acc + row_suf + tail
                        a = subs[k]["a"]
                        contrib = subs[k]["contrib"]
                        pre_freeze = contrib & (tb[k] >= T_EPS)
                        ok = contrib & ((tb[k] * (1.0 - a)) >= T_EPS)
                        da = jnp.where(
                            pre_freeze,
                            jnp.where(ok, dws[k] * tb[k], 0.0)
                            - s_i / (1.0 - a),
                            0.0)
                        dpow = da * subs[k]["a_raw"]
                        dx, dy = subs[k]["dx"], subs[k]["dy"]
                        f2 = _sub(ps, f, k, 2)
                        f3 = _sub(ps, f, k, 3)
                        f4 = _sub(ps, f, k, 4)
                        cols = jnp.concatenate([
                            jnp.sum(dpow * -(f2 * dx + f3 * dy), axis=1,
                                    keepdims=True),
                            jnp.sum(dpow * -(f4 * dy + f3 * dx), axis=1,
                                    keepdims=True),
                            jnp.sum(dpow * (-0.5 * dx * dx), axis=1,
                                    keepdims=True),
                            jnp.sum(dpow * (-dx * dy), axis=1,
                                    keepdims=True),
                            jnp.sum(dpow * (-0.5 * dy * dy), axis=1,
                                    keepdims=True),
                            jnp.sum(da * subs[k]["expp"], axis=1,
                                    keepdims=True),
                            jnp.sum(ws[k] * g_r, axis=1, keepdims=True),
                            jnp.sum(ws[k] * g_gg, axis=1, keepdims=True),
                            jnp.sum(ws[k] * g_b, axis=1, keepdims=True),
                            (jnp.sum(ws[k] * g_i, axis=1, keepdims=True)
                             if depth_grad else
                             jnp.zeros((ps.rpc, 1), jnp.float32)),
                            jnp.zeros((ps.rpc, ps.feat - 10), jnp.float32),
                        ], axis=1)
                        gcols.append(cols)
                        tail = tail + qs[k]

                    gbuf_m = jnp.concatenate(gcols[::-1], axis=1)
                    gbuf_m = jnp.where(active, gbuf_m, 0.0)
                    gbuf = gbuf_m if gbuf is None else gbuf + gbuf_m
                    new_carry.append(jnp.where(
                        active,
                        s_acc + jnp.sum(q_row, axis=0, keepdims=True),
                        s_acc))
                    new_carry.append(jnp.where(active, lsum_prefix,
                                               lsum_upto))

                @pl.when(i >= 2)
                def _():
                    wdma(i % 2, chunk + 2).wait()
                gscratch[i % 2] = gbuf
                wdma(i % 2, chunk).start()
                return tuple(new_carry)

            carry0 = []
            for m in range(B2):
                t_end = jnp.exp(lsums[m])
                carry0.append(jnp.where(t_end >= T_EPS, g_Ts[m] * t_end,
                                        0.0))
                carry0.append(lsums[m])
            jax.lax.fori_loop(0, n_eff, p2_body, tuple(carry0))

            @pl.when(n_eff >= 2)
            def _():
                wdma(n_eff % 2, 1).wait()

            @pl.when(n_eff >= 1)
            def _():
                wdma((n_eff - 1) % 2, 0).wait()
            return 0

        jax.lax.fori_loop(0, group_b, one_bucket, 0)

    return _kernel


def _bucket_bwd_call(feat, bstarts, bcounts, gtiles, tiles, *, bucket: int,
                     ntiles: int, ntx: int, view_rows: int, interpret: bool,
                     pack: int, depth_grad: bool = True,
                     chunk_rows: int = 0):
    """Backward for bucket-binned segments (see _make_composite). Member
    geometry is static: tile ids, view-local pixel origins and validity
    per (bucket, slot) are numpy constants baked at trace time."""
    ps = get_spec(pack, chunk_rows)
    BK = bucket
    B2 = BK * BK
    nseg = bstarts.shape[0]
    nty = ntiles // ntx
    nbx = _cdiv(ntx, BK)
    vrow_b = view_rows // BK
    nrec = feat.shape[0] * ps.pack

    byv = np.arange(nseg, dtype=np.int32) // nbx         # global bucket row
    bx = np.arange(nseg, dtype=np.int32) % nbx
    view = byv // vrow_b
    by_in_view = byv % vrow_b
    members = np.zeros((nseg, B2), np.int32)
    mvalid = np.zeros((nseg, B2), np.int32)
    morigin = np.zeros((nseg, B2), np.int32)
    for dy in range(BK):
        for dx in range(BK):
            s = dy * BK + dx
            ty_in_view = by_in_view * BK + dy
            tx = bx * BK + dx
            ok = (tx < ntx) & (view * view_rows + ty_in_view < nty)
            txc = np.minimum(tx, ntx - 1)
            tyg = np.minimum(view * view_rows + ty_in_view, nty - 1)
            members[:, s] = tyg * ntx + txc
            mvalid[:, s] = ok.astype(np.int32)
            morigin[:, s] = (np.minimum(ty_in_view, view_rows - 1)
                             << 16) | txc

    group_b = max(1, GROUP // B2)
    npb = _cdiv(nseg, group_b)
    nseg_pad = npb * group_b

    sel = jnp.asarray(members.reshape(-1))
    gtiles_bm = gtiles[:ntiles][sel]
    tiles_bm = tiles[:ntiles][sel]
    pad = (nseg_pad - nseg) * B2
    if pad:
        z = jnp.zeros((pad, OUT_ROWS, PIX), jnp.float32)
        gtiles_bm = jnp.concatenate([gtiles_bm, z])
        tiles_bm = jnp.concatenate([tiles_bm, z])
    zpad = jnp.zeros((nseg_pad - nseg,), jnp.int32)
    bstarts_pad = jnp.concatenate([bstarts, zpad])
    bcounts_pad = jnp.concatenate([bcounts, zpad])
    zpad2 = np.zeros(((nseg_pad - nseg) * B2,), np.int32)
    morigin_pad = jnp.asarray(np.concatenate([morigin.reshape(-1), zpad2]))
    mvalid_pad = jnp.asarray(np.concatenate([mvalid.reshape(-1), zpad2]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(npb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((group_b * B2, OUT_ROWS, PIX),
                         lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group_b * B2, OUT_ROWS, PIX),
                         lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        _make_bucket_bwd_kernel(ps, B2, group_b, depth_grad),
        out_shape=jax.ShapeDtypeStruct(feat.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # sequential ascending grid REQUIRED (chunk-write spill, see
        # GRADIENT-WRITE INVARIANT in the module docstring)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=50 * B2 * nrec * PIX,
            bytes_accessed=2 * nrec * ps.feat * 4,
            transcendentals=2 * B2 * nrec * PIX),
    )(bstarts_pad, bcounts_pad, morigin_pad, mvalid_pad, feat, gtiles_bm,
      tiles_bm)


@functools.lru_cache(maxsize=None)
def _make_composite(n_programs: int, ntiles: int, interpret: bool,
                    mode: str, pack: int, depth_grad: bool = True,
                    chunk_rows: int = 0, bucket: int = 1, ntx: int = 0,
                    view_rows: int = 0):
    """Composite-tiles function with the requested differentiation rule.

    mode="vjp": jax.custom_vjp via the backward kernel (training / J^T u).
    mode="jvp": jax.custom_jvp via the fused tangent kernel (LM J v).
    JAX does not allow both rules on one function, so the LM operators pick
    the variant per matvec direction (solver/operators.py).

    ``bucket`` > 1 changes only the VJP wiring: the forward/JVP kernels
    are geometry-agnostic (each tile walks whatever segment its
    starts/counts point at), but bucket segments are shared by bucket²
    tiles, so the backward must accumulate their per-record cotangents in
    ONE program — the per-tile backward would overwrite, not add. The
    vjp variant then takes (feat, starts_plus, counts_pad, bstarts,
    bcounts) with the bucket-level segment table."""
    kw = dict(n_programs=n_programs, interpret=interpret, pack=pack,
              chunk_rows=chunk_rows, rect_gate=bucket > 1)
    if mode == "vjp" and bucket > 1:
        @jax.custom_vjp
        def comp_b(feat, starts_plus, counts_pad, bstarts, bcounts):
            return _fwd_call(feat, starts_plus, counts_pad, **kw)

        def fwd_b(feat, starts_plus, counts_pad, bstarts, bcounts):
            out = comp_b(feat, starts_plus, counts_pad, bstarts, bcounts)
            return out, (feat, bstarts, bcounts, out)

        def bwd_b(res, gtiles):
            feat, bstarts, bcounts, tiles = res
            dfeat = _bucket_bwd_call(
                feat, bstarts, bcounts, gtiles, tiles, bucket=bucket,
                ntiles=ntiles, ntx=ntx, view_rows=view_rows,
                interpret=interpret, pack=pack, depth_grad=depth_grad,
                chunk_rows=chunk_rows)
            nseg = bstarts.shape[0]
            end_entries = bstarts[nseg - 1] + (
                (bcounts[nseg - 1] + pack - 1) // pack) * pack
            valid = (jnp.arange(feat.shape[0], dtype=jnp.int32)
                     < end_entries // pack)
            dfeat = jnp.where(valid[:, None], dfeat, 0.0)
            return dfeat, None, None, None, None

        comp_b.defvjp(fwd_b, bwd_b)
        return comp_b
    if mode == "vjp":
        @jax.custom_vjp
        def comp(feat, starts_plus, counts_pad):
            return _fwd_call(feat, starts_plus, counts_pad, **kw)

        def fwd(feat, starts_plus, counts_pad):
            out = comp(feat, starts_plus, counts_pad)
            return out, (feat, starts_plus, counts_pad, out)

        def bwd(res, gtiles):
            feat, starts_plus, counts_pad, tiles = res
            dfeat = _bwd_call(feat, starts_plus, counts_pad, gtiles, tiles,
                              depth_grad=depth_grad, **kw)
            # rows past the last padded segment are never written by any
            # tile: scrub uninitialized HBM (which may hold NaNs) with
            # where — a mask multiply would propagate NaN*0=NaN into the
            # gather's scatter-add and poison real parameter gradients
            end_rows = (starts_plus[ntiles - 1] + counts_pad[ntiles - 1]
                        + pack - 1) // pack
            valid = jnp.arange(feat.shape[0], dtype=jnp.int32) < end_rows
            dfeat = jnp.where(valid[:, None], dfeat, 0.0)
            return dfeat, None, None

        comp.defvjp(fwd, bwd)
        return comp
    if mode == "jvp":
        from gslm_tpu.ops.rasterize_pallas_jvp import make_jvp_composite
        return make_jvp_composite(n_programs, interpret, _fwd_call, pack,
                                  chunk_rows=chunk_rows,
                                  rect_gate=bucket > 1)
    return functools.partial(_fwd_call, **kw)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "config", "interpret",
                                    "mode", "view_rows"))
def rasterize_pallas(splats: Splats2D, height: int, width: int,
                     bg: jnp.ndarray, config: RasterConfig,
                     interpret: bool = False, mode: str = "vjp",
                     view_rows: int | None = None) -> dict:
    """Same contract as rasterize_tiled (render/invdepth/diagnostics).

    ``view_rows``: tile rows per view for fused multi-view batches (splat
    coordinates are view-local; tile rows wrap modulo view_rows)."""
    L = config.dup_capacity
    Leff = config.eff_capacity()
    pack = config.pack or DEFAULT_PACK
    assert L % pack == 0 and Leff % pack == 0, \
        f"dup/live capacity ({L}/{Leff}) must be a multiple of pack={pack}"
    ps = get_spec(pack, config.chunk_rows)
    ntx, nty = _cdiv(width, TILE), _cdiv(height, TILE)
    ntiles = ntx * nty
    if view_rows is None:
        view_rows = nty
    P = splats.mean2d.shape[0]

    # ---- bucket binning (config.bucket > 1): stages 1-3 run on a
    # BK x BK-tile super-grid — the sort and the record gather (both
    # row-latency-bound) shrink ~BK^2/dilation — and every 16x16 tile
    # walks its parent bucket's segment. Records whose ellipse misses the
    # tile get alpha exactly 0 (rect gate / sub-1/255), so the composite
    # matches bucket=1 to chunk-boundary f32 rounding (exp(a+b) vs
    # exp(a)*exp(b): a few ulp); the kernel merely reads past them, which the
    # early exit makes cheap on deep streams (measured m1: tiles read 256
    # of p50=1189 records). Capacities count BUCKET records in this mode.
    BK = config.bucket
    reduce = config.bwd_reduce
    if reduce == "auto":
        # resolve by live record count: scatter-add is faster (and
        # compiles fast) below ~4M records; the sortseg perm-gather wins
        # ~1.5x at the million-Gaussian scale (see RasterConfig notes)
        reduce = ("sortseg" if Leff > _SEG_PAYLOAD_SORT_MAX else "scatter")
    want_seg = mode == "vjp" and reduce == "sortseg"
    if BK > 1:
        assert view_rows % BK == 0, \
            f"bucket={BK} needs view_rows ({view_rows}) divisible by it"
        assert nty % view_rows == 0
        nbx = _cdiv(ntx, BK)
        vrow_b = view_rows // BK
        nby = (nty // view_rows) * vrow_b
        vis = splats.tile_count > 0
        bx0 = splats.rect_min[:, 0] // BK
        by0 = splats.rect_min[:, 1] // BK
        bx1 = -(-splats.rect_max[:, 0] // BK)
        by1 = -(-splats.rect_max[:, 1] // BK)
        bcount = jnp.where(vis, (bx1 - bx0) * (by1 - by0), 0)
        bsp = splats.replace(
            rect_min=jnp.stack([bx0, by0], axis=-1),
            rect_max=jnp.stack([bx1, by1], axis=-1),
            tile_count=bcount)
        dsr = duplicate_sort_ranges(
            bsp, nbx, nby, L, view_rows=vrow_b, cull=config.cull,
            live_capacity=config.live_capacity, want_gid_counts=want_seg,
            tile_px=TILE * BK)
        nseg = nbx * nby
    else:
        dsr = duplicate_sort_ranges(
            splats, ntx, nty, L, view_rows=view_rows, cull=config.cull,
            live_capacity=config.live_capacity, want_gid_counts=want_seg)
        nseg = ntiles
    order, sorted_gid, starts, ends, totals = dsr[:5]
    gid_counts = dsr[5] if want_seg else None
    total_eff, total_aabb = totals
    counts = ends - starts                               # (nseg,)

    # ---- pad every segment to a pack multiple and gather the sorted
    # records into the packed (rows, 128) stream. Pad entries point
    # at an appended all-zero record row; the kernels also gate them.
    # With pack=1 segments are already row-aligned — skip the remap pass.
    if pack == 1:
        poffsets = starts
        gid2 = sorted_gid
        L2 = Leff
    else:
        pcounts = ((counts + pack - 1) // pack) * pack
        poffsets = jnp.cumsum(pcounts) - pcounts
        L2 = Leff + nseg * pack   # static: worst-case per-segment padding
        tile_pack = jnp.stack([
            poffsets.astype(jnp.float32), starts.astype(jnp.float32),
            counts.astype(jnp.float32),
            jnp.zeros_like(poffsets, jnp.float32),
        ], axis=1)                                       # (nseg, 4)
        rep = jnp.repeat(tile_pack, pcounts, axis=0, total_repeat_length=L2)
        iota2 = jnp.arange(L2, dtype=jnp.int32)
        rank = iota2 - rep[:, 0].astype(jnp.int32)
        in_seg = rank < rep[:, 2].astype(jnp.int32)
        total_p = poffsets[-1] + pcounts[-1]
        in_seg = in_seg & (iota2 < total_p)
        orig = jnp.clip(rep[:, 1].astype(jnp.int32) + rank, 0, Leff - 1)
        gid2 = jnp.where(in_seg, sorted_gid[orig], P)    # P -> zero record

    # The record table is permuted into depth order at P level (cheap) so
    # gid2 (= rank into the depth-sorted tables) indexes it directly; the
    # big L-sized gather stays single. It is differentiable end-to-end:
    # gather VJPs are XLA scatter-adds, routing the kernel's per-entry
    # cotangents back to Gaussians.
    extra_cols = []
    if BK > 1:
        # rect pixel bounds (y view-local), stream fields 10-13: the
        # per-tile gate that makes bucket walks reproduce the rect
        # truncation bitwise (see _sub_geometry)
        y0loc = splats.rect_min[:, 1] % view_rows
        hrect = splats.rect_max[:, 1] - splats.rect_min[:, 1]
        extra_cols = [
            (splats.rect_min[:, 0] * TILE).astype(jnp.float32)[:, None],
            (splats.rect_max[:, 0] * TILE).astype(jnp.float32)[:, None],
            (y0loc * TILE).astype(jnp.float32)[:, None],
            ((y0loc + hrect) * TILE).astype(jnp.float32)[:, None],
        ]
    records = jnp.concatenate([
        splats.mean2d,                      # 0:2
        splats.conic,                       # 2:5
        splats.opacity[:, None],            # 5
        splats.color,                       # 6:9
        splats.invdepth[:, None],           # 9
        *extra_cols,                        # 10:14 rect gate (bucket mode)
        jnp.zeros((P, ps.feat - 10 - len(extra_cols)), jnp.float32),
    ], axis=1)[order]
    records = jnp.concatenate(
        [records, jnp.zeros((1, ps.feat), jnp.float32)], axis=0)
    # the custom_vjp gather has no JVP rule — forward mode takes the plain
    # gather (its JVP is another gather, already cheap)
    if mode == "jvp":
        feat = records[gid2]                              # (L2, feat)
    elif want_seg:
        if pack == 1:
            # dead/sentinel entries past the live prefix carry rank bits 0
            # (the sentinel key's low bits) — remap them to the zero
            # record P so they sort past every live segment instead of
            # polluting Gaussian 0's. (pack>1 already maps out-of-segment
            # entries to P via in_seg.)
            live_end = jnp.minimum(total_eff, Leff).astype(jnp.int32)
            gid2 = jnp.where(jnp.arange(Leff, dtype=jnp.int32) < live_end,
                             gid2, P)
        offs = jnp.minimum(
            jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(gid_counts)]),
            jnp.int32(L2))                                # (P+1,)
        feat = _gather_records_seg(records, gid2, offs)
    else:
        feat = _gather_records(records, gid2)
    # extra chunk-size pad records absorb the final chunk over-read
    feat = jnp.concatenate(
        [feat, jnp.zeros((ps.krec, ps.feat), jnp.float32)], axis=0)
    feat = feat.reshape((L2 + ps.krec) // pack, ps.row)

    # pad the tile axis to a GROUP multiple (count 0 => tile renders bg),
    # and stash ntx after the starts so the kernel can derive tile coords.
    # In bucket mode every tile points at its parent bucket's segment.
    if BK > 1:
        tid = np.arange(ntiles, dtype=np.int32)
        ty, tx = tid // ntx, tid % ntx
        by = (ty // view_rows) * vrow_b + (ty % view_rows) // BK
        bid = jnp.asarray(by * nbx + tx // BK)           # (ntiles,) static
        starts_tile = poffsets[bid]
        counts_tile = counts[bid]
    else:
        starts_tile, counts_tile = poffsets, counts
    n_programs = _cdiv(ntiles, GROUP)
    nt_pad = n_programs * GROUP
    starts_plus = jnp.concatenate(
        [starts_tile.astype(jnp.int32),
         jnp.zeros((nt_pad - ntiles,), jnp.int32),
         jnp.array([ntx, view_rows], jnp.int32)])
    counts_pad = jnp.concatenate(
        [counts_tile, jnp.zeros((nt_pad - ntiles,), jnp.int32)])

    comp = _make_composite(n_programs, ntiles, interpret, mode, pack,
                           config.depth_grad, config.chunk_rows,
                           bucket=BK, ntx=ntx, view_rows=view_rows)
    if BK > 1 and mode == "vjp":
        # bucket segments are shared by BK^2 tiles: the backward must
        # accumulate their per-record cotangents in one program (the
        # per-tile backward would overwrite, not add) — pass the
        # bucket-level segment table alongside
        bstarts = poffsets.astype(jnp.int32)
        bcounts = counts
        tiles = comp(feat, starts_plus, counts_pad, bstarts, bcounts)
    else:
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
        "n_duplicates": total_eff,
        "overflow": ((total_eff > Leff) | (total_aabb > L)).astype(jnp.int32),
        "max_tile_load": jnp.max(counts),
    }
