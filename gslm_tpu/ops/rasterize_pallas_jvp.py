"""Pallas fused forward+tangent (JVP) compositor kernel.

The TPU analog of the reference rasterizer fork's forward-mode dual-tensor
path (rogerhh/diff-gaussian-rasterization-jvp, exercised at reference
tests/test_rasterizer.py:23-33 and driven by gaussians.make_dual +
LinearSolverFunctions.matvec, solver/solver_functions.py:83-99): one walk
over the packed sorted splat stream computes the primal composite AND its
directional derivative, so the LM J·v matvec costs ~2x a forward render
instead of a separate linearization.

Tangent math (primal notation as in rasterize_pallas):
  pow_dot = -(c0 dx + c1 dy) mx_dot - (c2 dy + c1 dx) my_dot
            - 0.5 dx^2 c0_dot - dx dy c1_dot - 0.5 dy^2 c2_dot
  a_dot   = op_dot exp(pow) + a_raw pow_dot      (clip straight-through,
                                                  contrib mask constant)
  The transmittance tangent is carried as the logarithmic derivative
  r = T_dot / T, so T_before_dot_i = t_before_i (r + prefix(-a_dot/(1-a)))
  — one extra Hillis-Steele prefix per chunk.
  w_dot_i = ok_i (a_dot_i t_before_i + a_i T_before_dot_i)
  t_final_dot uses the same first-fail freeze row as the primal.

Record packing / segment padding are identical to rasterize_pallas
(8 records per 128-lane row, PACK-aligned per-tile segments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslm_tpu.ops.composite import T_EPS
from gslm_tpu.ops.rasterize_pallas import (DEFAULT_PACK, GROUP, K, get_spec,
                                           OUT_ROWS, PIX, PackSpec, _sub,
                                           _sub_geometry, _tile_px,
                                           strict_prefix_sum)


def _make_tile_jvp_kernel(ps: PackSpec, rect_gate: bool = False):
    def _tile_jvp_kernel(starts_ref, counts_ref, feat_hbm, fdot_hbm,
                         out_ref, odot_ref, fscratch, dscratch,
                         fsem, dsem):
        pid = pl.program_id(0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)

        def one_tile(g, _):
            t = pid * GROUP + g
            start = starts_ref[t]
            count = counts_ref[t]
            nchunks = pl.cdiv(count, ps.krec)
            px, py, txc, tyc = _tile_px(starts_ref, t, lin)
            row0 = start // ps.pack

            def dma(buf, hbm, sem, slot, chunk):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(row0 + chunk * ps.rpc, ps.rpc), :],
                    buf.at[slot], sem.at[slot])

            @pl.when(nchunks > 0)
            def _():
                dma(fscratch, feat_hbm, fsem, 0, 0).start()
                dma(dscratch, fdot_hbm, dsem, 0, 0).start()

            def body(chunk, carry):
                (t_run, r_run, frozen, frozen_dot, acc, acc_dot) = carry
                slot = chunk % 2

                @pl.when(chunk + 1 < nchunks)
                def _():
                    dma(fscratch, feat_hbm, fsem, (chunk + 1) % 2,
                        chunk + 1).start()
                    dma(dscratch, fdot_hbm, dsem, (chunk + 1) % 2,
                        chunk + 1).start()

                dma(fscratch, feat_hbm, fsem, slot, chunk).wait()
                dma(dscratch, fdot_hbm, dsem, slot, chunk).wait()
                f = fscratch[slot]
                fd = dscratch[slot]

                subs = [_sub_geometry(ps, f, k, px, py, chunk * ps.krec,
                                      count,
                                      rect=(txc, tyc) if rect_gate
                                      else None)
                        for k in range(ps.pack)]
                ls = [jnp.log1p(-s["a"]) for s in subs]
                dlogs = []
                for k in range(ps.pack):
                    s = subs[k]
                    dx, dy = s["dx"], s["dy"]
                    pow_dot = (-( _sub(ps, f, k, 2) * dx + _sub(ps, f, k, 3) * dy)
                               * _sub(ps, fd, k, 0)
                               - (_sub(ps, f, k, 4) * dy + _sub(ps, f, k, 3) * dx)
                               * _sub(ps, fd, k, 1)
                               - 0.5 * dx * dx * _sub(ps, fd, k, 2)
                               - dx * dy * _sub(ps, fd, k, 3)
                               - 0.5 * dy * dy * _sub(ps, fd, k, 4))
                    a_dot = jnp.where(
                        s["contrib"],
                        _sub(ps, fd, k, 5) * s["expp"] + s["a_raw"] * pow_dot, 0.0)
                    s["a_dot"] = a_dot
                    dlogs.append(-a_dot / (1.0 - s["a"]))

                p_row = ls[0]
                d_row = dlogs[0]
                for k in range(1, ps.pack):
                    p_row = p_row + ls[k]
                    d_row = d_row + dlogs[k]
                row_pref = strict_prefix_sum(p_row)
                row_dpref = strict_prefix_sum(d_row)

                off = jnp.zeros_like(p_row)
                doff = jnp.zeros_like(p_row)
                for k in range(ps.pack):
                    s = subs[k]
                    a, a_dot = s["a"], s["a_dot"]
                    t_before = t_run * jnp.exp(row_pref + off)
                    t_before_dot = t_before * (r_run + row_dpref + doff)
                    t_after = t_before * (1.0 - a)
                    ok = s["contrib"] & (t_after >= T_EPS) \
                        & (t_before >= T_EPS)
                    w = jnp.where(ok, a * t_before, 0.0)
                    w_dot = jnp.where(
                        ok, a_dot * t_before + a * t_before_dot, 0.0)

                    ff = (s["contrib"] & (t_after < T_EPS)
                          & (t_before >= T_EPS)).astype(jnp.float32)
                    frozen = frozen + jnp.sum(ff * t_before, axis=0,
                                              keepdims=True)
                    frozen_dot = frozen_dot + jnp.sum(ff * t_before_dot,
                                                      axis=0, keepdims=True)

                    # VPU accumulation (tiny MXU contractions are latency-bound)
                    acc = acc + jnp.concatenate(
                        [jnp.sum(w * _sub(ps, f, k, 6 + c), axis=0, keepdims=True)
                         for c in range(4)], axis=0)
                    acc_dot = acc_dot + jnp.concatenate(
                        [jnp.sum(w_dot * _sub(ps, f, k, 6 + c)
                                 + w * _sub(ps, fd, k, 6 + c), axis=0,
                                 keepdims=True)
                         for c in range(4)], axis=0)
                    off = off + ls[k]
                    doff = doff + dlogs[k]

                t_run = t_run * jnp.exp(jnp.sum(p_row, axis=0, keepdims=True))
                r_run = r_run + jnp.sum(d_row, axis=0, keepdims=True)
                return (t_run, r_run, frozen, frozen_dot, acc, acc_dot)

            zeros1 = jnp.zeros((1, PIX), jnp.float32)
            init = (jnp.ones((1, PIX), jnp.float32), zeros1, zeros1, zeros1,
                    jnp.zeros((4, PIX), jnp.float32),
                    jnp.zeros((4, PIX), jnp.float32))
            t_run, r_run, frozen, frozen_dot, acc, acc_dot = jax.lax.fori_loop(
                0, nchunks, body, init)

            is_frozen = frozen > 0.0
            t_final = jnp.where(is_frozen, frozen, t_run)
            t_final_dot = jnp.where(is_frozen, frozen_dot, t_run * r_run)
            out_ref[g, 0:4, :] = acc
            out_ref[g, 4:5, :] = t_final
            out_ref[g, 5:8, :] = jnp.zeros((3, PIX), jnp.float32)
            odot_ref[g, 0:4, :] = acc_dot
            odot_ref[g, 4:5, :] = t_final_dot
            odot_ref[g, 5:8, :] = jnp.zeros((3, PIX), jnp.float32)
            return 0

        jax.lax.fori_loop(0, GROUP, one_tile, 0)

    return _tile_jvp_kernel


def _jvp_call(feat, fdot, starts_plus, counts_pad, *, n_programs: int,
              interpret: bool, pack: int = DEFAULT_PACK,
              chunk_rows: int = 0, rect_gate: bool = False):
    ps = get_spec(pack, chunk_rows)
    nt_pad = n_programs * GROUP
    nrec = feat.shape[0] * ps.pack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((GROUP, OUT_ROWS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, OUT_ROWS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.VMEM((2, ps.rpc, ps.row), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        _make_tile_jvp_kernel(ps, rect_gate),
        out_shape=(
            jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
            jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=80 * nrec * PIX, bytes_accessed=2 * nrec * 16 * 4,
            transcendentals=3 * nrec * PIX),
    )(starts_plus, counts_pad, feat, fdot)


def make_jvp_composite(n_programs: int, interpret: bool, fwd_call,
                       pack: int = DEFAULT_PACK, chunk_rows: int = 0,
                       rect_gate: bool = False):
    """Composite-tiles function with a custom_jvp rule (for jax.jvp)."""
    kw = dict(n_programs=n_programs, interpret=interpret, pack=pack,
              chunk_rows=chunk_rows, rect_gate=rect_gate)

    @jax.custom_jvp
    def comp(feat, starts_plus, counts_pad):
        return fwd_call(feat, starts_plus, counts_pad, **kw)

    @comp.defjvp
    def comp_jvp(primals, tangents):
        feat, starts_plus, counts_pad = primals
        fdot = tangents[0]
        tiles, tiles_dot = _jvp_call(feat, fdot, starts_plus, counts_pad,
                                     **kw)
        return tiles, tiles_dot

    return comp
