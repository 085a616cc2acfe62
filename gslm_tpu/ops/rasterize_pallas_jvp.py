"""Pallas fused forward+tangent (JVP) compositor kernel.

The TPU analog of the reference rasterizer fork's forward-mode dual-tensor
path (rogerhh/diff-gaussian-rasterization-jvp, exercised at reference
tests/test_rasterizer.py:23-33 and driven by gaussians.make_dual +
LinearSolverFunctions.matvec, solver/solver_functions.py:83-99): one walk
over the sorted splat stream computes the primal composite AND its
directional derivative, so the LM J·v matvec costs ~2x a forward render
instead of a separate linearization.

Tangent math (primal notation as in rasterize_pallas._tile_kernel):
  pow_dot = -(c0 dx + c1 dy) mx_dot - (c2 dy + c1 dx) my_dot
            - 0.5 dx^2 c0_dot - dx dy c1_dot - 0.5 dy^2 c2_dot
  a_dot   = op_dot exp(pow) + a_raw pow_dot      (clip straight-through,
                                                  contrib mask constant)
  The transmittance tangent is carried as the logarithmic derivative
  r = T_dot / T, so T_before_dot_i = t_before_i (r + prefix(-a_dot/(1-a)))
  — one extra triangular matmul per chunk.
  w_dot_i = ok_i (a_dot_i t_before_i + a_i T_before_dot_i)
  t_final_dot uses the same first-fail freeze row as the primal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslm_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS
from gslm_tpu.ops.projection import TILE
from gslm_tpu.ops.rasterize_pallas import strict_prefix_sum

# layout constants shared with rasterize_pallas (imported there to avoid a
# cycle we re-declare the record geometry here)
PIX = TILE * TILE
FEAT = 128
K = 256
OUT_ROWS = 8
GROUP = 8


def _tile_jvp_kernel(starts_ref, counts_ref, feat_hbm, fdot_hbm,
                     out_ref, odot_ref, fscratch, dscratch, fsem, dsem):
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

        def dma(buf, hbm, sem, slot, chunk):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(start + chunk * K, K), :],
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

            pow_dot = (-(f[:, 2:3] * dx + f[:, 3:4] * dy) * fd[:, 0:1]
                       - (f[:, 4:5] * dy + f[:, 3:4] * dx) * fd[:, 1:2]
                       - 0.5 * dx * dx * fd[:, 2:3]
                       - dx * dy * fd[:, 3:4]
                       - 0.5 * dy * dy * fd[:, 4:5])
            a_dot = jnp.where(contrib,
                              fd[:, 5:6] * expp + a_raw * pow_dot, 0.0)

            l = jnp.log1p(-a)
            cum = strict_prefix_sum(l)
            t_before = t_run * jnp.exp(cum)
            t_after = t_before * (1.0 - a)

            # transmittance log-derivative prefix
            dlog = -a_dot / (1.0 - a)
            rcum = strict_prefix_sum(dlog)
            t_before_dot = t_before * (r_run + rcum)

            ok = contrib & (t_after >= T_EPS) & (t_before >= T_EPS)
            w = jnp.where(ok, a * t_before, 0.0)
            w_dot = jnp.where(ok, a_dot * t_before + a * t_before_dot, 0.0)

            first_fail = contrib & (t_after < T_EPS) & (t_before >= T_EPS)
            ff = first_fail.astype(jnp.float32)
            frozen = frozen + jnp.sum(ff * t_before, axis=0, keepdims=True)
            frozen_dot = frozen_dot + jnp.sum(ff * t_before_dot, axis=0,
                                              keepdims=True)

            acc = acc + jax.lax.dot_general(
                w, f[:, 6:10], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).T
            acc_dot = acc_dot + (
                jax.lax.dot_general(w_dot, f[:, 6:10],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
                + jax.lax.dot_general(w, fd[:, 6:10],
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)).T

            t_run = t_run * jnp.exp(jnp.sum(l, axis=0, keepdims=True))
            r_run = r_run + jnp.sum(dlog, axis=0, keepdims=True)
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


def _jvp_call(feat, fdot, starts_plus, counts_pad, *, n_programs: int,
              interpret: bool):
    nt_pad = n_programs * GROUP
    L_pad = feat.shape[0]
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
            pltpu.VMEM((2, K, FEAT), jnp.float32),
            pltpu.VMEM((2, K, FEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        _tile_jvp_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
            jax.ShapeDtypeStruct((nt_pad, OUT_ROWS, PIX), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=80 * L_pad * PIX, bytes_accessed=2 * L_pad * FEAT * 4,
            transcendentals=3 * L_pad * PIX),
    )(starts_plus, counts_pad, feat, fdot)


def make_jvp_composite(n_programs: int, interpret: bool, fwd_call):
    """Composite-tiles function with a custom_jvp rule (for jax.jvp)."""
    kw = dict(n_programs=n_programs, interpret=interpret)

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
