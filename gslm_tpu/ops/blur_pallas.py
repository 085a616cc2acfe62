"""Pallas TPU separable-blur kernel for the fused SSIM loss.

The reference pays for SSIM with a hand-fused CUDA kernel
(rahul-goel/fused-ssim, vendored as the in-fork ``_C.fusedssim`` —
reference utils/loss_utils.py:16-38) because framework convolutions are
the wrong shape for a 3-channel 11-tap blur. The same is true on TPU,
measured at 1080p on v5e (scripts/profile_adam.py, r4):

  - ``lax.conv`` with ``feature_group_count=3`` cannot tile onto the MXU
    (contraction dim 1): ~99 ms for the 5 SSIM blur passes;
  - a channel-stacked DIAGONAL dense conv reaches the MXU but burns 15x
    the FLOPs and relayouts: ~56 ms;
  - fused shift-add slicing is VPU lane-rotation bound: ~21 ms.

This kernel runs the zero-padded SAME separable blur the way the raster
kernels run compositing: rows of the image DMA'd into VMEM in slabs with
a vertical halo, the vertical pass as k shifted in-VMEM row windows, the
horizontal pass as k masked ``pltpu.roll`` lane rotations — one HBM read
and one write per pixel.

The blur is linear and (for symmetric taps) self-adjoint, so
``jax.custom_derivatives.linear_call`` supplies both transforms exactly:
the VJP is the blur with reversed taps (same kernel), and the JVP of a
linear map is the map itself — the LM operators' forward-mode matvecs
(solver/operators.py) go through the identical kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 64          # output rows per program


def _make_blur_kernel(taps: tuple, rb: int, width: int, halo: int,
                      nrb: int):
    """One program blurs rb output rows of one plane.

    The input slab ((rb + 2*halo) rows, vertical halo included) is DMA'd
    manually from the zero-padded HBM image — BlockSpec index maps are
    block-granular, so overlapping halo reads need explicit copies (same
    pattern as the raster kernels' record-chunk DMAs)."""
    k = len(taps)

    pt = 8                       # 8-aligned top pad (halo + 3 extra zeros)
    slab = rb + 2 * pt           # Mosaic DMA slices must be 8-row aligned

    def kernel(x_hbm, o_ref, scratch, sem):
        p = pl.program_id(0)
        r = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[p, pl.ds(r * rb, slab), :], scratch, sem)
        cp.start()
        cp.wait()
        x = scratch[...]                              # (slab, W)
        # vertical pass: out row i needs slab rows [i+pt-halo, i+pt+halo]
        v = None
        for t in range(k):
            o = t + pt - halo
            term = np.float32(taps[t]) * x[o:o + rb, :]
            v = term if v is None else v + term
        # horizontal pass: masked lane rotations (zero-padded SAME)
        col = jax.lax.broadcasted_iota(jnp.int32, (rb, width), 1)
        out = None
        for t in range(k):
            s = t - halo                    # out[:, i] += w_t * v[:, i+s]
            if s == 0:
                shifted = v
            else:
                # roll by -s brings lane i+s to lane i; mask wrapped lanes
                shifted = pltpu.roll(v, (-s) % width, axis=1)
            valid = (col + s >= 0) & (col + s < width)
            term = np.float32(taps[t]) * jnp.where(valid, shifted, 0.0)
            out = term if out is None else out + term
        o_ref[...] = out[None]

    return kernel


@functools.lru_cache(maxsize=16)
def _blur_call(taps: tuple, planes: int, height: int, width: int,
               interpret: bool):
    """Compiled blur for a (planes, height, width) f32 image."""
    k = len(taps)
    halo = k // 2
    assert halo <= 8, "halo must fit the 8-row aligned slab padding"
    rb = RB
    nrb = -(-height // rb)
    hpad = nrb * rb
    pt = 8

    def run(x):
        # zero-pad: 8-aligned vertical halo + row-block round-up (the
        # last block's slab reads rb + 2*pt rows past its start)
        x = jnp.pad(x, ((0, 0), (pt, hpad - height + pt), (0, 0)))
        out = pl.pallas_call(
            _make_blur_kernel(taps, rb, width, halo, nrb),
            grid=(planes, nrb),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, rb, width), lambda p, r: (p, r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((planes, nrb * rb, width),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rb + 16, width), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * k * planes * hpad * width,
                bytes_accessed=2 * 4 * planes * hpad * width,
                transcendentals=0),
        )(x)
        return out[:, :height, :]

    return run


def blur_same(img: jnp.ndarray, taps, interpret: bool | None = None
              ) -> jnp.ndarray:
    """Separable zero-padded SAME correlation of ``img`` (..., H, W) with
    1D ``taps`` applied along H then W. Linear; VJP = reversed-tap blur,
    JVP = the blur itself (installed via linear_call)."""
    taps = tuple(float(t) for t in np.asarray(taps))
    rev = taps[::-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = img.shape
    h, w = shape[-2], shape[-1]
    planes = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1

    def apply(ts, x):
        x3 = x.reshape(planes, h, w)
        out = _blur_call(ts, planes, h, w, interpret)(x3)
        return out.reshape(shape)

    from jax.custom_derivatives import linear_call
    return linear_call(
        lambda _, x: apply(taps, x),
        lambda _, ct: apply(rev, ct),
        (), img)
