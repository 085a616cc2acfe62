"""Windowed SSIM (11x11 Gaussian, sigma 1.5) and its per-pixel map.

JAX equivalent of the reference's utils/loss_utils.py:48-122 (torch
depthwise-conv SSIM with zero 'SAME' padding) and of the fused CUDA SSIM
kernels (rahul-goel/fused-ssim, in-fork _C.fusedssim) — here the "fusion" is
XLA's: the depthwise convs lower to MXU convolutions and the elementwise
epilogue fuses into them, and jax.grad supplies the backward that the CUDA
version hand-writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01 ** 2
C2 = 0.03 ** 2


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _shift_add_1d(img: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """1D zero-padded SAME correlation along ``axis`` as k shifted adds.

    TPU-native small-channel "convolution". Three designs measured at
    1080p on v5e (scripts/profile_adam.py + forced-readback timing, r4):
    lax.conv with feature_group_count=C (C=3) cannot tile onto the MXU
    (~99 ms for the 5 SSIM blurs); a banded-Toeplitz einsum on the MXU
    ships (n, n) matrix literals with every remote execution (~41 ms
    fwd+bwd); k static slices of one zero-padded buffer fuse into a
    single elementwise XLA pass (k loads + 1 store per pixel) and win at
    ~16 ms fwd+bwd for the whole 5-statistic stack. Plain jnp ops keep
    jax.grad (slice-transpose chain), jax.jvp (linear map), vmap, and
    shard_map all exact with no custom rules."""
    k = len(taps)
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(img, pad)
    n = img.shape[axis]
    out = None
    for t in range(k):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(t, t + n)
        term = np.float32(taps[t]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img (B,C,H,W) ⊛ window (k,k) per channel, zero-padded SAME.

    The Gaussian window is rank-1 (outer(g, g)), so the 2D conv is run as
    two 1D shift-add passes — k+k instead of k*k MACs per pixel, all in
    fused elementwise XLA ops (see _shift_add_1d). The 1D taps are
    recovered from the 2D window's leading singular vector so any
    caller-supplied separable window keeps working; a non-separable
    window falls back to the dense conv path."""
    c = img.shape[1]
    k = window.shape[0]
    w = np.asarray(window, np.float64)
    u, s, vt = np.linalg.svd(w)
    if s[1:].max(initial=0.0) > 1e-12 * s[0]:   # not rank-1: dense conv
        kernel = jnp.asarray(window)[None, None].repeat(c, axis=0)
        return jax.lax.conv_general_dilated(
            img, kernel, window_strides=(1, 1),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    gcol = u[:, 0] * np.sqrt(s[0])
    grow = vt[0] * np.sqrt(s[0])
    if gcol.sum() < 0:                           # SVD sign convention
        gcol, grow = -gcol, -grow
    out = _shift_add_1d(img, gcol.astype(np.float32), axis=img.ndim - 2)
    return _shift_add_1d(out, grow.astype(np.float32), axis=img.ndim - 1)


@functools.lru_cache(maxsize=8)
def _diag_kernels(c: int, window_size: int, sigma: float):
    """Diagonal dense-conv kernels for a c-channel separable blur.

    A feature_group_count=c depthwise conv cannot tile onto the MXU
    (contraction dim 1); a DENSE (c, c, k, 1) kernel whose off-diagonal
    channels are zero computes the identical per-channel blur as a real
    c*k-contraction MXU convolution. Wasteful in FLOPs (c x), free in
    wall time at c=15."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2)).astype(np.float64)
    g = (g / g.sum()).astype(np.float32)
    kh = np.zeros((c, c, window_size, 1), np.float32)
    kw = np.zeros((c, c, 1, window_size), np.float32)
    for i in range(c):
        kh[i, i, :, 0] = g
        kw[i, i, 0, :] = g
    return kh, kw


def _blur_nchw(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (B, C, H, W), zero-padded SAME, via two
    diagonal dense convs (see _diag_kernels). jax.grad's transpose and
    jax.jvp are convs of the same shape — MXU all the way down."""
    c = x.shape[1]
    kh, kw = _diag_kernels(c, window_size, sigma)
    r = window_size // 2
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(kh), window_strides=(1, 1),
        padding=[(r, r), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGH)
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kw), window_strides=(1, 1),
        padding=[(0, 0), (r, r)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGH)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
             sigma: float = 1.5) -> jnp.ndarray:
    """Per-pixel SSIM map, same shape as inputs ((...,C,H,W))."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]

    # all 5 windowed statistics ride ONE channel-stacked separable blur:
    # a Pallas roll-based kernel on TPU (the fused-CUDA-SSIM analog; conv
    # and shift-add formulations measured 56-99 ms at 1080p on v5e), the
    # diagonal dense conv elsewhere (fast on CPU, exercised by tests)
    stats = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1)
    if jax.default_backend() == "tpu":
        from gslm_tpu.ops.blur_pallas import blur_same
        xs = np.arange(window_size) - window_size // 2
        g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
        blurred = blur_same(stats, (g / g.sum()).astype(np.float32))
    else:
        blurred = _blur_nchw(stats, window_size, sigma)
    c = img1.shape[1]
    mu1, mu2, e11, e22, e12 = (blurred[:, i * c:(i + 1) * c]
                               for i in range(5))
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2

    out = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) /
           ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return out[0] if squeeze else out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Scalar mean SSIM (reference loss_utils.py:59-69 semantics)."""
    return jnp.mean(ssim_map(img1, img2, window_size))
