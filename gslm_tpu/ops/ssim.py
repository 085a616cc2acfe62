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


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img (B,C,H,W) ⊛ window (k,k) per channel, zero-padded SAME.

    The Gaussian window is rank-1 (outer(g, g)), so the 2D conv is run as
    two 1D passes — k+k instead of k*k MACs per pixel, and jax.grad's
    transposed convs shrink the same way. The 1D taps are recovered from
    the 2D window's leading singular vector so any caller-supplied
    separable window keeps working; a non-separable window would fall
    back to the dense path."""
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
    kh = jnp.asarray(gcol.astype(np.float32))[None, None, :, None]
    kw = jnp.asarray(grow.astype(np.float32))[None, None, None, :]

    def dw(x, kern, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            x, jnp.tile(kern, (c, 1, 1, 1)), window_strides=(1, 1),
            padding=[pad_h, pad_w],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    return dw(dw(img, kh, (k // 2, k // 2), (0, 0)),
              kw, (0, 0), (k // 2, k // 2))


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
             sigma: float = 1.5) -> jnp.ndarray:
    """Per-pixel SSIM map, same shape as inputs ((...,C,H,W))."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    window = _gaussian_window(window_size, sigma)

    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2

    out = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) /
           ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return out[0] if squeeze else out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Scalar mean SSIM (reference loss_utils.py:59-69 semantics)."""
    return jnp.mean(ssim_map(img1, img2, window_size))
