"""Image metrics (reference utils/image_utils.py:14-19)."""

from __future__ import annotations

import jax.numpy as jnp


def mse(a, b):
    return jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)), keepdims=True) \
        if a.ndim > 3 else jnp.mean((a - b) ** 2)


def psnr(a, b):
    m = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def l1_loss_per_pixel(a, b):
    return jnp.abs(a - b)
