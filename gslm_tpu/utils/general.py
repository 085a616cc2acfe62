"""General numeric helpers (activation inverses, quaternion algebra, LR
schedules). Functional JAX equivalents of the reference's
utils/general_utils.py:30-111."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


_SAFE_STATE_ORIG = None


def safe_state(silent: bool = False, seed: int = 0):
    """Silence and/or timestamp stdout and seed the host RNGs (reference
    utils/general_utils.py:123-144: every line gets a [dd/mm hh:mm:ss]
    suffix, ``--quiet`` drops output entirely, and the global seeds are
    fixed; JAX PRNG keys are explicit so only the host RNGs need seeding
    here). Idempotent: repeated calls replace the wrapper instead of
    stacking (so a quiet run does not mute later verbose runs in the same
    process)."""
    import random as _random
    import sys
    from datetime import datetime

    global _SAFE_STATE_ORIG
    if _SAFE_STATE_ORIG is None:
        _SAFE_STATE_ORIG = sys.stdout
    old = _SAFE_STATE_ORIG

    class _TimestampedStdout:
        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                x = x[:-1] + f" [{stamp}]\n"
            old.write(x)

        def flush(self):
            old.flush()

        def isatty(self):
            return old.isatty()

    sys.stdout = _TimestampedStdout()
    _random.seed(seed)
    np.random.seed(seed)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Log-linear LR decay with optional sine-ramped delay; continuous analog
    of the reference's get_expon_lr_func (general_utils.py:30-63). Works on
    traced or concrete ``step``."""
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    if (isinstance(lr_init, (int, float)) and lr_init == 0.0
            and isinstance(lr_final, (int, float)) and lr_final == 0.0):
        return jnp.zeros_like(step)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def quat_normalize(q, eps: float = 1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q):
    """(..., 4) normalized (w,x,y,z) quaternion → (..., 3, 3) rotation.
    Same element layout as reference build_rotation (general_utils.py:79-100),
    but expects pre-normalized input (normalization is a separate op so its
    JVP is explicit)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def build_scaling_rotation(scale, q):
    """L = R(q) diag(scale): (..., 3) x (..., 4) → (..., 3, 3); covariance is
    Σ = L Lᵀ (reference general_utils.py:102-111)."""
    R = quat_to_rotmat(quat_normalize(q))
    return R * scale[..., None, :]


def covariance_from_scaling_rotation(scale, q):
    """Upper-triangular 6-vector of Σ = L Lᵀ (reference
    gaussian_model.py:36-41 + strip_symmetric)."""
    L = build_scaling_rotation(scale, q)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1000000):
    """Host-side schedule closure (numpy), for loops that live outside jit."""

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * math.sin(
                0.5 * math.pi * float(np.clip(step / lr_delay_steps, 0, 1)))
        else:
            delay_rate = 1.0
        t = float(np.clip(step / max_steps, 0, 1))
        log_lerp = math.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper
