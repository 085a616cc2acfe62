"""Mean squared distance to the 3 nearest neighbors.

TPU-native replacement for the reference's ``simple_knn._C.distCUDA2``
(scene/gaussian_model.py:22,249: Morton-sorted CUDA KNN used once to seed
log-scales). Here: chunked brute force — each chunk computes a (chunk, P)
squared-distance matrix as ‖a‖² + ‖b‖² − 2a·bᵀ, whose inner term is a single
MXU matmul, then takes the 4 smallest (self included). Exact, O(P²) flops,
but the flops are MXU flops: P=200k is ~2.4e11 flops ≈ well under a second
on one chip, and memory stays bounded by the chunk size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def mean_sq_dist_3nn(points: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """points (P, 3) → (P,) mean of squared distances to 3 nearest others."""
    p = points.shape[0]
    pad = (-p) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e10)
    n = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)

    def body(block):
        # block: (chunk, 3)
        bsq = jnp.sum(block * block, axis=-1)
        d2 = (bsq[:, None] + sq[None, :]
              - 2.0 * jnp.dot(block, pts.T, precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        # 4 smallest include the zero self-distance; drop it.
        neg_top4, _ = jax.lax.top_k(-d2, 4)
        top4 = -neg_top4
        return jnp.sum(top4, axis=-1) - top4[:, 0]  # drop the smallest (self)

    blocks = pts.reshape(n // chunk, chunk, 3)
    out = jax.lax.map(body, blocks).reshape(n)
    return out[:p] / 3.0
