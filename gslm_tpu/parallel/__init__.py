"""Multi-chip execution over a (data, model) device mesh.

The reference is strictly single-GPU (no torch.distributed anywhere; device
strings hardcoded to "cuda", e.g. reference scene/gaussian_model.py:241-266)
— this package supplies the scaling dimension as new, TPU-native capability:

- ``data`` axis: camera views. The batched renderer/losses shard their B
  axis here; per-view partial gradients, JᵀJ-matvec partials, and loss
  scalars all-reduce over ICI (inserted by GSPMD from the sharding
  annotations — the jax.sharding/pjit recipe, not hand-written NCCL).
- ``model`` axis: the Gaussian capacity axis. Parameter storage, optimizer
  moments, preprocess math, and densification statistics are sharded P/m
  per chip; the projected 2D splats (a ~16-float record per Gaussian, much
  smaller than the 59-float parameter row at SH degree 3) are gathered
  where the tile pipeline needs global sort order.

See mesh.py for the sharding layouts and steps.py for the sharded train/LM
step factories.
"""

from gslm_tpu.parallel.mesh import (adam_sharding, aux_sharding,
                                    camera_sharding, make_mesh,
                                    maybe_initialize_distributed,
                                    params_sharding, replicated, shard_state)
from gslm_tpu.parallel.steps import (make_dp_lm_step, make_dp_train_step,
                                     make_mp_densify, make_mp_lm_step,
                                     make_mp_train_step,
                                     make_sharded_lm_step,
                                     make_sharded_train_step)

__all__ = [
    "make_mesh", "params_sharding", "aux_sharding", "adam_sharding",
    "camera_sharding", "replicated", "shard_state",
    "maybe_initialize_distributed",
    "make_sharded_train_step", "make_sharded_lm_step",
    "make_dp_train_step", "make_dp_lm_step", "make_mp_train_step",
    "make_mp_lm_step", "make_mp_densify",
]
