"""Shared test helpers: tiny synthetic scenes + cameras.

Thin re-export of the package's synthetic-scene generators
(gslm_tpu/utils/synthetic.py) so tests, benchmarks, and the multi-chip dry
run all exercise the same fixtures.
"""

from __future__ import annotations

from gslm_tpu.utils.synthetic import (make_camera, random_gaussians,
                                      ring_camera_batch)

__all__ = ["make_camera", "random_gaussians", "ring_camera_batch"]
