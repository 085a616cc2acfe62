"""Camera containers as pytrees.

Replaces the reference's ``Camera``/``MiniCam`` torch modules
(scene/cameras.py:19-102). Two layers:

- ``CameraMeta``: host-side per-view record (numpy matrices, image path,
  name) produced by the dataset readers.
- ``Camera`` / ``CameraBatch``: device pytrees with stacked matrices and
  padded ground-truth images, ready to flow through jit. A batch pads every
  view to a common (H, W) canvas with a validity extent per view — the same
  padding contract as the reference's batch rasterizer
  (gaussian_renderer/batch_render.py:89-133) but carried in one struct.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from gslm_tpu.struct import pytree_dataclass
from gslm_tpu.utils.graphics import projection_matrix, world_to_view

Z_NEAR = 0.01
Z_FAR = 100.0


@dataclasses.dataclass
class CameraMeta:
    """Host-side view description (reference scene/cameras.py:19-58 minus
    torch). Image pixels are loaded lazily by the scene loader."""

    uid: int
    colmap_id: int
    R: np.ndarray            # (3,3) cam-to-world rotation (COLMAP convention)
    T: np.ndarray            # (3,) world-to-cam translation
    fovx: float
    fovy: float
    width: int
    height: int
    image_name: str
    image_path: str | None = None
    depth_path: str | None = None
    depth_params: dict | None = None
    is_test: bool = False
    # filled by Scene when images are loaded:
    image: np.ndarray | None = None        # (3, H, W) float32 in [0,1]
    alpha_mask: np.ndarray | None = None   # (1, H, W) float32
    invdepthmap: np.ndarray | None = None  # (1, H, W) float32
    depth_reliable: bool = False
    depth_mask: np.ndarray | None = None
    exposure_idx: int = 0
    trans: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    @property
    def world_view(self) -> np.ndarray:
        return world_to_view(self.R, self.T, self.trans, self.scale)

    @property
    def projection(self) -> np.ndarray:
        return projection_matrix(Z_NEAR, Z_FAR, self.fovx, self.fovy)

    @property
    def full_proj(self) -> np.ndarray:
        return (self.projection @ self.world_view).astype(np.float32)

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.world_view)[:3, 3].astype(np.float32)


@pytree_dataclass(static_fields=("height", "width"))
class Camera:
    """Single-view device camera: everything the rasterizer needs."""

    world_view: jnp.ndarray   # (4, 4)
    full_proj: jnp.ndarray    # (4, 4)
    campos: jnp.ndarray       # (3,)
    tanfovx: jnp.ndarray      # () float32
    tanfovy: jnp.ndarray      # () float32
    exposure_idx: jnp.ndarray  # () int32
    height: int
    width: int


@pytree_dataclass(static_fields=("height", "width"))
class CameraBatch:
    """B stacked views on a common padded canvas.

    ``heights``/``widths`` record each view's true extent; pixels beyond it
    are invalid and must not contribute to losses (reference
    loss_image_state.py:25-38 padded-region-zero invariant).
    """

    world_view: jnp.ndarray    # (B, 4, 4)
    full_proj: jnp.ndarray     # (B, 4, 4)
    campos: jnp.ndarray        # (B, 3)
    tanfovx: jnp.ndarray       # (B,)
    tanfovy: jnp.ndarray       # (B,)
    exposure_idx: jnp.ndarray  # (B,) int32
    heights: jnp.ndarray       # (B,) int32 true extents
    widths: jnp.ndarray        # (B,) int32
    gt_image: jnp.ndarray      # (B, 3, H, W) padded ground truth
    alpha_mask: jnp.ndarray    # (B, 1, H, W); all-ones when unused
    invdepth_gt: jnp.ndarray   # (B, 1, H, W) monocular inverse depth (0 if none)
    depth_mask: jnp.ndarray    # (B, 1, H, W) depth validity (0 if none)
    height: int                # padded canvas H (static)
    width: int                 # padded canvas W (static)

    @property
    def batch_size(self) -> int:
        return self.world_view.shape[0]

    def view(self, i: int) -> Camera:
        return Camera(world_view=self.world_view[i], full_proj=self.full_proj[i],
                      campos=self.campos[i], tanfovx=self.tanfovx[i],
                      tanfovy=self.tanfovy[i], exposure_idx=self.exposure_idx[i],
                      height=self.height, width=self.width)

    def pixel_valid(self) -> jnp.ndarray:
        """(B, 1, H, W) mask of in-extent pixels."""
        ys = jnp.arange(self.height)[None, :, None]
        xs = jnp.arange(self.width)[None, None, :]
        valid = ((ys < self.heights[:, None, None]) &
                 (xs < self.widths[:, None, None]))
        return valid[:, None].astype(jnp.float32)


def camera_from_meta(meta: CameraMeta) -> Camera:
    return Camera(
        world_view=jnp.asarray(meta.world_view),
        full_proj=jnp.asarray(meta.full_proj),
        campos=jnp.asarray(meta.camera_center),
        tanfovx=jnp.float32(math.tan(meta.fovx * 0.5)),
        tanfovy=jnp.float32(math.tan(meta.fovy * 0.5)),
        exposure_idx=jnp.int32(meta.exposure_idx),
        height=meta.height, width=meta.width)


def batch_from_metas(metas: list[CameraMeta], pad_hw: tuple[int, int] | None = None
                     ) -> CameraBatch:
    """Stack host camera records into a padded device batch."""
    b = len(metas)
    max_h = max(m.height for m in metas)
    max_w = max(m.width for m in metas)
    if pad_hw is not None:
        max_h = max(max_h, pad_hw[0])
        max_w = max(max_w, pad_hw[1])

    gt = np.zeros((b, 3, max_h, max_w), dtype=np.float32)
    am = np.ones((b, 1, max_h, max_w), dtype=np.float32)
    dg = np.zeros((b, 1, max_h, max_w), dtype=np.float32)
    dm = np.zeros((b, 1, max_h, max_w), dtype=np.float32)
    for i, m in enumerate(metas):
        if m.image is not None:
            gt[i, :, :m.height, :m.width] = m.image
        if m.alpha_mask is not None:
            am[i, :, :m.height, :m.width] = m.alpha_mask
        if m.invdepthmap is not None and m.depth_reliable:
            dg[i, :, :m.height, :m.width] = m.invdepthmap
            if m.depth_mask is not None:
                dm[i, :, :m.height, :m.width] = m.depth_mask

    return CameraBatch(
        world_view=jnp.asarray(np.stack([m.world_view for m in metas])),
        full_proj=jnp.asarray(np.stack([m.full_proj for m in metas])),
        campos=jnp.asarray(np.stack([m.camera_center for m in metas])),
        tanfovx=jnp.asarray(np.array([math.tan(m.fovx * 0.5) for m in metas],
                                     dtype=np.float32)),
        tanfovy=jnp.asarray(np.array([math.tan(m.fovy * 0.5) for m in metas],
                                     dtype=np.float32)),
        exposure_idx=jnp.asarray(np.array([m.exposure_idx for m in metas],
                                          dtype=np.int32)),
        heights=jnp.asarray(np.array([m.height for m in metas], dtype=np.int32)),
        widths=jnp.asarray(np.array([m.width for m in metas], dtype=np.int32)),
        gt_image=jnp.asarray(gt), alpha_mask=jnp.asarray(am),
        invdepth_gt=jnp.asarray(dg), depth_mask=jnp.asarray(dm),
        height=max_h, width=max_w)
