"""Builds a tiny COLMAP-format dataset on disk from a known blob scene —
the fixture equivalent of the reference's toy-scene + checkpoint test inputs
(tests/test_batch_render.py CLI datasets), fully self-contained."""

from __future__ import annotations

import math
import os

import numpy as np

from gslm_tpu.data import colmap
from gslm_tpu.models.cameras import batch_from_metas
from gslm_tpu.models.gaussians import GaussianParams
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.ops.sh import rgb2sh
from gslm_tpu.utils.graphics import fov2focal, rotmat2qvec

from tests.utils import make_camera

BLOB_XYZ = np.array([[-1.5, 0, 0], [0, 0, 0], [1.5, 0, 0],
                     [0, -1.0, 0.5], [0, 1.0, -0.5]], np.float32)
BLOB_RGB = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, 1, 0], [0, 1, 1]], np.float32)


def blob_params(num_images: int = 8, opacity: float = 2.0,
                log_scale: float = math.log(0.3)) -> GaussianParams:
    import jax.numpy as jnp
    n = BLOB_XYZ.shape[0]
    return GaussianParams(
        xyz=jnp.asarray(BLOB_XYZ),
        features_dc=rgb2sh(jnp.asarray(BLOB_RGB)).reshape(n, 1, 3),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), log_scale),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), opacity),
        exposure=jnp.broadcast_to(jnp.eye(3, 4), (num_images, 3, 4)),
        sh_degree=3)


def save_png(path, img_chw):
    from PIL import Image
    arr = (np.clip(np.asarray(img_chw), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


def build_colmap_scene(root: str, n_views: int = 8, height: int = 64,
                       width: int = 64) -> str:
    """Render the blob scene from a ring of cameras and write a COLMAP
    dataset (sparse/0/{cameras,images,points3D}.bin + images/*.png)."""
    import jax.numpy as jnp

    from gslm_tpu.renderer import batch_render

    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    metas = [make_camera(height=height, width=width,
                         angle=2 * math.pi * i / n_views, radius=5.0,
                         exposure_idx=i) for i in range(n_views)]
    params = blob_params(num_images=n_views)
    cfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=8)
    batch = batch_from_metas(metas)
    imgs = batch_render(params, batch, jnp.zeros(3), config=cfg).render

    cams, images = {}, {}
    for i, m in enumerate(metas):
        name = f"view_{i:03d}.png"
        save_png(os.path.join(root, "images", name), imgs[i])
        fx = fov2focal(m.fovx, width)
        fy = fov2focal(m.fovy, height)
        cid = i + 1
        cams[cid] = colmap.ColmapCamera(cid, "PINHOLE", width, height,
                                        np.array([fx, fy, width / 2, height / 2]))
        qvec = rotmat2qvec(m.R.T)   # meta.R stores the transpose
        images[cid] = colmap.ColmapImage(cid, qvec, m.T.astype(np.float64),
                                         cid, name, np.zeros((0, 2)),
                                         np.zeros(0, np.int64))

    colmap.write_cameras_binary(cams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(images, os.path.join(root, "sparse/0/images.bin"))

    rng = np.random.default_rng(0)
    pts = np.concatenate([BLOB_XYZ + rng.normal(0, 0.2, BLOB_XYZ.shape)
                          .astype(np.float32) for _ in range(8)], axis=0)
    rgb = np.concatenate([BLOB_RGB * 255] * 8, axis=0)
    colmap.write_points3d_binary(pts.astype(np.float64), rgb.astype(np.uint8),
                                 np.zeros(len(pts)),
                                 os.path.join(root, "sparse/0/points3D.bin"))
    return root
