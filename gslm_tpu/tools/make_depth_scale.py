"""Align monocular inverse-depth maps to COLMAP sparse depth.

Equivalent of the reference's utils/make_depth_scale.py: for every image,
project its COLMAP 3D points to get sparse inverse depths, sample the
monocular inverse-depth PNG (Depth-Anything-V2 style, 16-bit) at the same
pixels, and fit per-image (scale, offset) by matching median and mean
absolute deviation. Writes ``sparse/0/depth_params.json`` for the scene
loaders' depth-regularization path. Parallelism uses a thread pool instead
of joblib.

Usage: python -m gslm_tpu.tools.make_depth_scale --base_dir <scene>
       --depths_dir <scene>/depths [--model_type bin]
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from gslm_tpu.data import colmap
from gslm_tpu.utils.graphics import qvec2rotmat


def get_scales(image_meta, cameras, points3d_ordered, depths_dir: str):
    import cv2

    cam = cameras[image_meta.camera_id]
    pts_idx = image_meta.point3d_ids
    mask = (pts_idx >= 0) & (pts_idx < len(points3d_ordered))
    pts_idx = pts_idx[mask]
    valid_xys = image_meta.xys[mask]
    pts = points3d_ordered[pts_idx] if len(pts_idx) else np.zeros((1, 3))

    R = qvec2rotmat(image_meta.qvec)
    cam_pts = pts @ R.T + image_meta.tvec
    invcolmapdepth = 1.0 / np.maximum(cam_pts[..., 2], 1e-12)

    stem = image_meta.name[: -(len(image_meta.name.split(".")[-1]) + 1)]
    invmono = cv2.imread(os.path.join(depths_dir, stem + ".png"),
                         cv2.IMREAD_UNCHANGED)
    if invmono is None:
        return None
    if invmono.ndim != 2:
        invmono = invmono[..., 0]
    invmono = invmono.astype(np.float32) / (2 ** 16)
    s = invmono.shape[0] / cam.height

    maps = (valid_xys * s).astype(np.float32)
    valid = ((maps[..., 0] >= 0) & (maps[..., 1] >= 0)
             & (maps[..., 0] < cam.width * s)
             & (maps[..., 1] < cam.height * s) & (invcolmapdepth > 0))

    if valid.sum() > 10 and (invcolmapdepth.max() - invcolmapdepth.min()) > 1e-3:
        maps = maps[valid]
        invcolmapdepth = invcolmapdepth[valid]
        # NOTE: the reference indexes [..., 0] here, relying on cv2 4.x
        # returning (n, 1) for 1-D maps; cv2 5.x returns (1, n) and that
        # indexing silently keeps ONE sample — flatten instead
        invmonodepth = cv2.remap(invmono, maps[..., 0], maps[..., 1],
                                 interpolation=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_REPLICATE).reshape(-1)
        # median/MAD alignment (reference make_depth_scale.py:52-59)
        t_colmap = np.median(invcolmapdepth)
        s_colmap = np.mean(np.abs(invcolmapdepth - t_colmap))
        t_mono = np.median(invmonodepth)
        s_mono = np.mean(np.abs(invmonodepth - t_mono))
        scale = s_colmap / s_mono if s_mono > 0 else 0.0
        offset = t_colmap - t_mono * scale
    else:
        scale, offset = 0.0, 0.0
    return {"image_name": stem, "scale": float(scale),
            "offset": float(offset)}


def main():
    parser = ArgumentParser()
    parser.add_argument("--base_dir", required=True)
    parser.add_argument("--depths_dir", required=True)
    parser.add_argument("--model_type", default="bin", choices=["bin", "txt"])
    args = parser.parse_args()

    sparse = os.path.join(args.base_dir, "sparse", "0")
    if args.model_type == "bin":
        cameras = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        images = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        ids, xyz = colmap.read_points3d_binary_with_ids(
            os.path.join(sparse, "points3D.bin"))
    else:
        cameras = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))
        images = colmap.read_images_text(os.path.join(sparse, "images.txt"))
        ids, xyz = colmap.read_points3d_text_with_ids(
            os.path.join(sparse, "points3D.txt"))

    points3d_ordered = np.zeros((ids.max() + 1 if len(ids) else 1, 3))
    points3d_ordered[ids] = xyz

    with ThreadPoolExecutor() as pool:
        results = list(pool.map(
            lambda im: get_scales(im, cameras, points3d_ordered,
                                  args.depths_dir), images.values()))

    depth_params = {r["image_name"]: {"scale": r["scale"],
                                      "offset": r["offset"]}
                    for r in results if r is not None}
    with open(os.path.join(sparse, "depth_params.json"), "w") as f:
        json.dump(depth_params, f, indent=2)
    print(f"Wrote {len(depth_params)} depth params to "
          f"{os.path.join(sparse, 'depth_params.json')}")


if __name__ == "__main__":
    main()
