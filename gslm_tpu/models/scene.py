"""Scene: dataset assembly, image loading, model init, save/load.

Functional equivalent of the reference's ``Scene`` (scene/__init__.py:21-100)
plus the image-side work of ``loadCam`` (utils/camera_utils.py:20-67) and
``Camera.__init__`` (scene/cameras.py:19-89): resolution selection, alpha
masks, train/test exposure half-masking, monocular inverse-depth alignment,
nerf++ extent, PLY + exposure.json export, cameras.json.
"""

from __future__ import annotations

import json
import os
import random

import numpy as np

from gslm_tpu.data.ply import load_gaussians_ply, save_gaussians_ply, store_point_cloud
from gslm_tpu.data.readers import SceneInfo, load_scene_info
from gslm_tpu.models.cameras import CameraMeta
from gslm_tpu.models.gaussians import GaussianAux, GaussianParams, create_from_pcd, init_aux
from gslm_tpu.utils.graphics import fov2focal

_WARNED = False


def resolve_resolution(orig_w: int, orig_h: int, resolution: int,
                       resolution_scale: float = 1.0) -> tuple[int, int]:
    """Target (w, h) following the reference's rules
    (camera_utils.py:42-62): -1 caps width at 1600; 1/2/4/8 are divisors;
    other values are an explicit target width."""
    global _WARNED
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        if orig_w > 1600:
            if not _WARNED:
                print("[ INFO ] Encountered quite large input images "
                      "(>1.6K pixels width), rescaling to 1.6K.")
                _WARNED = True
            global_down = orig_w / 1600
        else:
            global_down = 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_camera_pixels(meta: CameraMeta, resolution: int,
                       resolution_scale: float = 1.0,
                       train_test_exp: bool = False,
                       is_test_dataset: bool = False,
                       is_nerf_synthetic: bool = False) -> CameraMeta:
    """Fill meta.image / alpha_mask / invdepthmap at the selected resolution
    (reference camera_utils.py:20-67 + cameras.py:42-78)."""
    from PIL import Image

    if meta.image is not None and meta.alpha_mask is not None:
        # Blender path pre-composited full-res RGBA; resize if needed.
        rgb = np.asarray(meta.image)
        alpha = np.asarray(meta.alpha_mask)
        w, h = resolve_resolution(meta.width, meta.height, resolution,
                                  resolution_scale)
        if (h, w) != rgb.shape[1:]:
            img = Image.fromarray(
                (np.concatenate([rgb, alpha], 0).transpose(1, 2, 0) * 255)
                .astype(np.uint8))
            img = img.resize((w, h))
            arr = np.asarray(img, dtype=np.float32).transpose(2, 0, 1) / 255.0
            rgb, alpha = arr[:3], arr[3:4]
    else:
        img = Image.open(meta.image_path)
        w, h = resolve_resolution(*img.size, resolution, resolution_scale)
        img = img.resize((w, h))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None].repeat(3, -1)
        arr = arr.transpose(2, 0, 1)
        rgb = arr[:3]
        alpha = arr[3:4] if arr.shape[0] == 4 else np.ones((1, h, w), np.float32)

    if train_test_exp and meta.is_test:
        alpha = alpha.copy()
        if is_test_dataset:
            alpha[..., :alpha.shape[-1] // 2] = 0   # eval on right half
        else:
            alpha[..., alpha.shape[-1] // 2:] = 0   # fit exposure on left half

    invdepth = None
    depth_mask = None
    depth_reliable = False
    if meta.depth_path and os.path.exists(meta.depth_path):
        import cv2
        raw = cv2.imread(meta.depth_path, -1)
        divisor = 512.0 if is_nerf_synthetic else float(2 ** 16)
        invdepth = raw.astype(np.float32) / divisor
        invdepth = cv2.resize(invdepth, (w, h))
        invdepth[invdepth < 0] = 0
        depth_mask = np.ones((1, h, w), np.float32)
        depth_reliable = True
        dp = meta.depth_params
        if dp is not None:
            if dp["scale"] < 0.2 * dp["med_scale"] or dp["scale"] > 5 * dp["med_scale"]:
                depth_reliable = False
                depth_mask *= 0
            if dp["scale"] > 0:
                invdepth = invdepth * dp["scale"] + dp["offset"]
        if invdepth.ndim != 2:
            invdepth = invdepth[..., 0]
        invdepth = invdepth[None]

    import dataclasses
    return dataclasses.replace(
        meta, image=np.clip(rgb, 0.0, 1.0), alpha_mask=alpha, width=w,
        height=h, invdepthmap=invdepth, depth_mask=depth_mask,
        depth_reliable=depth_reliable)


def camera_to_json(idx: int, meta: CameraMeta) -> dict:
    """cameras.json entry (reference camera_utils.py:79-99)."""
    import numpy.linalg as la
    rt = np.zeros((4, 4))
    rt[:3, :3] = meta.R.T
    rt[:3, 3] = meta.T
    rt[3, 3] = 1.0
    c2w = la.inv(rt)
    return {"id": idx, "img_name": meta.image_name, "width": meta.width,
            "height": meta.height, "position": c2w[:3, 3].tolist(),
            "rotation": [r.tolist() for r in c2w[:3, :3]],
            "fy": fov2focal(meta.fovy, meta.height),
            "fx": fov2focal(meta.fovx, meta.width)}


class Scene:
    """Host-side scene container. Holds CameraMeta lists (with pixels
    loaded), the Gaussian model pytree and its aux state."""

    def __init__(self, source_path: str, model_path: str, *, images: str = "images",
                 depths: str = "", resolution: int = -1, white_background: bool = False,
                 eval_split: bool = False, train_test_exp: bool = False,
                 sh_degree: int = 3, load_iteration: int | None = None,
                 shuffle: bool = True, resolution_scales=(1.0,),
                 capacity: int | None = None):
        self.model_path = model_path
        self.train_test_exp = train_test_exp
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                pc_dir = os.path.join(model_path, "point_cloud")
                iters = [int(d.split("_")[-1]) for d in os.listdir(pc_dir)
                         if d.startswith("iteration_")]
                load_iteration = max(iters)
            self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {load_iteration}")

        if os.path.exists(os.path.join(source_path, "sparse")):
            info = load_scene_info(source_path, images=images, depths=depths,
                                   eval_split=eval_split,
                                   train_test_exp=train_test_exp)
        else:
            info = load_scene_info(source_path, white_background=white_background,
                                   depths=depths, eval_split=eval_split)
        self.scene_info = info
        self.white_background = white_background

        if not self.loaded_iter and model_path:
            os.makedirs(model_path, exist_ok=True)
            store_point_cloud(os.path.join(model_path, "input.ply"),
                              np.asarray(info.points),
                              np.asarray(info.colors) * 255)
            cam_json = [camera_to_json(i, c) for i, c in
                        enumerate(info.train_cameras + info.test_cameras)]
            with open(os.path.join(model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(info.train_cameras)
            random.shuffle(info.test_cameras)

        self.cameras_extent = float(info.nerf_normalization["radius"])

        self.train_cameras: dict[float, list[CameraMeta]] = {}
        self.test_cameras: dict[float, list[CameraMeta]] = {}
        for scale in resolution_scales:
            print(f"Loading Training Cameras at scale {scale}")
            self.train_cameras[scale] = [
                load_camera_pixels(c, resolution, scale, train_test_exp, False,
                                   info.is_nerf_synthetic)
                for c in info.train_cameras]
            print(f"Loading Test Cameras at scale {scale}")
            self.test_cameras[scale] = [
                load_camera_pixels(c, resolution, scale, train_test_exp, True,
                                   info.is_nerf_synthetic)
                for c in info.test_cameras]

        # exposure indices follow the train-camera order
        self.exposure_mapping = {c.image_name: i for i, c in
                                 enumerate(self.train_cameras[resolution_scales[0]])}
        for scale in resolution_scales:
            for cams in (self.train_cameras[scale], self.test_cameras[scale]):
                for c in cams:
                    c.exposure_idx = self.exposure_mapping.get(c.image_name, 0)

        num_images = max(1, len(self.exposure_mapping))
        if self.loaded_iter:
            ply = os.path.join(model_path, "point_cloud",
                               f"iteration_{self.loaded_iter}", "point_cloud.ply")
            self.params, self.aux = load_gaussians(ply, sh_degree=sh_degree,
                                                   num_images=num_images,
                                                   capacity=capacity)
            exposure_file = os.path.join(model_path, "exposure.json")
            if train_test_exp and os.path.exists(exposure_file):
                with open(exposure_file) as f:
                    exposures = json.load(f)
                import jax.numpy as jnp
                expo = np.stack([np.array(exposures[name], np.float32)
                                 for name in self.exposure_mapping], axis=0)
                self.params = self.params.replace(exposure=jnp.asarray(expo))
        else:
            self.params, self.aux = create_from_pcd(
                np.asarray(info.points), np.asarray(info.colors),
                num_images=num_images, sh_degree=sh_degree, capacity=capacity)

    def get_train_cameras(self, scale: float = 1.0) -> list[CameraMeta]:
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0) -> list[CameraMeta]:
        return self.test_cameras[scale]

    def save(self, iteration: int, params: GaussianParams | None = None,
             aux: GaussianAux | None = None):
        """Write point_cloud.ply (live rows only) + exposure.json
        (reference scene/__init__.py:85-94)."""
        params = self.params if params is None else params
        aux = self.aux if aux is None else aux
        out = os.path.join(self.model_path, "point_cloud",
                           f"iteration_{iteration}")
        alive = np.asarray(aux.alive)
        save_gaussians_ply(
            os.path.join(out, "point_cloud.ply"),
            np.asarray(params.xyz)[alive],
            np.asarray(params.features_dc)[alive],
            np.asarray(params.features_rest)[alive],
            np.asarray(params.opacity)[alive],
            np.asarray(params.scaling)[alive],
            np.asarray(params.rotation)[alive])
        exposures = {name: np.asarray(params.exposure[idx]).tolist()
                     for name, idx in self.exposure_mapping.items()}
        with open(os.path.join(self.model_path, "exposure.json"), "w") as f:
            json.dump(exposures, f, indent=2)


def load_gaussians(ply_path: str, sh_degree: int = 3, num_images: int = 1,
                   capacity: int | None = None):
    """PLY → (GaussianParams, GaussianAux) with capacity padding."""
    import jax.numpy as jnp

    from gslm_tpu.models.gaussians import pad_to_capacity, round_capacity

    d = load_gaussians_ply(ply_path, max_sh_degree=sh_degree)
    n = d["xyz"].shape[0]
    params = GaussianParams(
        xyz=jnp.asarray(d["xyz"]), features_dc=jnp.asarray(d["features_dc"]),
        features_rest=jnp.asarray(d["features_rest"]),
        scaling=jnp.asarray(d["scaling"]), rotation=jnp.asarray(d["rotation"]),
        opacity=jnp.asarray(d["opacity"]),
        exposure=jnp.broadcast_to(jnp.eye(3, 4, dtype=jnp.float32),
                                  (num_images, 3, 4)),
        sh_degree=sh_degree)
    capacity = capacity or round_capacity(n)
    params = pad_to_capacity(params, capacity)
    return params, init_aux(capacity, n)
