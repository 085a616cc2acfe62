"""Quality metrics over rendered sets: SSIM / PSNR / LPIPS.

Equivalent of the reference's metrics.py:36-103: for every
``<model>/test/ours_<iter>`` directory, pair renders with gt, compute the
three metrics, and write ``results.json`` + ``per_view.json`` in the same
schema. LPIPS requires a weight file (see eval/lpips.py) and is reported as
null when unavailable.

Usage: python -m gslm_tpu.eval.metrics -m <model_path> [<model_path> ...]
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np


def read_images(renders_dir: str, gt_dir: str):
    from PIL import Image
    names = sorted(os.listdir(renders_dir))
    renders, gts = [], []
    for name in names:
        r = np.asarray(Image.open(os.path.join(renders_dir, name)),
                       np.float32)[..., :3] / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, name)),
                       np.float32)[..., :3] / 255.0
        renders.append(r.transpose(2, 0, 1))
        gts.append(g.transpose(2, 0, 1))
    return names, renders, gts


def evaluate_dir(method_dir: str, use_lpips: bool = True):
    """Metrics over one ours_<iter> directory. Returns (summary, per_view)."""
    import jax
    import jax.numpy as jnp

    from gslm_tpu.eval import lpips as lpips_mod
    from gslm_tpu.ops.ssim import ssim
    from gslm_tpu.utils.image import psnr

    names, renders, gts = read_images(os.path.join(method_dir, "renders"),
                                      os.path.join(method_dir, "gt"))
    lpips_ok = use_lpips and lpips_mod.available()
    if use_lpips and not lpips_ok:
        print(f"LPIPS weights not found at {lpips_mod.default_weight_path()}"
              " — reporting LPIPS: null. Export them once on any box with"
              " torchvision (tools/export_lpips_weights.py) and point"
              " GSLM_LPIPS_WEIGHTS at the npz.")

    @jax.jit
    def pair_metrics(r, g):
        return (ssim(r[None], g[None]), psnr(r, g))

    ssims, psnrs, lpipss = [], [], []
    for r, g in zip(renders, gts):
        s, p = pair_metrics(jnp.asarray(r), jnp.asarray(g))
        ssims.append(float(s))
        psnrs.append(float(p))
        if lpips_ok:
            lpipss.append(float(lpips_mod.lpips(jnp.asarray(r)[None],
                                                jnp.asarray(g)[None])[0]))

    summary = {"SSIM": float(np.mean(ssims)), "PSNR": float(np.mean(psnrs)),
               "LPIPS": float(np.mean(lpipss)) if lpips_ok else None}
    per_view = {
        "SSIM": dict(zip(names, ssims)),
        "PSNR": dict(zip(names, psnrs)),
        "LPIPS": dict(zip(names, lpipss)) if lpips_ok else {},
    }
    return summary, per_view


def evaluate(model_paths: list[str], use_lpips: bool = True):
    from gslm_tpu.eval import lpips as lpips_mod
    if use_lpips and not lpips_mod.available():
        print("LPIPS weights not found "
              f"({lpips_mod.default_weight_path()}); reporting LPIPS=null")

    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full, per_view = {}, {}
        test_dir = os.path.join(scene_dir, "test")
        try:
            methods = sorted(os.listdir(test_dir))
        except FileNotFoundError:
            print("  no test renders found; run "
                  "python -m gslm_tpu.eval.render_sets first")
            continue
        for method in methods:
            print("  method:", method)
            summary, views = evaluate_dir(os.path.join(test_dir, method),
                                          use_lpips)
            full[method] = summary
            per_view[method] = views
            for k, v in summary.items():
                print(f"    {k:>6}: {v if v is None else f'{v:.7f}'}")

        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full, f, indent=True)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=True)


def main():
    parser = ArgumentParser(description="Compute metrics over rendered sets")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    parser.add_argument("--no_lpips", action="store_true")
    args = parser.parse_args()
    evaluate(args.model_paths, use_lpips=not args.no_lpips)


if __name__ == "__main__":
    main()
