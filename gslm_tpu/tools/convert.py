"""COLMAP dataset converter.

Equivalent of the reference's convert.py:1-124: runs
feature_extractor → exhaustive_matcher → mapper → image_undistorter on a
raw ``<src>/input`` image folder, then (optionally) writes 2x/4x/8x
downscaled image pyramids. Resizing uses PIL instead of ImageMagick (one
less system dependency); the COLMAP binary is required and its absence is
a clear error.

Usage: python convert.py -s <location> [--no_gpu] [--skip_matching]
       [--resize] [--camera OPENCV] [--colmap_executable PATH]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: list[str]):
    print("+", " ".join(cmd))
    proc = subprocess.run(cmd)
    if proc.returncode != 0:
        print(f"command failed with code {proc.returncode}. Exiting.")
        sys.exit(proc.returncode)


def main():
    parser = ArgumentParser(description="COLMAP converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--colmap_executable", default="")
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args()

    colmap = args.colmap_executable or shutil.which("colmap")
    if not colmap:
        print("COLMAP executable not found; install colmap or pass "
              "--colmap_executable")
        sys.exit(1)
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--image_path", os.path.join(src, "input"),
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--image_path", os.path.join(src, "input"),
             "--output_path", os.path.join(src, "distorted", "sparse"),
             "--Mapper.ba_global_function_tolerance=0.000001"])

    # undistort into the layout the loaders expect (<src>/images + sparse/0)
    run([colmap, "image_undistorter",
         "--image_path", os.path.join(src, "input"),
         "--input_path", os.path.join(src, "distorted", "sparse", "0"),
         "--output_path", src, "--output_type", "COLMAP"])
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f != "0":
            shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if args.resize:
        from PIL import Image
        for div in (2, 4, 8):
            out_dir = os.path.join(src, f"images_{div}")
            os.makedirs(out_dir, exist_ok=True)
            for name in os.listdir(os.path.join(src, "images")):
                img = Image.open(os.path.join(src, "images", name))
                img.resize((img.width // div, img.height // div),
                           Image.LANCZOS).save(os.path.join(out_dir, name))
    print("Done.")


if __name__ == "__main__":
    main()
