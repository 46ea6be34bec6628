"""COLMAP preprocessing CLI — analogue of the reference `convert.py`.

Wraps an external `colmap` binary (feature extraction → exhaustive
matching → mapper → undistortion, the MipNeRF-360 pipeline the reference
scripts, `convert.py:18-124`).  Degrades with a clear error when colmap
is not installed (this framework's loaders also accept ready-made
sparse/ models and Blender/NeILF scenes directly).
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd)
    if rc != 0:
        sys.exit(f"command failed with exit code {rc}: {' '.join(cmd)}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source_path", required=True,
                    help="dir with an input/ folder of images")
    ap.add_argument("--camera", default="OPENCV")
    ap.add_argument("--colmap_executable", default="colmap")
    ap.add_argument("--no_gpu", action="store_true")
    ap.add_argument("--skip_matching", action="store_true")
    ap.add_argument("--resize", action="store_true",
                    help="also write images_2/4/8 downscales")
    args = ap.parse_args()

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        sys.exit(
            f"colmap executable not found ({colmap}). Install COLMAP or "
            "provide a prepared sparse/ model / Blender / NeILF scene.")

    src = args.source_path
    use_gpu = "0" if args.no_gpu else "1"

    if not args.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance", "0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src,
         "--output_type", "COLMAP"])

    # move sparse files into sparse/0 (reference convert.py:76-84)
    os.makedirs(f"{src}/sparse/0", exist_ok=True)
    for f in os.listdir(f"{src}/sparse"):
        if f == "0":
            continue
        shutil.move(os.path.join(src, "sparse", f),
                    os.path.join(src, "sparse", "0", f))

    if args.resize:
        from PIL import Image
        for scale, name in [(2, "images_2"), (4, "images_4"),
                            (8, "images_8")]:
            os.makedirs(f"{src}/{name}", exist_ok=True)
            for f in os.listdir(f"{src}/images"):
                img = Image.open(f"{src}/images/{f}")
                img = img.resize((img.width // scale, img.height // scale))
                img.save(f"{src}/{name}/{f}")
    print("done.", flush=True)


if __name__ == "__main__":
    main()
