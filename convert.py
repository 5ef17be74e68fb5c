"""COLMAP SfM pipeline wrapper (undistortion + sparse reconstruction).

Role of ref:convert.py:1-113: runs colmap feature_extractor / matcher /
mapper / image_undistorter over an input/ directory to produce the
sparse/0 layout the readers expect. Requires the `colmap` binary on
PATH (same requirement as the reference).
"""

import os
import shutil
import subprocess
from argparse import ArgumentParser


def run(cmd):
    print("+", " ".join(cmd))
    r = subprocess.run(cmd)
    if r.returncode != 0:
        raise SystemExit(f"command failed ({r.returncode}): {cmd[0]}")


def main(argv=None):
    parser = ArgumentParser("COLMAP converter")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--colmap_executable", default="colmap")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args(argv)

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        raise SystemExit(
            f"colmap binary '{colmap}' not found on PATH — install "
            "COLMAP or run SfM elsewhere and copy sparse/0 in "
            "(ref:convert.py requires the same)")
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted/sparse"), exist_ok=True)
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
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src, "--output_type", "COLMAP"])

    # move sparse/* -> sparse/0 (ref:convert.py:70-77)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f == "0":
            continue
        shutil.move(os.path.join(sparse, f),
                    os.path.join(sparse, "0", f))

    if args.resize:
        # images_2/4/8 at 50/25/12.5% (ref:convert.py:79-111 shells out
        # to ImageMagick mogrify; PIL here — no external binary)
        from PIL import Image
        imgdir = os.path.join(src, "images")
        for div in (2, 4, 8):
            os.makedirs(os.path.join(src, f"images_{div}"),
                        exist_ok=True)
        for f in os.listdir(imgdir):
            with Image.open(os.path.join(imgdir, f)) as im:
                for div in (2, 4, 8):
                    w, h = im.width // div, im.height // div
                    im.resize((max(w, 1), max(h, 1)),
                              Image.LANCZOS).save(
                        os.path.join(src, f"images_{div}", f))
    print("Done.")


if __name__ == "__main__":
    main()
