"""Novel-view quality metrics over rendered directories.

Role of ref:metrics.py:25-92: reads <model>/<split>/ours_<it>/renders
and gt dirs, computes per-view PSNR/SSIM (+LPIPS when weights are
available), writes results.json / per_view.json.

Usage: python metrics.py -m <model_dir> [...]
"""

import json
import os
from argparse import ArgumentParser


def evaluate(model_paths):
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from goi_tpu.eval.metrics import psnr, ssim
    from goi_tpu.eval.lpips import lpips_or_none

    for model_path in model_paths:
        print("Scene:", model_path)
        full = {}
        per_view = {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print("  no test renders found")
            continue
        for method in sorted(os.listdir(test_dir)):
            rdir = os.path.join(test_dir, method, "renders")
            gdir = os.path.join(test_dir, method, "gt")
            if not os.path.isdir(rdir):
                continue
            names = sorted(os.listdir(rdir))
            psnrs, ssims, lpipss = [], [], []
            # protocol default vgg (ref:metrics.py:63 net_type='vgg');
            # degrade to alex when only alex weights are shipped, and
            # record which backbone produced the number
            from goi_tpu.eval.lpips import _load_weights
            lpips_net = ("vgg" if _load_weights("vgg") is not None
                         else "alex")
            for fname in names:
                def load(p):
                    with Image.open(p) as im:
                        a = np.asarray(im.convert("RGB"),
                                       np.float32) / 255.0
                    return jnp.asarray(a.transpose(2, 0, 1))
                r = load(os.path.join(rdir, fname))
                g = load(os.path.join(gdir, fname))
                psnrs.append(float(psnr(r, g)))
                ssims.append(float(ssim(r, g)))
                lp = lpips_or_none(r, g, net=lpips_net)
                if lp is not None:
                    lpipss.append(float(lp))
            full[method] = {
                "PSNR": float(np.mean(psnrs)),
                "SSIM": float(np.mean(ssims)),
                "LPIPS": float(np.mean(lpipss)) if lpipss else None,
                "LPIPS_net": lpips_net if lpipss else None,
            }
            per_view[method] = {
                "PSNR": dict(zip(names, psnrs)),
                "SSIM": dict(zip(names, ssims)),
            }
            print(f"  {method}: PSNR {full[method]['PSNR']:.4f} "
                  f"SSIM {full[method]['SSIM']:.4f} "
                  f"LPIPS {full[method]['LPIPS']}")
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    parser = ArgumentParser(description="GOI-TPU metrics")
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = parser.parse_args()
    evaluate(args.model_paths)
