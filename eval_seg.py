"""Open-vocabulary segmentation evaluation CLI.

Direct equivalent of ref:eval_seg.py:31-142: per-prompt mask dirs for
MipNeRF360-OV (m360) and the Replica top-7-prompt protocol, scoring
mIoU / mPA / mP per prompt -> per scene -> overall.

Usage:
  python eval_seg.py -e <eval_root> -s <saving_root> \
      --scene_list room counter -d m360|replica
"""

import json
import os
from argparse import ArgumentParser

import numpy as np


def _load_gray(path):
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("L"))


def _resize_to(arr, h, w):
    from PIL import Image
    return np.asarray(
        Image.fromarray(arr).resize((w, h), Image.BILINEAR))


def _score(gt: np.ndarray, pred: np.ndarray):
    import jax.numpy as jnp

    from goi_tpu.eval.metrics import iou_metrics
    m = iou_metrics(jnp.asarray(pred), jnp.asarray(gt))
    return float(m["iou"]), float(m["mpa"]), float(m["mp"])


def m360(scene_name, eval_root, saving_root):
    """(ref:eval_seg.py:31-62)."""
    gt_root = os.path.join(eval_root, scene_name)
    ious, mpas, mps = [], [], []
    for prompt in sorted(os.listdir(gt_root)):
        mdir = os.path.join(gt_root, prompt, "masks")
        p_iou, p_mpa, p_mp = [], [], []
        for gt_mask in sorted(os.listdir(mdir)):
            img_name = gt_mask.split(".")[0]
            pred_p = os.path.join(saving_root, scene_name, prompt,
                                  img_name + ".png")
            if not os.path.exists(pred_p):
                print("missing:", pred_p)
                continue
            gt = _load_gray(os.path.join(mdir, gt_mask))
            pred = _resize_to(_load_gray(pred_p), *gt.shape)
            i, a, p = _score(gt > 0, pred > 0)
            p_iou.append(i)
            p_mpa.append(a)
            p_mp.append(p)
        ious.append(np.mean(p_iou))
        mpas.append(np.mean(p_mpa))
        mps.append(np.mean(p_mp))
    print(f"{scene_name} metrics, (iou, mpa, mp): "
          f"{(np.mean(ious), np.mean(mpas), np.mean(mps))}")
    return np.mean(ious), np.mean(mpas), np.mean(mps)


def replica_top7(scene_name, data_root, saving_root):
    """(ref:eval_seg.py:74-113)."""
    gt_root = os.path.join(data_root, scene_name, "test", "sem")
    with open(os.path.join(data_root, scene_name, "test",
                           "top_list.json")) as f:
        top = json.load(f)
    s_iou, s_mpa, s_mp = [], [], []
    for gt_name in sorted(os.listdir(gt_root)):
        img_name = gt_name.split(".")[0]
        gt_all = _load_gray(os.path.join(gt_root, gt_name))
        i_iou, i_mpa, i_mp = [], [], []
        for entry in top[img_name + ".png"]:
            prompt, cid = entry["class_name"], entry["id"]
            pred_p = os.path.join(
                saving_root, scene_name, prompt,
                "rgb_" + img_name.split("_")[1] + ".png")
            if not os.path.exists(pred_p):
                print("missing:", pred_p)
                continue
            pred = _resize_to(_load_gray(pred_p), *gt_all.shape) > 0
            i, a, p = _score(gt_all == cid, pred)
            i_iou.append(i)
            i_mpa.append(a)
            i_mp.append(p)
        s_iou.append(np.mean(i_iou))
        s_mpa.append(np.mean(i_mpa))
        s_mp.append(np.mean(i_mp))
    print(f"{scene_name} miou, mpa, mp: "
          f"{(np.mean(s_iou), np.mean(s_mpa), np.mean(s_mp))}")
    return np.mean(s_iou), np.mean(s_mpa), np.mean(s_mp)


def main(argv=None):
    parser = ArgumentParser("Evaluate GOI-TPU segmentation masks")
    parser.add_argument("--eval_root", "-e", type=str)
    parser.add_argument("--saving_root", "-s", type=str)
    parser.add_argument("--scene_list", nargs="+", default=["room"])
    parser.add_argument("--dataset", "-d", type=str, default="m360")
    args = parser.parse_args(argv)
    fn = {"m360": m360, "replica": replica_top7}[args.dataset]
    res = [fn(s, args.eval_root, args.saving_root)
           for s in args.scene_list]
    res = np.asarray(res)
    print(f"Overall metrics, (iou, mpa, mp): "
          f"{tuple(res.mean(axis=0))}")
    return res


if __name__ == "__main__":
    main()
