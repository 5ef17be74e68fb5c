"""CI gate for the one-command round rehearsal (VERDICT r3 item 9):
the full synthetic-COLMAP -> RGB pretrain -> distill (train.py CLI) ->
render/metrics CLIs -> query masks -> eval_seg CLI chain at smoke size,
with the judge-visible artifact set schema-checked."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_round_rehearsal_fast(tmp_path):
    from examples.round_rehearsal import main

    summary = main(["--root", str(tmp_path), "--fast"])

    # metric sanity (smoke size: finite + non-degenerate, not a bar)
    assert np.isfinite(summary["psnr"]) and summary["psnr"] > 5.0
    assert 0.0 <= summary["miou"] <= 1.0
    assert 0.0 <= summary["mpa"] <= 1.0

    art = summary["artifacts"]
    for key in ("point_cloud_ply", "semantic_mlp", "lut",
                "results_json", "per_view_json", "cfg_args"):
        assert os.path.exists(art[key]), key

    # the PLY is the reference's interchange format: re-loadable with
    # sem_* fields (ref:scene/gaussian_model.py:255-358)
    from goi_tpu.core.ply import load_gaussians_ply
    scene = load_gaussians_ply(art["point_cloud_ply"])
    assert scene.semantics.shape[-1] == 10

    # decoder/LUT pair reloads and decodes
    from goi_tpu.data.scene import Scene
    decoder, lut = Scene.load_semantics(os.path.dirname(
        art["point_cloud_ply"]))
    assert lut.shape == (16, 16)     # (tab_len, ape_dim) fast config
    import jax.numpy as jnp
    logits = decoder(jnp.zeros((4, 10)))
    assert logits.shape == (4, 16)

    with open(art["results_json"]) as f:
        res = json.load(f)
    (_, vals), = res.items()
    assert {"PSNR", "SSIM", "LPIPS"} <= set(vals)

    # mask dirs follow the eval_seg m360 layout (per-prompt dirs with
    # one png per eval view)
    pred = os.path.join(art["pred_masks"], "synthetic")
    gt = os.path.join(art["gt_masks"], "synthetic")
    assert sorted(os.listdir(pred)) == sorted(os.listdir(gt))
    prompt = sorted(os.listdir(pred))[0]
    assert os.listdir(os.path.join(pred, prompt))
