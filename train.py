"""Semantic-field distillation training CLI.

TPU equivalent of ref:train.py:271-301: loads a pre-trained 3DGS scene
(iteration 1 by convention), k-means-initializes the codebook from the
offline APE feature maps, runs the 4-term distillation for
--iterations steps, and saves the PLY + decoder + LUT triplet at the
save iterations.

Usage:
  python train.py -s <scene_dir> -m <model_dir> [--iterations 1500]
"""

import os
import sys
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description="GOI-TPU distillation training")
    from goi_tpu.configs.params import (ModelParams, PipelineParams,
                                        add_params, extract_params,
                                        save_params)
    from goi_tpu.train.optim import OptimConfig

    add_params(parser, ModelParams, "Loading Parameters")
    add_params(parser, OptimConfig, "Optimization Parameters")
    add_params(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=12652)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[1000, 1500])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[1000, 1500])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_instances", type=int, default=0,
                        help="0 = auto-size from the scene")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    mp = extract_params(args, ModelParams)
    op = extract_params(args, OptimConfig)
    if not mp.model_path:
        mp = type(mp)(**{**mp.__dict__, "model_path":
                         os.path.join("./output", "run")})
    save_params(mp.model_path, mp, op)

    import jax.numpy as jnp
    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from goi_tpu.data.dataset import load_feature_map
    from goi_tpu.data.scene import Scene
    from goi_tpu.raster import RasterConfig
    from goi_tpu.train.distill import train_distillation

    scene = Scene(mp, load_iteration=1)
    feats = []
    cams = []
    for info, cam in zip(scene.info.train_cameras, scene.train_cameras):
        fm = load_feature_map(info.semantic_path)
        if fm is None:
            raise FileNotFoundError(
                f"missing APE feature map {info.semantic_path}; run the "
                "offline feature extraction first (reference README)")
        feats.append(fm)
        cams.append(cam)

    if args.max_instances > 0:
        budget = args.max_instances
    else:
        from goi_tpu.raster.pallas_blend import K
        from goi_tpu.raster.render import suggest_budgets
        budget, binned = suggest_budgets(scene.gaussians, cams[:8],
                                         align=K)
        print(f"instance budgets: {budget} expansion / {binned} aligned")
        raster_cfg = RasterConfig(max_instances=budget,
                                  max_binned=binned, backend="pallas")
    if args.max_instances > 0:
        raster_cfg = RasterConfig(max_instances=budget,
                                  backend="pallas")

    def validation_report(it, state):
        """PSNR over the eval split at test iterations
        (ref:train.py:228-268 training_report)."""
        from goi_tpu.eval.metrics import psnr
        from goi_tpu.raster import render as _render

        bg = jnp.ones(3) if mp.white_background else jnp.zeros(3)
        for split, cs, infos in (
                ("test", scene.test_cameras, scene.info.test_cameras),
                ("train", scene.train_cameras[:5],
                 scene.info.train_cameras[:5])):
            if not cs:
                continue
            from goi_tpu.data.dataset import load_image
            vals = []
            for cam, info in zip(cs, infos):
                out = _render(state.scene, cam, bg, raster_cfg)
                gt = jnp.asarray(load_image(info, mp.resolution))
                vals.append(float(psnr(
                    jnp.clip(out["render"], 0, 1), gt)))
            print(f"\n[ITER {it}] Evaluating {split}: PSNR "
                  f"{float(np.mean(vals)):.4f}")

    import numpy as np

    def checkpoint_cb(it, state, aux):
        if it in set(args.test_iterations):
            validation_report(it, state)
        if it in set(args.save_iterations) | {op.iterations}:
            scene.gaussians = state.scene
            out = scene.save(it, decoder=state.decoder, lut=state.lut)
            print(f"[ITER {it}] Saved to {out}")

    state = train_distillation(
        scene.gaussians, cams, feats,
        tab_len=mp.tab_len, ape_dim=mp.ape_dim,
        iterations=op.iterations, cfg=op, raster_cfg=raster_cfg,
        white_background=mp.white_background, seed=args.seed,
        callback=checkpoint_cb, tb_log_dir=mp.model_path,
        spatial_lr_scale=scene.cameras_extent)
    print("\nTraining complete.")
    return state


if __name__ == "__main__":
    main()
