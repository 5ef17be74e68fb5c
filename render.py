"""Offline render CLI: renders train/test sets to renders/ + gt/ dirs.

Role of ref:render.py:13-55 — made first-class (the reference's version
is stale w.r.t. its own GaussianModel constructor, SURVEY.md §3.5).

Usage: python render.py -m <model_dir> [-s <scene>] [--iteration N]
       [--skip_train] [--skip_test]
"""

import os
from argparse import ArgumentParser


def render_set(model_path, name, iteration, cameras, infos, gaussians,
               raster_cfg, bg, resolution):
    import jax.numpy as jnp

    from goi_tpu.data.dataset import load_image
    from goi_tpu.raster import render
    from goi_tpu.utils.image import save_image

    base = os.path.join(model_path, name, f"ours_{iteration}")
    rdir = os.path.join(base, "renders")
    gdir = os.path.join(base, "gt")
    os.makedirs(rdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    for idx, (cam, info) in enumerate(zip(cameras, infos)):
        out = render(gaussians, cam, bg, raster_cfg)
        save_image(out["render"], os.path.join(rdir, f"{idx:05d}.png"))
        save_image(load_image(info, resolution),
                   os.path.join(gdir, f"{idx:05d}.png"))
    return base


def main(argv=None):
    parser = ArgumentParser(description="GOI-TPU render")
    from goi_tpu.configs.params import (ModelParams, PipelineParams,
                                        add_params, extract_params,
                                        load_saved_params)

    add_params(parser, ModelParams, "Loading Parameters")
    add_params(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    # get_combined_args semantics (ref:arguments/__init__.py:93-113):
    # saved cfg_args override the dataclass defaults, explicit CLI
    # values override the saved ones — so eval/white_background/sem_dim
    # from training persist into rendering without re-specifying them
    import dataclasses as _dc
    saved = load_saved_params(args.model_path, ModelParams)
    cli = extract_params(args, ModelParams)
    base = ModelParams()
    mp = ModelParams(**{
        f.name: (getattr(cli, f.name)
                 if getattr(cli, f.name) != getattr(base, f.name)
                 else getattr(saved, f.name))
        for f in _dc.fields(ModelParams)})

    import jax.numpy as jnp
    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from goi_tpu.data.scene import Scene
    from goi_tpu.raster import RasterConfig

    scene = Scene(mp, load_iteration=args.iteration, load_sem=False)
    raster_cfg = RasterConfig(max_instances=args.max_instances,
                              backend="pallas")
    bg = jnp.ones(3) if mp.white_background else jnp.zeros(3)

    if not args.skip_train:
        render_set(mp.model_path, "train", scene.loaded_iter,
                   scene.train_cameras, scene.info.train_cameras,
                   scene.gaussians, raster_cfg, bg, mp.resolution)
    if not args.skip_test and scene.test_cameras:
        render_set(mp.model_path, "test", scene.loaded_iter,
                   scene.test_cameras, scene.info.test_cameras,
                   scene.gaussians, raster_cfg, bg, mp.resolution)


if __name__ == "__main__":
    main()
