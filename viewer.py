"""Remote viewer CLI: serve a trained model over the SIBR wire protocol.

Role of the reference's in-training network_gui loop plus the GUI's
standalone viewing (ref:train.py:97-111, gui/main.py render loop): point
a SIBR remote viewer (or anything speaking the protocol) at
<ip>:<port> and it receives interactive renders. Optional semantic
overlay when a decoder/LUT checkpoint and a precomputed text embedding
are supplied.

Usage:
  python viewer.py -m <model_dir> [--iteration -1] [--port 6009]
      [--prompt_store prompts_aligned.npz --prompt "sofa"]
"""

import os
import time
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description="GOI-TPU remote viewer")
    from goi_tpu.configs.params import (ModelParams, add_params,
                                        extract_params,
                                        load_saved_params)

    add_params(parser, ModelParams, "Loading Parameters")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--max_instances", type=int, default=0)
    parser.add_argument("--prompt_store", type=str, default="",
                        help=".npz of ALIGNED 256-d prompt embeddings")
    parser.add_argument("--prompt", type=str, default="")
    args = parser.parse_args(argv)

    saved = load_saved_params(args.model_path, ModelParams)
    mp = extract_params(args, ModelParams)
    if not mp.source_path:
        mp = type(mp)(**{**mp.__dict__, "source_path": saved.source_path})

    import numpy as np
    import jax.numpy as jnp

    from goi_tpu.app.session import QuerySession
    from goi_tpu.data.scene import Scene
    from goi_tpu.raster import RasterConfig
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.render import suggest_budgets
    from goi_tpu.semantic.codebook import SemanticDecoder
    from goi_tpu.viewer.server import NetworkGUI

    scene = Scene(mp, load_iteration=args.iteration, load_sem=False)
    it_dir = os.path.join(mp.model_path, "point_cloud",
                          f"iteration_{scene.loaded_iter}")
    decoder, lut = None, None
    if os.path.exists(os.path.join(it_dir, "semantic_MLP.pt")):
        decoder, lut = Scene.load_semantics(it_dir)
    else:
        decoder = SemanticDecoder(weights=[jnp.zeros((1, mp.sem_dim))],
                                  biases=[jnp.zeros(1)])

    if args.max_instances:
        cfg = RasterConfig(max_instances=args.max_instances,
                           backend="pallas")
    else:
        budget, binned = suggest_budgets(
            scene.gaussians, scene.train_cameras[:4], align=K)
        cfg = RasterConfig(max_instances=budget, max_binned=binned,
                           backend="pallas")
    sess = QuerySession(scene.gaussians, decoder, lut, cfg,
                        white_background=mp.white_background)
    if args.prompt and args.prompt_store:
        store = dict(np.load(args.prompt_store))
        sess.set_text(jnp.asarray(store[args.prompt]))
        print(f"query prompt: {args.prompt!r}")

    gui = NetworkGUI(args.ip, args.port)
    print(f"serving {mp.model_path} (iter {scene.loaded_iter}) on "
          f"{args.ip}:{args.port} — connect a SIBR remote viewer")
    try:
        while True:
            flags = gui.serve_step(
                lambda cam, sm: sess.render_view(
                    cam, scaling_modifier=sm).transpose(2, 0, 1),
                verify=mp.source_path)
            if not flags:
                time.sleep(0.005)
    except KeyboardInterrupt:
        print("\nbye")


if __name__ == "__main__":
    main()
