"""Multi-scene eval sweep, shardable across hosts (BASELINE config 5).

Each process takes the model dirs strided by its process index, runs
render + metrics per scene (the render.py / metrics.py CLI flows), then
process 0 aggregates every scene's results.json into one
sweep_results.json with per-scene and overall means.

Single process:   python eval_sweep.py -m out/garden out/room ...
Multi-host:       GOI_COORD=h0:8476 GOI_NUM_PROCS=2 GOI_PROC_ID=<i> \\
                      python eval_sweep.py -m ...   (one per host)

The multi-host path reuses goi_tpu.dist.multihost: scenes are divided
process_index-strided, and a sync_global_devices barrier orders the
aggregation after every process finished its shard.
"""

import json
import os
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser("GOI-TPU multi-scene eval sweep")
    parser.add_argument("--models", "-m", nargs="+", required=True,
                        help="model dirs (one per scene)")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_render", action="store_true",
                        help="only score existing renders")
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--out", default="sweep_results.json")
    args = parser.parse_args(argv)

    from goi_tpu.dist.multihost import init_multihost
    multi = init_multihost()
    import jax
    pid, nproc = jax.process_index(), jax.process_count()

    import metrics as metrics_cli
    import render as render_cli

    mine = args.models[pid::nproc]
    print(f"[proc {pid}/{nproc}] scenes: {mine}", flush=True)
    for model in mine:
        if not args.skip_render:
            render_cli.main(["-m", model, "--iteration",
                             str(args.iteration), "--skip_train",
                             "--max_instances",
                             str(args.max_instances)])
        metrics_cli.evaluate([model])

    if multi:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("goi_tpu_eval_sweep")

    if pid != 0:
        return None

    sweep = {"scenes": {}, "mean": {}}
    acc: dict = {}
    for model in args.models:
        path = os.path.join(model, "results.json")
        if not os.path.exists(path):
            print(f"missing {path}")
            continue
        with open(path) as f:
            res = json.load(f)
        # newest method entry per scene
        method = sorted(res)[-1]
        sweep["scenes"][model] = {"method": method, **res[method]}
        for k, v in res[method].items():
            if isinstance(v, (int, float)) and v is not None:
                acc.setdefault(k, []).append(float(v))
    import numpy as np
    sweep["mean"] = {k: float(np.mean(v)) for k, v in acc.items()}
    with open(args.out, "w") as f:
        json.dump(sweep, f, indent=1)
    print(json.dumps(sweep["mean"]))
    return sweep


if __name__ == "__main__":
    main()
