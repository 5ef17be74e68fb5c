"""Rows-exchange packing scaling probe (VERDICT r4 weak #5 'Done' bar).

Measures, at D = 8/16/64 virtual CPU devices:
  - trace+compile wall time of the sharded rows-exchange render
    (the round-4 per-destination Python loop made this grow with D;
    the batched membership/cumsum/one-scatter formulation is
    D-independent HLO), and
  - per-device received rows (the ~1/D memory scaling).

Run:  JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=64 \
      PYTHONPATH=. python examples/micro_exchange_pack.py

Writes MICRO_EXCHANGE.json at the repo root.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.dist.mesh import make_mesh, shard_scene
    from goi_tpu.dist.render import render_sharded
    from goi_tpu.raster import RasterConfig

    n = 1 << 14
    rng = np.random.default_rng(0)
    scene = GaussianScene.create(
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32),
        sh_degree=1, sem_dim=4,
        scales=rng.uniform(0.005, 0.02, n).astype(np.float32))
    cfg = RasterConfig(max_instances=1 << 16, tile_cap=256, chunk=64)
    bg = jnp.zeros(3)
    res = {"n_gauss": n, "devices": {}}
    n_dev = len(jax.devices())
    for d in (8, 16, 64):
        if d > n_dev or n % d:
            continue
        # 64-wide frame, d tile rows per device
        cam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                             fovx=0.9, fovy=0.9, width=64,
                             height=16 * d)
        mesh = make_mesh(1, d)
        sh = shard_scene(scene, mesh)
        f = jax.jit(lambda s, m=mesh, c=cam: render_sharded(
            s, c, bg, cfg, m, exchange="rows"))
        t0 = time.time()
        lowered = f.lower(sh)
        t_trace = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        out = compiled(sh)
        jax.block_until_ready(out["render"])
        res["devices"][d] = {
            "trace_s": round(t_trace, 3),
            "compile_s": round(t_compile, 3),
            "hlo_bytes": len(lowered.as_text()),
            "received_rows_per_device": int(
                out["exchange_rows_per_device"]),
            "exchange_demand": int(out["exchange_demand"]),
        }
        print(d, res["devices"][d], flush=True)
    with open("MICRO_EXCHANGE.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
