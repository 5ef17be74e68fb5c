"""Scaling harness: fwd+bwd rays/s vs device count.

Measures the sharded renderer (goi_tpu/dist/render.py) at 1..N devices
on whatever devices are available (the BASELINE scaling protocol:
rays/s at 1 chip / 1 host / >=2 hosts, >=80% efficiency target at 2
hosts). With one real TPU chip this reports single-chip numbers; run
under JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to exercise the multi-device code path (correctness, not perf).

Prints one JSON line per device count.
"""

import json
import time


def main():
    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.dist.mesh import make_mesh, shard_scene
    from goi_tpu.dist.render import render_sharded
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.pallas_blend import K as _K
    from goi_tpu.raster.render import suggest_budgets

    n = 100_000
    width, height = 512, 512
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scene = GaussianScene.create(
        xyz, colors, sh_degree=3, sem_dim=10,
        scales=rng.uniform(0.005, 0.02, n).astype(np.float32))
    scene = scene.replace(
        active_sh_degree=3,
        opacity=scene.opacity + jnp.asarray(
            rng.normal(0, 1, (n, 1)).astype(np.float32)))
    cam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                         fovx=0.9, fovy=0.9, width=width, height=height)
    budget, binned = suggest_budgets(scene, cam, align=_K)
    rays = width * height

    n_devices = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8) if d <= n_devices
              and (height // 16) % d == 0]
    base = None
    for d in counts:
        cfg = RasterConfig(max_instances=budget, max_binned=binned,
                           backend="pallas")
        if d == 1:
            def loss(params):
                out = render(scene.with_params(params), cam,
                             jnp.zeros(3), cfg)
                return jnp.mean(out["render"]) + jnp.mean(
                    out["semantics"])
            step = jax.jit(jax.grad(loss))
            params = scene.params()
        else:
            mesh = make_mesh(1, d)
            sh = shard_scene(scene, mesh)

            def loss(params):
                out = render_sharded(sh.with_params(params), cam,
                                     jnp.zeros(3), cfg, mesh)
                return jnp.mean(out["render"]) + jnp.mean(
                    out["semantics"])
            step = jax.jit(jax.grad(loss))
            params = sh.params()
        g = step(params)
        jax.block_until_ready(g)
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            g = step(params)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / iters
        mrays = rays / dt / 1e6
        if base is None:
            base = mrays
        print(json.dumps({
            "metric": "Mrays/s fwd+bwd", "devices": d,
            "value": round(mrays, 3),
            "scaling_efficiency": round(mrays / (base * d), 3),
        }))

    # ---- sharded DISTILL step sweep (2D data x model mesh) ----------
    # The full semantic-distillation training step (render + codebook
    # decode + 4-term loss + three optimizers) under camera-batch DP x
    # Gaussian-parameter sharding — the workload dist/shard.py's DP
    # axis exists for (VERDICT r2 weak 5).
    from goi_tpu.dist.shard import (make_sharded_distill_step,
                                    shard_batch, stack_cameras)
    from goi_tpu.semantic.codebook import SemanticDecoder
    from goi_tpu.train.optim import OptimConfig

    sem_dim, ape_dim, tab_len = 10, 64, 32
    dw, dh = 256, 256
    dcam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                          fovx=0.9, fovy=0.9, width=dw, height=dh)
    dscene = scene.replace(semantics=scene.semantics + jnp.asarray(
        rng.normal(0, 0.3, scene.semantics.shape).astype(np.float32)))
    dcfg = RasterConfig(max_instances=budget, max_binned=binned,
                        backend="pallas")
    dbase = None
    for d in counts:
        n_data = 2 if d % 2 == 0 and d > 1 else 1
        n_model = d // n_data
        mesh = make_mesh(n_data, n_model)
        assert n % n_model == 0, (n, n_model)
        sh = shard_scene(dscene, mesh) if d > 1 else dscene
        cams = stack_cameras([dcam] * n_data)
        gts = jnp.asarray(rng.normal(
            0, 1, (n_data, ape_dim, dh, dw)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        decoder = SemanticDecoder.create(key, dim_in=sem_dim,
                                         dim_out=tab_len)
        lut = jax.random.normal(key, (tab_len, ape_dim)) * 0.1
        init_fn, step_fn = make_sharded_distill_step(OptimConfig(), dcfg)
        with jax.set_mesh(mesh):
            cams_s, gts_s = shard_batch(mesh, cams, gts)
            state = init_fn(decoder=decoder, lut=lut, scene=sh)
            step_jit = jax.jit(step_fn)
            state, aux = step_jit(state, cams_s, gts_s, jnp.zeros(3))
            jax.block_until_ready(aux["total"])
            iters = 5
            t0 = time.time()
            for _ in range(iters):
                state, aux = step_jit(state, cams_s, gts_s,
                                      jnp.zeros(3))
            jax.block_until_ready(aux["total"])
        dt = (time.time() - t0) / iters
        sps = n_data / dt  # camera-steps per second
        if dbase is None:
            dbase = sps
        print(json.dumps({
            "metric": "distill cam-steps/s", "devices": d,
            "mesh": [n_data, n_model], "value": round(sps, 3),
            "scaling_efficiency": round(sps / (dbase * d), 3),
            "loss": round(float(aux["total"]), 4),
        }))


if __name__ == "__main__":
    main()
