"""Micro-benchmark of the backward pass internals.

Splits the ~13 ms backward into:
  - blend-core VJP (bwd Pallas kernel + instance->Gaussian reduction)
  - the reduction alone (on synthetic instance grads)
  - preprocess VJP chain (xyz/scale/rot/SH from per-Gaussian cotangents)

Run: python examples/profile_bwd.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.raster.binning import bin_splats
    from goi_tpu.raster.pallas_blend import (
        DOUT, K, _blend_core, _reduce_instance_grads,
        _reduce_instance_grads_sorted)
    from goi_tpu.raster.preprocess import TILE, preprocess
    from goi_tpu.raster.render import suggest_budgets

    n, width, height = args.n, args.size, args.size
    rng = np.random.default_rng(0)
    scene = GaussianScene.create(
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32),
        sh_degree=3, sem_dim=10,
        scales=rng.uniform(0.005, 0.02, n).astype(np.float32))
    scene = scene.replace(
        active_sh_degree=3,
        opacity=scene.opacity
        + jnp.asarray(rng.normal(0, 1, (n, 1)).astype(np.float32)),
        semantics=jnp.asarray(
            rng.normal(0, 0.3, (n, 10)).astype(np.float32)))
    cam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                         fovx=0.9, fovy=0.9, width=width, height=height)
    budget, binned = suggest_budgets(scene, cam, align=K, margin=1.0)
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    s_dim = 10
    n_out = 3 + s_dim + 1
    iters = args.iters

    def timed(fn, *xs):
        # 1e-12 perturbation (NOT *0, which constant-folds and lets
        # LICM hoist the whole body out of the loop — the number then
        # measures ONE call / iters)
        def many(xs):
            def it(i, acc):
                ys = jax.tree.map(
                    lambda x: (x * (1.0 + i.astype(x.dtype) * 1e-12)
                               if jnp.issubdtype(x.dtype, jnp.floating)
                               else x), xs)
                return acc + fn(*ys)
            return jax.lax.fori_loop(0, iters, it, 0.0)

        step = jax.jit(many)
        jax.block_until_ready(step(xs))
        t0 = time.time()
        jax.block_until_ready(step(xs))
        return (time.time() - t0) / iters * 1000.0

    sp = jax.jit(lambda sc: preprocess(sc, cam))(scene)
    binning = jax.jit(lambda s: bin_splats(
        jax.tree.map(jax.lax.stop_gradient, s), grid_x=grid_x,
        grid_y=grid_y, max_instances=budget, align=K,
        export_perm=True, binned_slots=binned))(sp)

    cot = jnp.ones((grid_x * grid_y, TILE * TILE, n_out + 2),
                   jnp.float32) * 1e-3

    # 1) blend-core VJP = bwd kernel + reduction (scatter mode)
    def blend_bwd(mean2d, conic, opa, color, sem, depth, cot):
        _, vjp = jax.vjp(
            lambda *xs: _blend_core(grid_x, grid_y, n_out, *xs,
                                    binning.point_list,
                                    binning.tile_start,
                                    binning.tile_end, ()),
            mean2d, conic, opa, color, sem, depth)
        gs = vjp(cot)
        return sum(jnp.sum(v) for v in gs if v is not None)

    ms_blend_vjp = timed(blend_bwd, sp.mean2d, sp.conic, sp.opacity,
                         sp.color, sp.semantics, sp.depth, cot)

    # 2) reduction alone on synthetic instance grads
    g_fake = jnp.asarray(
        rng.normal(0, 1, (binned + K, DOUT)).astype(np.float32))

    def red_scatter(g):
        outs = _reduce_instance_grads(g, binning.point_list, n, s_dim)
        return sum(jnp.sum(v) for v in outs)

    def red_sorted(g):
        outs = _reduce_instance_grads_sorted(
            g, (binning.stream_pos, binning.stream_gid), n, s_dim)
        return sum(jnp.sum(v) for v in outs)

    ms_red_scatter = timed(red_scatter, g_fake)
    ms_red_sorted = timed(red_sorted, g_fake)

    # 3) preprocess VJP chain from per-Gaussian cotangents
    def pre_bwd(sc):
        def f(params):
            s2 = preprocess(sc.with_params(params), cam)
            return (jnp.sum(s2.mean2d) + jnp.sum(s2.conic)
                    + jnp.sum(s2.opacity) + jnp.sum(s2.color)
                    + jnp.sum(s2.semantics) + jnp.sum(s2.depth))
        g = jax.grad(f)(sc.params())
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    ms_pre_bwd = timed(pre_bwd, scene)

    table = {
        "budget": int(budget), "binned": int(binned),
        "blend_vjp_ms": round(ms_blend_vjp, 3),
        "reduce_scatter_ms": round(ms_red_scatter, 3),
        "reduce_sorted_ms": round(ms_red_sorted, 3),
        "bwd_kernel_est_ms": round(ms_blend_vjp - ms_red_scatter, 3),
        "preprocess_vjp_ms": round(ms_pre_bwd, 3),
    }
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
