"""Per-stage timing table for the rasterization train step.

Times cumulative pipeline prefixes (each in ONE jit with a fori_loop so
host dispatch overhead cancels) and prints the per-stage deltas:

  preprocess | +binning | +blend fwd | +loss | full fwd+bwd

Run on the real chip:  python examples/profile_stages.py [--n 100000]
Writes BENCH_STAGES.json next to BENCH_DETAIL.json.
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
    ap.add_argument("--reduce", default="auto",
                    choices=["scatter", "sorted", "cumsum", "auto"])
    ap.add_argument("--layout", default="chunked",
                    choices=["chunked", "aligned"])
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.binning import bin_splats, bin_splats_chunked
    from goi_tpu.raster.pallas_blend import K, blend_tiles_pallas
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
    budget, binned = suggest_budgets(scene, cam, align=K, margin=1.0,
                                     layout=args.layout)
    cfg = RasterConfig(max_instances=budget, max_binned=binned,
                       backend="pallas", layout=args.layout,
                       reduce=(args.reduce if args.layout == "aligned"
                               else "auto"))
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    tgt_c = jnp.zeros((3, height, width))
    tgt_s = jnp.zeros((10, height, width))
    params = scene.params()
    iters = args.iters

    def timed(fn):
        """Wrap a params->scalar body in a fori_loop jit; return ms/iter."""
        def many(params):
            def it(i, acc):
                p = jax.tree.map(
                    lambda x: x * (1.0 + i.astype(jnp.float32) * 1e-12),
                    params)
                return acc + fn(p)
            return jax.lax.fori_loop(0, iters, it, 0.0)

        step = jax.jit(many)
        jax.block_until_ready(step(params))
        t0 = time.time()
        jax.block_until_ready(step(params))
        return (time.time() - t0) / iters * 1000.0

    def pre_only(p):
        sp = preprocess(scene.with_params(p), cam)
        return sum(jnp.sum(v) for v in
                   (sp.mean2d, sp.conic, sp.color, sp.depth))

    def _bin(sp):
        if args.layout == "chunked":
            return bin_splats_chunked(
                jax.tree.map(jax.lax.stop_gradient, sp),
                grid_x=grid_x, grid_y=grid_y, max_instances=budget,
                chunk_k=K)
        return bin_splats(jax.tree.map(jax.lax.stop_gradient, sp),
                          grid_x=grid_x, grid_y=grid_y,
                          max_instances=budget, align=K,
                          binned_slots=binned)

    def pre_bin(p):
        sp = preprocess(scene.with_params(p), cam)
        b = _bin(sp)
        return (jnp.sum(b.point_list) + jnp.sum(b.tile_start)).astype(
            jnp.float32) + jnp.sum(sp.mean2d)

    def fwd_full(p):
        sp = preprocess(scene.with_params(p), cam)
        b = _bin(sp)
        c, s, d, a = blend_tiles_pallas(sp, b, jnp.zeros(3),
                                        grid_x=grid_x, grid_y=grid_y)
        return jnp.sum(c) + jnp.sum(s) + jnp.sum(d) + jnp.sum(a)

    def loss_fn(p):
        out = render(scene.with_params(p), cam, jnp.zeros(3), cfg)
        return (jnp.mean(jnp.abs(out["render"] - tgt_c))
                + jnp.mean(jnp.abs(out["semantics"] - tgt_s)))

    def full_bwd(p):
        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    rows = {}
    rows["preprocess_ms"] = timed(pre_only)
    rows["pre+bin_ms"] = timed(pre_bin)
    rows["fwd_full_ms"] = timed(fwd_full)
    rows["fwd_loss_ms"] = timed(loss_fn)
    rows["fwd_bwd_ms"] = timed(full_bwd)

    table = {
        "config": {"n": n, "frame": [width, height], "budget": budget,
                   "reduce": args.reduce, "layout": args.layout},
        "stages_ms": {
            "preprocess": round(rows["preprocess_ms"], 3),
            "binning": round(rows["pre+bin_ms"] - rows["preprocess_ms"],
                             3),
            "blend_fwd": round(rows["fwd_full_ms"] - rows["pre+bin_ms"],
                               3),
            "loss_overhead": round(rows["fwd_loss_ms"]
                                   - rows["fwd_full_ms"], 3),
            "backward": round(rows["fwd_bwd_ms"] - rows["fwd_loss_ms"],
                              3),
        },
        "cumulative_ms": {k: round(v, 3) for k, v in rows.items()},
        "mrays_per_s": round(width * height / rows["fwd_bwd_ms"] / 1e3,
                             3),
    }
    with open("BENCH_STAGES.json", "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
