"""MXU-precision cost/accuracy decomposition for the raster kernels
(VERDICT r3 item 7): sweep pallas_blend.MXU_PRECISION over
DEFAULT / HIGH / HIGHEST at the 1M-Gaussian headline config, measuring
blend fwd, full fwd+bwd, and the pixel/grad error vs the HIGHEST
reference. The reduce-side tri matmuls stay pinned at HIGHEST (see
pallas_blend._blocked_segment_reduce), so this isolates the IN-KERNEL
matmuls: the power-expansion (p6 @ coef), lane-cumsum tri, accumulation,
and the backward's fdotg/dfo/moment matmuls.

Run on the real chip:  python examples/profile_precision.py [--n 1000000]
Writes PRECISION_SWEEP.json.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    import goi_tpu.raster.pallas_blend as pb
    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.raster import RasterConfig, render
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
    mi, mb = suggest_budgets(scene, cam, align=pb.K, margin=1.0)
    cfg = RasterConfig(max_instances=mi, max_binned=mb,
                       backend="pallas")
    tgt = jnp.zeros((3, height, width))
    iters = args.iters

    def timed(fn, *xs):
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

    def loss_fn(params):
        out = render(scene.with_params(params), cam, jnp.zeros(3), cfg)
        return (jnp.mean(jnp.abs(out["render"] - tgt))
                + jnp.mean(jnp.abs(out["semantics"])))

    results = {"config": {"n": n, "frame": [width, height],
                          "budget": int(mi)}}
    ref_img = ref_grads = None
    params = scene.params()
    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        pb.MXU_PRECISION = prec
        fwd = jax.jit(lambda p: render(scene.with_params(p), cam,
                                       jnp.zeros(3), cfg)["render"])
        try:
            img = np.asarray(fwd(params))
        except NotImplementedError as e:
            # Mosaic's dot_general lowering supports DEFAULT/HIGHEST
            # only (no bf16_3x): record the gap instead of crashing
            results[name] = {"unsupported": str(e)[:120]}
            print(name, "unsupported in Mosaic kernels", flush=True)
            continue
        g = jax.jit(jax.grad(loss_fn))(params)
        jax.block_until_ready(g)
        g = {k: np.asarray(v) for k, v in g.items()}
        if ref_img is None:
            ref_img, ref_grads = img, g
        row = {
            "fwd_render_ms": round(timed(
                lambda p: jnp.sum(render(scene.with_params(p), cam,
                                         jnp.zeros(3),
                                         cfg)["render"]), params), 3),
            "fwd_bwd_ms": round(timed(
                lambda p: sum(jnp.sum(v) for v in jax.tree.leaves(
                    jax.grad(loss_fn)(p))), params), 3),
            "pixel_err_rel_peak": float(np.abs(img - ref_img).max()
                                        / max(np.abs(ref_img).max(),
                                              1e-20)),
            "grad_err_rel_scale": max(
                float(np.abs(g[k] - ref_grads[k]).max()
                      / max(np.abs(ref_grads[k]).max(), 1e-20))
                for k in g),
        }
        results[name] = row
        print(name, json.dumps(row), flush=True)
    pb.MXU_PRECISION = jax.lax.Precision.HIGHEST  # restore default
    with open("PRECISION_SWEEP.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
