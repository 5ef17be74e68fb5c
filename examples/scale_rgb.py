"""Production-scale RGB 3DGS training run (VERDICT r4 item 5): >=500k
Gaussians from an SfM-noise init, densification crossing at least one
capacity regrowth, opacity resets mid-run, held-out PSNR >= 25.

This exercises the optimizer-state surgery + densify/prune/reset path
(ref:scene/gaussian_model.py:360-510, train.py:96-202) at the scale
the reference actually trains (MipNeRF360 scenes run 0.5-6M
primitives), on the production chunked-pallas raster path with the
trainer's rebudget-on-overflow loop live.

Protocol mirrors examples/scale_train.py's fixed round-4 geometry
(object clusters + far opaque wall, two-ring camera set, llffhold-8
eval split) with an RGB reconstruction target instead of semantics:
GT colors are per-object bases + per-point variation, so the target
has real texture at the 0.012 splat scale.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python examples/scale_rgb.py
Writes SCALE_RGB.json; wrapped (env-gated) by
tests/test_scale_training.py::test_scale_rgb_training.
"""

import argparse
import json
import time


def run(n_gauss=600_000, width=512, height=384, iters=4500,
        psnr_bar=25.0, seed=3, n_obj=4, n_views=48, subsample=2,
        capacity_mult=1.5):
    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.eval.metrics import psnr
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.render import suggest_budgets
    from goi_tpu.train.optim import OptimConfig
    from goi_tpu.train.rgb import train_rgb

    t0 = time.time()
    rng = np.random.default_rng(seed)

    # ---- GT scene: n_obj clusters + far opaque wall (scale_train's
    # round-4 geometry), textured RGB ----
    per = n_gauss // (n_obj + 1)
    centers = np.stack([
        np.array([np.cos(2 * np.pi * k / n_obj),
                  0.3 * np.sin(4 * np.pi * k / n_obj),
                  np.sin(2 * np.pi * k / n_obj)], np.float32)
        for k in range(n_obj)])
    xyz, obj = [], []
    for k in range(n_obj):
        xyz.append(centers[k] + rng.normal(0, 0.22, (per, 3)))
        obj.append(np.full(per, k))
    shell = rng.normal(0, 1, (n_gauss - n_obj * per, 3))
    shell = 4.5 * shell / np.linalg.norm(shell, axis=1, keepdims=True)
    xyz.append(shell)
    obj.append(np.full(len(shell), n_obj))
    xyz = np.concatenate(xyz).astype(np.float32)
    obj = np.concatenate(obj)
    base = rng.uniform(0.15, 0.95, (n_obj + 1, 3)).astype(np.float32)
    colors = np.clip(base[obj] + rng.normal(0, 0.12, (len(xyz), 3)),
                     0.0, 1.0).astype(np.float32)
    gt = GaussianScene.create(
        xyz, colors, sh_degree=0, sem_dim=0,
        scales=np.full(len(xyz), 0.012, np.float32))
    gt = gt.replace(opacity=jnp.full_like(gt.opacity, 1.8))

    # ---- two-ring camera set, llffhold-8 split ----
    cams = []
    for i in range(n_views):
        a = 2 * np.pi * i / (n_views // 2)
        hgt = 0.9 if i < n_views // 2 else 2.0
        cams.append(Camera.look_at(
            [3.6 * np.sin(a), hgt, -3.6 * np.cos(a)], [0, 0, 0],
            [0, 1, 0], fovx=0.9, fovy=0.72, width=width,
            height=height))
    test_idx = list(range(0, n_views, 8))
    train_idx = [i for i in range(n_views) if i % 8 != 0]

    gmi, gmb = suggest_budgets(gt, cams[:6], align=K, margin=1.3)
    gcfg = RasterConfig(max_instances=gmi, max_binned=gmb,
                        backend="pallas")
    bg = jnp.zeros(3)
    render_gt = jax.jit(lambda c: render(gt, c, bg, gcfg)["render"])
    images = [np.asarray(render_gt(c)) for c in cams]
    print(f"[{time.time()-t0:6.1f}s] dataset {n_views}x{width}x"
          f"{height} from {n_gauss} GT Gaussians", flush=True)

    # ---- SfM-noise init: subsampled noisy point cloud ----
    pcd = (xyz[::subsample]
           + rng.normal(0, 0.02, xyz[::subsample].shape)
           ).astype(np.float32)
    pcol = np.clip(colors[::subsample]
                   + rng.normal(0, 0.05, pcd.shape), 0, 1
                   ).astype(np.float32)
    capacity = int(len(pcd) * capacity_mult)
    start = GaussianScene.create(
        pcd, pcol, sh_degree=2, sem_dim=0,
        scales=np.full(len(pcd), 0.03, np.float32),
        capacity=capacity)
    print(f"init {len(pcd)} Gaussians (SfM subsample {subsample}, "
          f"noise 0.02), capacity {capacity}", flush=True)

    mi, mb = suggest_budgets(start, cams[:6], align=K, margin=1.3)
    rcfg = RasterConfig(max_instances=mi, max_binned=mb,
                        backend="pallas")
    ocfg = OptimConfig(
        iterations=iters,
        densify_from_iter=300,
        densify_until_iter=iters // 2,
        densification_interval=150,
        opacity_reset_interval=1500,
        densify_grad_threshold=0.00025,
        position_lr_max_steps=iters,
    )

    events = {"regrowths": 0, "resets": 0, "cap": capacity,
              "max_valid": 0}

    def cb(it, st, aux):
        cap = int(st.scene.capacity)
        if cap > events["cap"]:
            events["regrowths"] += 1
            events["cap"] = cap
        if it % ocfg.opacity_reset_interval == 0 and it < iters:
            events["resets"] += 1
        events["max_valid"] = max(events["max_valid"],
                                  int(st.scene.num_valid))

    state, final_cfg = train_rgb(
        start, [cams[i] for i in train_idx],
        [images[i] for i in train_idx],
        cfg=ocfg, raster_cfg=rcfg, iterations=iters,
        scene_extent=3.6, seed=seed, log_every=max(iters // 15, 1),
        callback=cb, return_raster_cfg=True)
    trained = state.scene

    import dataclasses as _dc
    emi, emb = suggest_budgets(trained, cams[:6], align=K, margin=1.3)
    ecfg = _dc.replace(
        final_cfg,
        max_instances=max(final_cfg.max_instances, emi),
        max_binned=max(final_cfg.max_binned
                       or final_cfg.max_instances, emb))
    ps = [float(psnr(render(trained, cams[i], bg, ecfg)["render"],
                     jnp.asarray(images[i]))) for i in test_idx]
    tps = [float(psnr(render(trained, cams[i], bg, ecfg)["render"],
                      jnp.asarray(images[i])))
           for i in train_idx[::8]]

    result = {
        "n_gauss_gt": n_gauss, "frame": [width, height],
        "iters": iters, "n_views": n_views,
        "init_gaussians": len(pcd),
        "final_gaussians": int(trained.num_valid),
        "final_capacity": int(trained.capacity),
        "capacity_regrowths": events["regrowths"],
        "opacity_resets": events["resets"],
        "psnr_heldout": round(float(np.mean(ps)), 3),
        "psnr_heldout_per_view": [round(p, 2) for p in ps],
        "psnr_train": round(float(np.mean(tps)), 3),
        "psnr_bar": psnr_bar,
        "final_max_instances": int(ecfg.max_instances),
        "secs": round(time.time() - t0, 1),
    }
    print("RESULT " + json.dumps(result), flush=True)
    with open("SCALE_RGB.json", "w") as f:
        json.dump(result, f, indent=1)
    assert result["final_gaussians"] >= 500_000, result
    assert result["capacity_regrowths"] >= 1, result
    assert result["opacity_resets"] >= 1, result
    assert result["psnr_heldout"] >= psnr_bar, result
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=600_000)
    ap.add_argument("--iters", type=int, default=4500)
    ap.add_argument("--views", type=int, default=48)
    ap.add_argument("--subsample", type=int, default=2)
    args = ap.parse_args()
    run(n_gauss=args.n, iters=args.iters, n_views=args.views,
        subsample=args.subsample)
