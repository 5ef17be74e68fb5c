"""RGB 3DGS quality-tuning harness on the synthetic pipeline scene.

Runs only stages 1-3 of examples/full_pipeline_demo.py (GT scene ->
multi-view dataset -> RGB training from a noisy point cloud) with every
schedule knob on the CLI so densify/LR settings can be swept quickly on
one TPU chip. Target: >= 28 dB held-out PSNR (VERDICT.md round-2 item 1;
reference-class 3DGS training ref:train.py:96-202,
ref:arguments/__init__.py:64-91).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python examples/tune_rgb.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from full_pipeline_demo import build_gt_scene  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=str, default="512x384")
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--capacity-mult", type=float, default=4.0)
    ap.add_argument("--subsample", type=int, default=4)
    ap.add_argument("--densify-from", type=int, default=200)
    ap.add_argument("--densify-until-frac", type=float, default=0.5)
    ap.add_argument("--densify-interval", type=int, default=150)
    ap.add_argument("--grad-threshold", type=float, default=0.0004)
    ap.add_argument("--opacity-reset", type=int, default=10 ** 9)
    ap.add_argument("--pos-lr-max-steps", type=int, default=30000)
    ap.add_argument("--pos-lr-init", type=float, default=0.00016)
    ap.add_argument("--pos-lr-final", type=float, default=0.0000016)
    ap.add_argument("--feature-lr", type=float, default=0.0025)
    ap.add_argument("--opacity-lr", type=float, default=0.05)
    ap.add_argument("--scaling-lr", type=float, default=0.005)
    ap.add_argument("--extent", type=float, default=3.5)
    ap.add_argument("--init-scale", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tag", type=str, default="run")
    ap.add_argument("--stat-every", type=int, default=10 ** 9)
    args = ap.parse_args()
    W, H = map(int, args.wh.split("x"))

    import jax.numpy as jnp

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.eval.metrics import psnr
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.render import suggest_budgets
    from goi_tpu.train.optim import OptimConfig
    from goi_tpu.train.rgb import train_rgb

    t0 = time.time()
    gt_scene, _, _ = build_gt_scene()
    n_views = args.views
    cams = [Camera.look_at(
        [3.2 * np.sin(a), 1.2, -3.2 * np.cos(a)], [0, 0, 0], [0, 1, 0],
        fovx=0.9, fovy=0.72, width=W, height=H)
        for a in np.linspace(0, 2 * np.pi, n_views, endpoint=False)]
    test_idx = list(range(0, n_views, 8))
    train_idx = [i for i in range(n_views) if i % 8 != 0]

    from goi_tpu.raster.pallas_blend import K
    budget, binned = suggest_budgets(gt_scene, cams[:4], align=K)
    cfg = RasterConfig(max_instances=budget, max_binned=binned,
                       backend="pallas")
    bg = jnp.zeros(3)

    import jax
    render_gt = jax.jit(lambda c: render(gt_scene, c, bg, cfg))
    images = [np.asarray(render_gt(c)["render"]) for c in cams]
    print(f"[{time.time()-t0:6.1f}s] dataset {n_views}x{W}x{H}",
          flush=True)

    rng = np.random.default_rng(1)
    gt_xyz = np.asarray(gt_scene.xyz)
    pcd = (gt_xyz[::args.subsample]
           + rng.normal(0, 0.02, gt_xyz[::args.subsample].shape)
           ).astype(np.float32)
    start = GaussianScene.create(
        pcd, None, sh_degree=3, sem_dim=10,
        scales=np.full(len(pcd), args.init_scale, np.float32),
        capacity=int(len(pcd) * args.capacity_mult))
    ocfg = OptimConfig(
        iterations=args.iters,
        densify_from_iter=args.densify_from,
        densify_until_iter=int(args.iters * args.densify_until_frac),
        densification_interval=args.densify_interval,
        opacity_reset_interval=args.opacity_reset,
        densify_grad_threshold=args.grad_threshold,
        position_lr_init=args.pos_lr_init,
        position_lr_final=args.pos_lr_final,
        position_lr_max_steps=args.pos_lr_max_steps,
        feature_lr=args.feature_lr,
        opacity_lr=args.opacity_lr,
        scaling_lr=args.scaling_lr,
    )
    def stat_cb(it, st, aux):
        if it % args.stat_every:
            return
        sc = st.scene
        v = np.asarray(sc.valid)
        op = 1 / (1 + np.exp(-np.asarray(sc.opacity[:, 0])))[v]
        sca = np.exp(np.asarray(sc.scaling)).max(axis=1)[v]
        r = np.linalg.norm(np.asarray(sc.xyz), axis=1)[v]
        print(f"  stat {it}: op[{op.min():.2e},{np.median(op):.3f},"
              f"{op.max():.4f}] scale[{np.median(sca):.4f},"
              f"{sca.max():.3f}] |xyz|max {r.max():.2f} "
              f"gnorm {float(aux['gnorm']):.3e} "
              f"loss {float(aux['loss']):.5f}", flush=True)

    state, final_cfg = train_rgb(
        start, [cams[i] for i in train_idx],
        [images[i] for i in train_idx],
        cfg=ocfg, raster_cfg=cfg, iterations=args.iters,
        scene_extent=args.extent, seed=args.seed,
        log_every=max(args.iters // 10, 1), callback=stat_cb,
        return_raster_cfg=True)
    trained = state.scene

    # Eval with the post-rebudget config, topped up by a fresh demand
    # estimate on the trained scene (a stale budget truncates the
    # deepest instances and depresses PSNR on dense scenes).
    import dataclasses as _dc
    emi, emb = suggest_budgets(trained, cams[:4], align=K)
    ecfg = _dc.replace(
        final_cfg,
        max_instances=max(final_cfg.max_instances, emi),
        max_binned=max(final_cfg.max_binned or final_cfg.max_instances,
                       emb))
    ps = [float(psnr(render(trained, cams[i], bg, ecfg)["render"],
                     jnp.asarray(images[i]))) for i in test_idx]
    train_ps = [float(psnr(render(trained, cams[i], bg, ecfg)["render"],
                           jnp.asarray(images[i])))
                for i in train_idx[:4]]
    result = dict(tag=args.tag, psnr=float(np.mean(ps)),
                  psnr_train=float(np.mean(train_ps)),
                  n_valid=int(trained.num_valid),
                  capacity=int(trained.capacity),
                  secs=round(time.time() - t0, 1),
                  args=vars(args))
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
