"""End-to-end GOI pipeline on synthetic data, at realistic scale.

Reproduces the reference's complete workflow (SURVEY.md §3.1-§3.3) with
no external datasets or frozen-model weights:

  1. build a ground-truth scene of colored object clusters,
  2. render a multi-view RGB dataset + pixel-aligned 'APE' feature maps
     (each object carries a distinct feature vector — the stand-in for
     offline APE/CLIP extraction),
  3. train a fresh 3DGS scene from a noisy point cloud (densification
     on) -> PSNR,
  4. distill the semantic field through the codebook (train.py role),
  5. open-vocab query by 'text' embedding -> masks -> mIoU/mPA/mP
     (eval_seg role),
  6. OSH hyperplane fine-tune against a RES-style mask -> improved IoU.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python examples/full_pipeline_demo.py
      (add --fast for a smoke-test configuration)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build_gt_scene(n_objects=5, pts_per_obj=3000, seed=0):
    import jax.numpy as jnp

    from goi_tpu.core.scene import GaussianScene

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1.2, 1.2, (n_objects, 3))
    centers[:, 1] *= 0.4
    palette = rng.uniform(0.2, 1.0, (n_objects, 3))
    xyz, colors, obj_ids = [], [], []
    for k in range(n_objects):
        p = centers[k] + rng.normal(0, 0.22, (pts_per_obj, 3))
        xyz.append(p)
        colors.append(np.tile(palette[k], (pts_per_obj, 1))
                      * rng.uniform(0.7, 1.0, (pts_per_obj, 1)))
        obj_ids.append(np.full(pts_per_obj, k))
    xyz = np.concatenate(xyz).astype(np.float32)
    colors = np.concatenate(colors).astype(np.float32)
    obj_ids = np.concatenate(obj_ids)

    scene = GaussianScene.create(
        xyz, colors, sh_degree=3, sem_dim=10,
        scales=np.full(len(xyz), 0.035, np.float32))
    # opacity ~0.85, semantics = one-hot object channel
    sems = np.zeros((len(xyz), 10), np.float32)
    sems[np.arange(len(xyz)), obj_ids] = 4.0
    scene = scene.replace(
        active_sh_degree=0,
        opacity=jnp.full_like(scene.opacity, 1.8),
        semantics=jnp.asarray(sems))
    return scene, obj_ids, palette


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from goi_tpu.core.camera import Camera
    from goi_tpu.eval.metrics import iou_metrics, psnr
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.render import suggest_budgets

    W, H = (256, 192) if args.fast else (512, 384)
    n_views = 8 if args.fast else 24
    rgb_iters = 300 if args.fast else 3000
    distill_iters = 120 if args.fast else 1500
    ape_dim, tab_len = 64, 32

    t_start = time.time()
    gt_scene, obj_ids, palette = build_gt_scene()
    cams = [Camera.look_at(
        [3.2 * np.sin(a), 1.2, -3.2 * np.cos(a)], [0, 0, 0], [0, 1, 0],
        fovx=0.9, fovy=0.72, width=W, height=H)
        for a in np.linspace(0, 2 * np.pi, n_views, endpoint=False)]
    test_cams = cams[::8]
    train_cams = [c for i, c in enumerate(cams) if i % 8 != 0]

    budget, binned = suggest_budgets(gt_scene, cams[:4], align=K)
    cfg = RasterConfig(max_instances=budget, max_binned=binned,
                       backend="pallas")
    bg = jnp.zeros(3)

    # ---- 2. dataset: RGB + APE feature maps + GT object masks ----
    rng = np.random.default_rng(1)
    # Simplex-separated unit features (pairwise dot exactly -1/(n-1)):
    # the synthetic stand-in must reproduce the ALIGNED space's key
    # property that non-matching pixel/text dots are negative — the
    # reference's decision rule sigmoid(dot*scale + 2) > 0.86 fires for
    # ANY dot > -0.015 (ref:ext/vision_language_align.py:109-122,
    # gui/main.py:378-380), which iid random unit vectors (cross-dots
    # ~0 +- 1/sqrt(d)) violate on ~half the non-matching pixels.
    q, _ = np.linalg.qr(rng.normal(0, 1, (ape_dim, 6)))
    basis = q.T.astype(np.float32)                    # 6 orthonormal
    obj_feats = basis - basis.mean(0, keepdims=True)
    obj_feats /= np.linalg.norm(obj_feats, axis=1, keepdims=True)
    bg_feat = obj_feats[5]  # background carries its own feature

    render_gt = jax.jit(lambda c: render(gt_scene, c, bg, cfg))
    images, ape_maps, gt_masks = [], [], []
    for c in cams:
        out = render_gt(c)
        images.append(np.asarray(out["render"]))
        wmap = np.asarray(out["semantics"])            # (10, H, W)
        ape = np.einsum("ohw,oc->chw", wmap[:5], obj_feats[:5])
        bg_w = np.maximum(1.0 - wmap[:5].sum(0), 0.0)
        ape = ape + bg_w[None] * bg_feat[:, None, None]
        ape_maps.append(ape.astype(np.float32))
        gt_masks.append(np.where(wmap[:5].max(0) > 0.2,
                                 wmap[:5].argmax(0), -1))
    print(f"[{time.time()-t_start:6.1f}s] dataset: {n_views} views "
          f"{W}x{H}, gt scene {int(gt_scene.num_valid)} gaussians",
          flush=True)

    # ---- 3. RGB training from a noisy point cloud ----
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.train.optim import OptimConfig
    from goi_tpu.train.rgb import train_rgb

    pcd = np.asarray(gt_scene.xyz)[::4] + rng.normal(
        0, 0.02, (int(gt_scene.capacity) // 4 + (gt_scene.capacity % 4 > 0), 3)).astype(np.float32)[:len(np.asarray(gt_scene.xyz)[::4])]
    start = GaussianScene.create(
        pcd, None, sh_degree=3, sem_dim=10,
        scales=np.full(len(pcd), 0.05, np.float32),
        capacity=int(len(pcd) * 4))
    # Schedule from the round-2 quality sweep (examples/tune_rgb.py):
    # full position-LR decay over the run + densify until 0.65 +
    # opacity reset at 3000 reached 28.1 dB held-out at 256x192/7k
    # iters/32 views (tag E1_sched). The critical fixes over the 19 dB
    # round-1 schedule: pos_lr_max_steps must equal the run length
    # (not the reference's 30k) and densification must outlive the
    # last opacity reset.
    ocfg = OptimConfig(
        iterations=rgb_iters, densify_from_iter=200,
        densify_until_iter=int(rgb_iters * 0.65),
        densification_interval=150,
        opacity_reset_interval=3000,
        position_lr_max_steps=rgb_iters,
        densify_grad_threshold=0.0004)
    train_idx = [i for i in range(n_views) if i % 8 != 0]
    state, cfg = train_rgb(
        start, [cams[i] for i in train_idx],
        [images[i] for i in train_idx],
        cfg=ocfg, raster_cfg=cfg, iterations=rgb_iters,
        scene_extent=3.5, log_every=max(rgb_iters // 4, 1),
        return_raster_cfg=True)
    trained = state.scene

    ps = [float(psnr(render(trained, c, bg, cfg)["render"],
                     jnp.asarray(images[i * 8])))
          for i, c in enumerate(test_cams)]
    print(f"[{time.time()-t_start:6.1f}s] RGB training: "
          f"{int(trained.num_valid)} gaussians, held-out PSNR "
          f"{np.mean(ps):.2f} dB", flush=True)

    # ---- 4. semantic distillation ----
    from goi_tpu.train.distill import train_distillation

    fresh = trained.replace(
        semantics=jnp.zeros_like(trained.semantics))
    dstate = train_distillation(
        fresh, [cams[i] for i in train_idx],
        [ape_maps[i] for i in train_idx],
        tab_len=tab_len, ape_dim=ape_dim, iterations=distill_iters,
        raster_cfg=cfg, log_every=max(distill_iters // 3, 1))
    print(f"[{time.time()-t_start:6.1f}s] distillation done",
          flush=True)

    # ---- 5. open-vocab query -> segmentation metrics ----
    from goi_tpu.app.session import QuerySession

    sess = QuerySession(dstate.scene, dstate.decoder, dstate.lut, cfg,
                        sim_thresh=0.86, white_background=False)
    per_obj = []
    for k in range(5):
        sess.set_text(jnp.asarray(obj_feats[k]) * 12.0)
        ms = []
        for i, c in enumerate(test_cams):
            out = render(sess.scene, c, bg, cfg)
            sim = sess.compute_similarity(
                out["semantics"].reshape(10, -1).T)
            pred = np.asarray(sim > 0).reshape(H, W)
            gt = np.asarray(gt_masks[i * 8] == k)
            m = iou_metrics(jnp.asarray(pred), jnp.asarray(gt))
            ms.append([float(m["iou"]), float(m["mpa"]),
                       float(m["mp"])])
        per_obj.append(np.mean(ms, axis=0))
    per_obj = np.asarray(per_obj)
    print(f"[{time.time()-t_start:6.1f}s] query eval over 5 objects: "
          f"mIoU {per_obj[:,0].mean():.3f} mPA {per_obj[:,1].mean():.3f}"
          f" mP {per_obj[:,2].mean():.3f}", flush=True)

    # ---- 6. OSH fine-tune on the worst object ----
    worst = int(np.argmin(per_obj[:, 0]))
    sess.set_text(jnp.asarray(obj_feats[worst]) * 12.0)
    # pick the view where the object is most visible
    vis = [int((gt_masks[i * 8] == worst).sum())
           for i in range(len(test_cams))]
    vi = int(np.argmax(vis))
    cam0 = test_cams[vi]
    res_mask = (np.asarray(gt_masks[vi * 8]) == worst).astype(
        np.float32)
    iou, epochs = sess.finetune_with_res(cam0, res_mask,
                                         max_epochs=2000)
    print(f"[{time.time()-t_start:6.1f}s] OSH finetune obj {worst}: "
          f"IoU {per_obj[worst,0]:.3f} -> {iou:.3f} "
          f"({epochs} epochs)", flush=True)

    print("PIPELINE COMPLETE", flush=True)
    return dict(psnr=float(np.mean(ps)), miou=float(per_obj[:, 0].mean()),
                osh_iou=float(iou))


if __name__ == "__main__":
    main()
