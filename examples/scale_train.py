"""Scale-realistic end-to-end training: 500k-Gaussian semantic
distillation at 512x512 on the real chip (VERDICT r2 item 5, protocol
fixed in round 4 per VERDICT r3 item 1).

Pins the production-scale behavior nothing small can: the chunked
layout's chain gradient reduction (sort-permutation inversion + MXU
prefix sums) runs at the multi-million-instance budgets where it is
the production default, the run starts with a deliberately undersized
buffer so the trainer's rebudget-on-overflow loop fires, and the
end-to-end distill -> query mIoU bar certifies the chain-reduce
numerics at that scale.

Round-4 protocol fix (examples/diag_scale.py probes): the round-3 run
scored mIoU 0.31 NOT from gradient noise — the train-view mIoU was
0.86 with the same kernels — but from an unrepresentative synthetic
protocol:
  1. 7 training views at one elevation under-constrained the 500k
     scene (the reference trains on 100-300 images, llffhold=8 —
     ref:scene/dataset_readers.py:152-157); held-out views exposed
     untrained surface crust. -> 64 views on two elevation rings,
     every 8th held out.
  2. the 'background shell' at radius 3.0 sat BETWEEN the cameras
     (3.4-3.9) and the objects: a semi-transparent veil diluted every
     pixel's feature into obj/bg mixtures, which the reference's own
     argmax->LUT decode (ref:gui/main.py:363-385) cannot represent —
     held-out recall capped ~0.65. -> the background is a far wall
     (radius 4.5, outside the ring), matching real scenes' opaque
     surfaces. The discretization failure mode is pinned by
     tests/test_semantic_miou_bar.py::test_mixture_dilution_breaks_code_decode.
With both fixes: held-out mIoU 0.87 (range 0.83-0.91 over 8 eval
views), train-view 0.92 — over the 0.8 bar (DIAG_SCALE.json).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python examples/scale_train.py
Also wrapped (env-gated) by tests/test_scale_training.py.
Writes SCALE_TRAIN.json.
"""

import argparse
import json
import time


def run(n_gauss=500_000, size=512, iters=1500, miou_bar=0.8,
        seed=3, n_obj=4, ape_dim=64, n_views=64,
        variant="standard"):
    """variant="adversarial" (VERDICT r4 item 7) stresses the three
    properties the round-4 protocol avoided: MILD TRANSLUCENCY (raw
    opacity 0.9 -> alpha ~0.71: pixels become obj/bg feature mixtures,
    the regime the reference's argmax->LUT decode cannot fully
    represent, ref:gui/main.py:363-385), an SFM-PERTURBED field
    geometry (xyz noise 0.01 + per-axis scale jitter: the distill
    trains semantics on an imperfect reconstruction, as it would after
    real SfM + RGB training), and ANISOTROPIC Gaussians (per-axis
    log-scales up to ~6:1). The run reports mIoU against a computed
    DECODE CEILING: GT one-hot semantics rendered through the
    perturbed translucent geometry, then the same argmax decode —
    the upper bound ANY semantics-only training can reach through
    this decode on this geometry. Bar: miou >= 0.75 * ceiling."""
    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.eval.metrics import iou_metrics
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.render import (AUTO_CUMSUM_MIN,
                                       _effective_reduce,
                                       suggest_budgets)
    from goi_tpu.train.distill import train_distillation

    rng = np.random.default_rng(seed)
    h = w = size

    # ---- ground-truth scene: n_obj clusters + far background wall ---
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
    colors = rng.uniform(0.2, 1.0, (n_obj + 1, 3)).astype(
        np.float32)[obj]
    scene = GaussianScene.create(
        xyz, colors, sh_degree=0, sem_dim=10,
        scales=np.full(len(xyz), 0.012, np.float32))
    sems = np.zeros((len(xyz), 10), np.float32)
    sems[np.arange(len(xyz)), np.minimum(obj, 9)] = 4.0
    adversarial = variant == "adversarial"
    opacity_raw = 0.9 if adversarial else 1.8   # alpha 0.71 vs 0.86
    gt_scene = scene.replace(
        opacity=jnp.full_like(scene.opacity, opacity_raw),
        semantics=jnp.asarray(sems))
    if adversarial:
        # anisotropic per-axis log-scales (up to ~6:1 ellipsoids)
        aniso = rng.uniform(np.log(0.005), np.log(0.03),
                            (scene.capacity, 3)).astype(np.float32)
        gt_scene = gt_scene.replace(scaling=jnp.asarray(aniso))

    # view-rich llffhold-8 protocol (module docstring, fix 1)
    cams = []
    for i in range(n_views):
        a = 2 * np.pi * i / (n_views // 2)
        hgt = 0.9 if i < n_views // 2 else 2.0
        eye = [3.4 * np.sin(a), hgt, -3.4 * np.cos(a)]
        cams.append(Camera.look_at(eye, [0, 0, 0], [0, 1, 0],
                                   fovx=1.0, fovy=1.0,
                                   width=w, height=h))
    test_idx = list(range(0, n_views, 8))
    train_idx = [i for i in range(n_views) if i % 8 != 0]

    mi, mb = suggest_budgets(gt_scene, cams[:8], align=K, margin=1.2)
    cfg = RasterConfig(max_instances=mi, max_binned=mb,
                       backend="pallas")
    if n_gauss >= 100_000:  # tiny smoke runs skip the scale premise
        # chunked default: the chain reduce; budgets large enough
        # that the legacy aligned layout would engage cumsum too
        assert mb >= AUTO_CUMSUM_MIN, (
            f"scene too small for the production reduce regime ({mb})")
        assert _effective_reduce(cfg) == "chain", \
            _effective_reduce(cfg)

    # ---- GT feature maps + masks (simplex-separated APE vectors) ----
    q, _ = np.linalg.qr(rng.normal(0, 1, (ape_dim, n_obj + 1)))
    basis = q.T.astype(np.float32)
    obj_feats = basis - basis.mean(0, keepdims=True)
    obj_feats /= np.linalg.norm(obj_feats, axis=1, keepdims=True)

    render_gt = jax.jit(lambda c: render(gt_scene, c, jnp.zeros(3),
                                         cfg))
    ape_maps, gt_masks = [], []
    for c in cams:
        wmap = np.asarray(render_gt(c)["semantics"])
        ape = np.einsum("ohw,oc->chw", wmap[:n_obj],
                        obj_feats[:n_obj])
        bg_w = np.maximum(1.0 - wmap[:n_obj].sum(0), 0.0)
        ape = ape + bg_w[None] * obj_feats[n_obj][:, None, None]
        ape_maps.append(ape.astype(np.float32))
        gt_masks.append(np.where(wmap[:n_obj].max(0) > 0.2,
                                 wmap[:n_obj].argmax(0), -1))

    # ---- distill a fresh field, starting UNDER-budgeted so the ------
    # trainer's rebudget-on-overflow loop must fire and re-jit
    # (chunked layout: the instance budget is the single knob)
    small = RasterConfig(max_instances=max(K * 512, mi // 2),
                         backend="pallas")
    field_geom = gt_scene
    ceiling = None
    if adversarial:
        # SfM-perturbed field geometry: the distill trains semantics
        # on an imperfect reconstruction of the GT surfaces
        field_geom = gt_scene.replace(
            xyz=gt_scene.xyz + jnp.asarray(
                rng.normal(0, 0.01, gt_scene.xyz.shape)
                .astype(np.float32)),
            scaling=gt_scene.scaling + jnp.asarray(
                rng.uniform(np.log(0.8), np.log(1.25),
                            gt_scene.scaling.shape)
                .astype(np.float32)))
        # decode ceiling: GT one-hot semantics rendered through the
        # perturbed translucent geometry, same argmax decode (docstring)
        render_c = jax.jit(lambda c: render(field_geom, c,
                                            jnp.zeros(3), cfg))
        cvals = []
        for vi in test_idx:
            wmap = np.asarray(render_c(cams[vi])["semantics"])
            pred_lab = np.where(wmap[:n_obj].max(0) > 0.2,
                                wmap[:n_obj].argmax(0), -1)
            per_obj = []
            for k in range(n_obj):
                inter = np.logical_and(pred_lab == k,
                                       gt_masks[vi] == k).sum()
                union = np.logical_or(pred_lab == k,
                                      gt_masks[vi] == k).sum()
                per_obj.append(inter / max(union, 1))
            cvals.append(float(np.mean(per_obj)))
        ceiling = float(np.mean(cvals))
        print(f"decode ceiling on perturbed geometry: {ceiling:.4f} "
              f"(per-view {[round(v, 3) for v in cvals]})", flush=True)
        miou_bar = 0.75 * ceiling
    fresh = field_geom.replace(
        semantics=jnp.zeros_like(gt_scene.semantics))
    # pre-upload the (64, 512, 512) feature maps ONCE: re-transferring
    # 67 MB host->device per iteration dominates the step time
    ape_dev = [jax.device_put(jnp.asarray(a)) for a in ape_maps]
    jax.block_until_ready(ape_dev)
    t0 = time.time()
    dstate = train_distillation(
        fresh, [cams[i] for i in train_idx],
        [ape_dev[i] for i in train_idx], tab_len=48, ape_dim=ape_dim,
        iterations=iters, raster_cfg=small, log_every=100)
    train_s = time.time() - t0

    # ---- query each object on EVERY held-out view; mIoU bar ---------
    from goi_tpu.app.session import QuerySession
    sess = QuerySession(dstate.scene, dstate.decoder, dstate.lut, cfg,
                        sim_thresh=0.86, white_background=False)
    render_q = jax.jit(lambda s, c: render(s, c, jnp.zeros(3), cfg))
    per_view = []
    per_obj_all = np.zeros(n_obj)
    for vi in test_idx:
        semmap = render_q(sess.scene, cams[vi])["semantics"] \
            .reshape(10, -1).T
        per_obj = []
        for k in range(n_obj):
            sess.set_text(jnp.asarray(obj_feats[k]) * 12.0)
            sim = sess.compute_similarity(semmap)
            pred = np.asarray(sim > 0).reshape(h, w)
            gt = np.asarray(gt_masks[vi] == k)
            per_obj.append(float(iou_metrics(
                jnp.asarray(pred), jnp.asarray(gt))["iou"]))
        per_obj_all += np.asarray(per_obj) / len(test_idx)
        per_view.append(float(np.mean(per_obj)))
    miou = float(np.mean(per_view))

    result = {
        "n_gauss": n_gauss, "frame": [w, h], "iters": iters,
        "n_views": n_views, "n_train_views": len(train_idx),
        "budget_expansion": int(mi), "budget_binned": int(mb),
        "reduce": "chain (chunked default)",
        "started_instances": int(small.max_instances),
        "train_s": round(train_s, 1),
        "ms_per_iter": round(train_s / iters * 1000, 1),
        "miou": round(miou, 4),
        "per_view_miou": [round(v, 4) for v in per_view],
        "per_obj_iou": [round(float(v), 4) for v in per_obj_all],
        "miou_bar": round(miou_bar, 4),
        "variant": variant,
    }
    if ceiling is not None:
        result["decode_ceiling"] = round(ceiling, 4)
        result["miou_over_ceiling"] = round(miou / max(ceiling, 1e-9),
                                            4)
    out_name = ("SCALE_TRAIN_ADV.json" if adversarial
                else "SCALE_TRAIN.json")
    print(json.dumps(result, indent=1))
    with open(out_name, "w") as f:
        json.dump(result, f, indent=1)
    assert miou >= miou_bar, (miou, per_view)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--bar", type=float, default=0.8)
    ap.add_argument("--variant", type=str, default="standard",
                    choices=["standard", "adversarial"])
    args = ap.parse_args()
    run(n_gauss=args.n, size=args.size, iters=args.iters,
        miou_bar=args.bar, variant=args.variant)
