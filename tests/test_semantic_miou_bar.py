"""Hard quality bar for the semantic-distillation -> open-vocab query
chain: mIoU on a synthetic multi-object scene.

The reference's reason to exist is open-vocabulary segmentation quality
(ref:eval_seg.py:31-122, train.py:142-167). PSNR already has a hard bar
(test_rgb_densify.py::test_rgb_psnr_bar); this is the matching bar for
the semantic side: distill a fresh semantic field through the codebook
against pixel-aligned 'APE' features, query each object by its feature
vector, and demand the demo-protocol mIoU (examples/full_pipeline_demo.py
step 5, i.e. eval_seg's per-prompt -> mean metric chain) clears a bar
far above chance.

Scaled down from the demo (3 objects, 64x48, a few hundred distill
iters) so it runs on the CPU mesh in ~1 min, but exercises the same
code path end to end: train_distillation -> QuerySession.set_text ->
compute_similarity -> iou_metrics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.eval.metrics import iou_metrics
from goi_tpu.raster import RasterConfig, render

N_OBJ = 3
APE_DIM = 32
H, W = 48, 64


def _gt_scene(rng):
    centers = np.array([[-0.9, 0.0, 0.0], [0.9, 0.2, 0.3],
                        [0.0, -0.2, -0.6]], np.float32)
    palette = rng.uniform(0.3, 1.0, (N_OBJ, 3)).astype(np.float32)
    xyz, colors, obj = [], [], []
    for k in range(N_OBJ):
        p = centers[k] + rng.normal(0, 0.16, (400, 3)).astype(np.float32)
        xyz.append(p)
        colors.append(np.tile(palette[k], (400, 1)))
        obj.append(np.full(400, k))
    xyz = np.concatenate(xyz)
    obj = np.concatenate(obj)
    scene = GaussianScene.create(
        xyz, np.concatenate(colors), sh_degree=0, sem_dim=10,
        scales=np.full(len(xyz), 0.05, np.float32))
    sems = np.zeros((len(xyz), 10), np.float32)
    sems[np.arange(len(xyz)), obj] = 4.0
    return scene.replace(
        opacity=jnp.full_like(scene.opacity, 1.8),
        semantics=jnp.asarray(sems))


def _cameras(n):
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = [2.6 * np.sin(a), 0.7, -2.6 * np.cos(a)]
        cams.append(Camera.look_at(eye, [0, 0, 0], [0, 1, 0],
                                   fovx=1.0, fovy=0.8,
                                   width=W, height=H))
    return cams


def test_distill_query_miou_bar():
    rng = np.random.default_rng(3)
    gt_scene = _gt_scene(rng)
    cams = _cameras(8)
    cfg = RasterConfig(max_instances=1 << 15, backend="xla")
    bg = jnp.zeros(3)

    # simplex-separated features: pairwise dot -1/N_OBJ, matching the
    # aligned space's non-match-dots-are-negative property that the
    # reference's sigmoid(dot*scale + 2) > 0.86 rule assumes (see
    # examples/full_pipeline_demo.py step 2 for the derivation)
    q, _ = np.linalg.qr(rng.normal(0, 1, (APE_DIM, N_OBJ + 1)))
    basis = q.T.astype(np.float32)
    obj_feats = basis - basis.mean(0, keepdims=True)
    obj_feats /= np.linalg.norm(obj_feats, axis=1, keepdims=True)

    render_gt = jax.jit(lambda c: render(gt_scene, c, bg, cfg))
    ape_maps, gt_masks = [], []
    for c in cams:
        wmap = np.asarray(render_gt(c)["semantics"])       # (10,H,W)
        ape = np.einsum("ohw,oc->chw", wmap[:N_OBJ], obj_feats[:N_OBJ])
        bg_w = np.maximum(1.0 - wmap[:N_OBJ].sum(0), 0.0)
        ape = ape + bg_w[None] * obj_feats[N_OBJ][:, None, None]
        ape_maps.append(ape.astype(np.float32))
        gt_masks.append(np.where(wmap[:N_OBJ].max(0) > 0.2,
                                 wmap[:N_OBJ].argmax(0), -1))

    # fresh semantic field on the GT geometry (the RGB side has its own
    # bar test; this isolates distillation + query quality)
    from goi_tpu.train.distill import train_distillation
    fresh = gt_scene.replace(semantics=jnp.zeros_like(gt_scene.semantics))
    train_idx = [i for i in range(len(cams)) if i % 4 != 0]
    dstate = train_distillation(
        fresh, [cams[i] for i in train_idx],
        [ape_maps[i] for i in train_idx],
        tab_len=48, ape_dim=APE_DIM, iterations=240,
        raster_cfg=cfg, log_every=1000)

    from goi_tpu.app.session import QuerySession
    sess = QuerySession(dstate.scene, dstate.decoder, dstate.lut, cfg,
                        sim_thresh=0.86, white_background=False)
    test_idx = [i for i in range(len(cams)) if i % 4 == 0]
    per_obj = []
    for k in range(N_OBJ):
        sess.set_text(jnp.asarray(obj_feats[k]) * 12.0)
        ious = []
        for i in test_idx:
            out = render(sess.scene, cams[i], bg, cfg)
            sim = sess.compute_similarity(
                out["semantics"].reshape(10, -1).T)
            pred = np.asarray(sim > 0).reshape(H, W)
            gt = np.asarray(gt_masks[i] == k)
            ious.append(float(iou_metrics(jnp.asarray(pred),
                                          jnp.asarray(gt))["iou"]))
        per_obj.append(np.mean(ious))

    miou = float(np.mean(per_obj))
    print(f"distill+query mIoU {miou:.3f} per-object {per_obj}")
    # chance level for 3 objects + background is ~0.2; the reference
    # paper operates at 0.6-0.8 mIoU on real scenes. Demand a bar that
    # only a working distill+query chain can clear.
    assert miou >= 0.85, (miou, per_obj)


def test_mixture_dilution_breaks_code_decode():
    """Pins the round-3 500k scale-run failure mode (VERDICT r4
    diagnosis, examples/diag_scale.py): the reference's query decode
    quantizes each pixel to ONE codebook prototype
    (argmax(softmax(MLP(f))*10) -> LUT row, ref:gui/main.py:363-385),
    so it is only faithful when per-pixel features are near-PURE. A
    semi-transparent veil between camera and surface dilutes every
    pixel into obj/background mixtures; the snapped prototype then
    falls below the similarity threshold for the true object and
    recall collapses (measured 0.31 mIoU at 500k). With pure features
    the same chain is near-perfect. This is a property of the decode
    DESIGN (faithful to the reference), so the scale protocol keeps
    its background OUTSIDE the camera ring (examples/scale_train.py,
    'far wall') the way real opaque scenes do."""
    rng = np.random.default_rng(0)
    ape_dim, n_obj = 32, 4
    q, _ = np.linalg.qr(rng.normal(0, 1, (ape_dim, n_obj + 1)))
    feats = q.T.astype(np.float32)
    feats -= feats.mean(0, keepdims=True)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bg = feats[n_obj]

    # codebook of PURE prototypes (the k-means fixed point when
    # training pixels are pure; tab rows = the classes)
    lut = jnp.asarray(feats)

    from goi_tpu.query.similarity import ape_similarity

    def decode_sim(pixel_feats, text):
        # argmax-to-prototype quantization, then the reference's
        # sigmoid-dot thresholding at 0.86
        sims = pixel_feats @ np.asarray(lut).T
        snapped = np.asarray(lut)[sims.argmax(1)]
        snapped /= np.maximum(
            np.linalg.norm(snapped, axis=1, keepdims=True), 1e-8)
        s = ape_similarity(jnp.asarray(snapped), jnp.asarray(text))
        return np.asarray(s) >= 0.86

    text0 = feats[0] * 12.0

    pure = np.tile(feats[0], (64, 1))
    assert decode_sim(pure, text0).all()          # pure -> recalled

    # 45/55 obj/bg mixture (a veil with ~0.55 transmittance loss):
    # nearest prototype is the BACKGROUND row -> below threshold for
    # the true object -> false negative, exactly the recall collapse
    mix = 0.45 * feats[0] + 0.55 * bg
    mixed = np.tile(mix / np.linalg.norm(mix), (64, 1))
    assert not decode_sim(mixed, text0).any()

    # the mixture itself (no quantization) still clears the threshold
    # comfortably — the information loss is in the argmax snap, not
    # the feature: quantization-robustness would need soft decoding,
    # a deliberate deviation we do NOT take (parity with the
    # reference's decode)
    s_raw = np.asarray(ape_similarity(jnp.asarray(mixed),
                                      jnp.asarray(text0)))
    assert (s_raw >= 0.86).all()
