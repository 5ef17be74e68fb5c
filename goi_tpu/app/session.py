"""Headless query/editing session: the GUI's model-side logic.

Everything gui/main.py does *around* DearPyGui, re-hosted as a plain
class so it drives the web/socket viewer, batch CLIs, and tests:

- per-frame render + open-vocab similarity overlay
  (ref:gui/main.py:549-604 test_step, :363-398 compute_similarity /
  set_clip_mask)
- OSH fine-tuning from a RES mask (ref:gui/main.py:1673-1763)
- 3D retrieval / segmentation / deletion / move via per-Gaussian
  similarity + motion vector (ref:gui/main.py:400-405,516-531,
  1168-1227)
- DBSCAN instance grouping with view-consistency filtering
  (ref:gui/main.py:1595-1671)
- anchor-pose video rendering (ref:gui/main.py:1766-1821)
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.query.osh import OSHState, osh_finetune, osh_init, osh_predict
from goi_tpu.query.similarity import ape_similarity
from goi_tpu.raster import RasterConfig, render
from goi_tpu.semantic.codebook import SemanticDecoder
from goi_tpu.utils.image import clip_color, compute_mask_ratio


from functools import partial

from goi_tpu.utils.image import turbo_colormap


@partial(jax.jit, static_argnames=("cfg", "mode", "branch",
                                   "scaling_modifier", "sim_thresh",
                                   "log_scale", "as_u8"))
def _frame_device(scene, cam, bg, gmask, decoder, lut, text, osh_w,
                  osh_b, *, cfg, mode, branch, scaling_modifier,
                  sim_thresh, log_scale, as_u8=False):
    """One viewer frame fully ON DEVICE (render + similarity +
    turbo-heat composite in a single XLA program). The eager per-op
    version of this path pays one host dispatch per op — tens of ms of
    pure host overhead per frame at interactive sizes (the reference
    GUI's per-frame hot loop, ref:gui/main.py:549-604); compiled it is
    one dispatch. Math is identical to QuerySession.render_view's
    original eager composition (compute_similarity + clip_color)."""
    def finish(img):
        # as_u8: quantize ON DEVICE so the host pulls 3.7 MB of uint8
        # per 1296x968 frame instead of 15 MB of f32 (the web frame's
        # transfer dominates at interactive sizes)
        if as_u8:
            return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return img

    out = render(scene, cam, bg, cfg,
                 scaling_modifier=scaling_modifier,
                 gaussian_mask=gmask)
    if mode == "depth":
        d = out["depth"][0]
        d = (d - d.min()) / jnp.maximum(d.max() - d.min(), 1e-9)
        return finish(jnp.stack([d] * 3, -1))
    if mode == "alpha":
        return finish(jnp.stack([out["alpha"][0]] * 3, -1))
    img = out["render"].transpose(1, 2, 0)
    if branch == "none":
        return finish(img)
    s, h, w = out["semantics"].shape
    dec = decoder(out["semantics"].reshape(s, -1).T)
    if lut is not None:
        code = jnp.argmax(jax.nn.softmax(dec * 10.0, axis=-1), axis=-1)
        feat = lut[code]
    else:
        feat = dec
    normed = feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
    if branch == "osh":
        sim = jax.nn.sigmoid(
            osh_predict(OSHState(weight=osh_w, bias=osh_b), normed))
        thresh = 0.5
    else:
        sim = ape_similarity(normed, text, log_scale=log_scale)
        thresh = sim_thresh
    sim = jnp.where(sim < thresh, 0.0, sim)
    bg_mask = sim == 0
    # clip_color(thresh=0.7, coloring=True) inlined (jnp throughout)
    if branch == "osh":
        rel = jnp.clip(sim + 0.2, 0.1, 0.9)
    else:
        rel = jnp.clip((sim - 0.7 - 0.05) / (sim.max() - 0.7), 0.0, 1.0)
    heat = turbo_colormap(rel)
    heat = jnp.where(bg_mask[:, None], 1.0, heat)
    heat = jnp.clip(heat.reshape(h, w, 3), 0, 1)
    if branch == "osh":
        alpha = jnp.where(bg_mask, 1.0, 0.0).reshape(h, w, 1)
    else:
        alpha = 1.0
    opa = alpha * 0.4
    return finish(jnp.clip(heat * opa + img * (1 - opa), 0, 1))


class QuerySession:
    def __init__(self, scene: GaussianScene, decoder: SemanticDecoder,
                 lut: Optional[jax.Array],
                 raster_cfg: RasterConfig = RasterConfig(),
                 sim_thresh: float = 0.86,
                 white_background: bool = True):
        self.scene = scene
        self.decoder = decoder
        self.lut = lut
        self.raster_cfg = raster_cfg
        self.sim_thresh = sim_thresh  # ref:gui default clip_feature_thresh
        self.bg = jnp.ones(3) if white_background else jnp.zeros(3)

        self.text_tokens: Optional[jax.Array] = None  # aligned (C,)
        self.log_scale: float = 0.0
        self.osh: Optional[OSHState] = None
        self.res_finetuned = False

        # retrieval state (ref:gui/main.py:1168-1227)
        self.rel_gs_index: Optional[np.ndarray] = None
        self.gs_index: Optional[np.ndarray] = None
        self.motion = np.zeros_like(np.asarray(scene.xyz))

    # ---- text / similarity ----
    def set_text(self, aligned_tokens, log_scale: float = 0.0) -> None:
        """Set the query embedding (output of
        VisionLanguageAlign.text_embedding_align on an offline text
        tower; ref:gui/main.py:105-111)."""
        self.text_tokens = jnp.asarray(aligned_tokens).reshape(-1)
        self.log_scale = log_scale
        self.res_finetuned = False

    def compute_similarity(self, features: jax.Array) -> jax.Array:
        """(pixels-or-gaussians, S) -> similarity with sub-threshold
        values zeroed (ref:gui/main.py:363-385)."""
        dec = self.decoder(features)
        if self.lut is not None:
            code = jnp.argmax(jax.nn.softmax(dec * 10.0, axis=-1),
                              axis=-1)
            feat = self.lut[code]
        else:
            feat = dec
        normed = feat / jnp.maximum(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
        if self.res_finetuned and self.osh is not None:
            sim = jax.nn.sigmoid(osh_predict(self.osh, normed))
            thresh = 0.5
        else:
            if self.text_tokens is None:
                return jnp.zeros(features.shape[0])
            sim = ape_similarity(normed, self.text_tokens,
                                 log_scale=self.log_scale)
            thresh = self.sim_thresh
        return jnp.where(sim < thresh, 0.0, sim)

    # ---- per-frame ----
    def render_view(self, cam: Camera, mode: str = "image",
                    overlay: bool = True,
                    scaling_modifier: float = 1.0,
                    as_u8: bool = False) -> np.ndarray:
        """One viewer frame: render + optional similarity heat overlay
        (ref:gui/main.py:549-604). Returns (H, W, 3) float.

        The whole frame runs as ONE jitted device program
        (_frame_device) — at interactive sizes the previous eager
        composition paid per-op host dispatch (tens of ms/frame)."""
        gmask = None
        if self.gs_index is not None:
            gmask = jnp.asarray(self.gs_index)
        branch = "none"
        text = osh_w = osh_b = None
        if mode == "image" and overlay:
            if self.res_finetuned and self.osh is not None:
                branch = "osh"
                osh_w, osh_b = self.osh.weight, self.osh.bias
            elif self.text_tokens is not None:
                branch = "ape"
                text = self.text_tokens
        img = _frame_device(
            self.scene, cam, self.bg, gmask, self.decoder, self.lut,
            text, osh_w, osh_b, cfg=self.raster_cfg, mode=mode,
            branch=branch, scaling_modifier=float(scaling_modifier),
            sim_thresh=self.sim_thresh,
            log_scale=float(self.log_scale), as_u8=as_u8)
        return np.asarray(img)

    # ---- OSH fine-tune (ref:gui/main.py:1673-1763) ----
    def finetune_with_res(self, cam: Camera, res_mask: np.ndarray,
                          max_epochs: int = 8000):
        out = render(self.scene, cam, self.bg, self.raster_cfg)
        s = out["semantics"].shape[0]
        feats = out["semantics"].reshape(s, -1).T
        dec = self.decoder(feats)
        code = jnp.argmax(jax.nn.softmax(dec * 10.0, axis=-1), axis=-1)
        feat = self.lut[code]
        normed = feat / jnp.maximum(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
        if self.text_tokens is None:
            raise ValueError("set_text first (OSH inits from the text "
                             "embedding, ref:gui/main.py:1678-1680)")
        self.osh = osh_init(self.text_tokens)
        self.osh, iou, epochs = osh_finetune(
            self.osh, normed, jnp.asarray(res_mask.reshape(-1)),
            max_epochs=max_epochs)
        self.res_finetuned = True
        return float(iou), int(epochs)

    # ---- 3D retrieval / editing ----
    def compute_relative_gs_index(self) -> np.ndarray:
        """Per-Gaussian membership of the current query
        (ref:gui/main.py:400-405)."""
        sims = self.compute_similarity(self.scene.get_semantics())
        return np.asarray(sims > 0) & np.asarray(self.scene.valid)

    def retrieve(self) -> np.ndarray:
        self.rel_gs_index = self.compute_relative_gs_index()
        self.motion = np.zeros_like(np.asarray(self.scene.xyz))
        return self.rel_gs_index

    def segment(self) -> None:
        """Show only the retrieved object (ref:gui/main.py:1183-1185)."""
        self.gs_index = self.rel_gs_index

    def delete_view(self) -> None:
        """Hide the retrieved object (ref:gui/main.py:1192-1194)."""
        self.gs_index = ~self.rel_gs_index

    def delete_permanently(self) -> None:
        """Prune matching Gaussians (ref:gui/main.py edit_delete
        :516-524); capacity model clears validity bits."""
        sims = self.compute_similarity(self.scene.get_semantics())
        crop = np.asarray(sims > 0)
        self.scene = self.scene.replace(
            valid=self.scene.valid & jnp.asarray(~crop))

    def move(self, delta) -> None:
        """Translate the retrieved subset (ref:gui/main.py:1418-1496
        object-move keys); accumulated in self.motion for reset."""
        if self.rel_gs_index is None:
            return
        d = np.asarray(delta, np.float32)
        mask = self.rel_gs_index[:, None]
        self.motion = self.motion + mask * d
        self.scene = self.scene.replace(
            xyz=self.scene.xyz + jnp.asarray(mask * d))

    def reset_motion(self) -> None:
        self.scene = self.scene.replace(
            xyz=self.scene.xyz - jnp.asarray(self.motion))
        self.motion = np.zeros_like(self.motion)
        self.gs_index = None

    # ---- instance grouping (ref:gui/main.py:1595-1671) ----
    def group_points(self, cam: Camera, res_mask: np.ndarray,
                     eps: float = 0.35, min_samples: int = 600,
                     ratio_thresh: float = 0.7) -> np.ndarray:
        from sklearn.cluster import DBSCAN

        target = self.rel_gs_index.copy()
        pts = np.asarray(self.scene.xyz)[target]
        clusters = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(
            pts)
        sel_idx = np.where(target)[0]
        keep = np.zeros_like(target)
        for cid in set(clusters):
            if cid == -1:
                continue
            tmp = np.zeros_like(target)
            tmp[sel_idx[clusters == cid]] = True
            out = render(self.scene, cam, self.bg, self.raster_cfg,
                         semantic_masks=jnp.asarray(
                             tmp.astype(np.float32)))
            s = out["semantics"].shape[0]
            sim = self.compute_similarity(
                out["semantics"].reshape(s, -1).T)
            if float(sim.sum()) == 0:
                continue
            sem_mask = np.asarray(sim > 0).reshape(
                cam.height, cam.width)
            if compute_mask_ratio(sem_mask, res_mask) > ratio_thresh:
                keep |= tmp
        self.rel_gs_index = keep
        return keep

    # ---- eval (ref:gui/main.py:1938-2016, gui/main_test.py:628-687) ----
    def render_query_masks(self, cameras: List[Camera], out_dir: str,
                           names: Optional[List[str]] = None) -> list:
        """Render the current query's binary masks for each camera and
        save them as PNGs — the artifact eval_seg.py scores
        (white = match)."""
        import os

        from goi_tpu.utils.image import save_image

        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for i, cam in enumerate(cameras):
            out = render(self.scene, cam, self.bg, self.raster_cfg)
            s = out["semantics"].shape[0]
            sim = self.compute_similarity(
                out["semantics"].reshape(s, -1).T)
            mask = np.asarray(sim > 0).reshape(cam.height, cam.width)
            name = names[i] if names else f"{i:05d}"
            p = os.path.join(out_dir, f"{name}.png")
            save_image(mask.astype(np.float32)[None], p)
            paths.append(p)
        return paths

    def eval_against_gt(self, cameras: List[Camera],
                        gt_masks: List[np.ndarray]) -> dict:
        """mIoU/mPA/mP of the current query against ground-truth masks
        (ref:gui/main_test.py:628-687 eval_epoch)."""
        from goi_tpu.eval.metrics import iou_metrics

        agg = {"iou": [], "mpa": [], "mp": []}
        for cam, gt in zip(cameras, gt_masks):
            out = render(self.scene, cam, self.bg, self.raster_cfg)
            s = out["semantics"].shape[0]
            sim = self.compute_similarity(
                out["semantics"].reshape(s, -1).T)
            pred = np.asarray(sim > 0).reshape(cam.height, cam.width)
            m = iou_metrics(jnp.asarray(pred), jnp.asarray(gt > 0))
            for k in agg:
                agg[k].append(float(m[k]))
        return {k: float(np.mean(v)) for k, v in agg.items()}

    # ---- video (ref:gui/main.py:1766-1821) ----
    def render_path(self, anchor_c2ws: List[np.ndarray],
                    width: int, height: int, fovx: float, fovy: float,
                    steps_per_segment: int = 30,
                    mode: str = "image") -> List[np.ndarray]:
        from goi_tpu.utils.pose import interpolate_poses

        frames = []
        for c2w in interpolate_poses(anchor_c2ws, steps_per_segment):
            w2c = np.linalg.inv(c2w)
            cam = Camera.from_Rt(w2c[:3, :3].T, w2c[:3, 3], fovx, fovy,
                                 width, height)
            frames.append(self.render_view(cam, mode=mode))
        return frames
