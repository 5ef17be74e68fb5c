"""SDS scene-editing loop (the reference's main_edit.py train path).

Re-hosted headless: precompute relative cameras + frozen-Gaussian mask
(ref:gui/main_edit.py:312-395), then batched SDS steps: render each
camera -> inpainting SDS loss on the dilated masks -> backward ->
zero grads of non-target Gaussians -> Adam (ref:gui/main_edit.py:
506-720, clear_noralative_gs_grad :396-432). The whole step is one jit;
grad masking is a tree-map multiply instead of in-place .grad surgery.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.guidance.sds import InpaintSDS, dilate_mask
from goi_tpu.raster import RasterConfig, render
from goi_tpu.train.optim import OptimConfig, make_full_training_optimizer


@dataclasses.dataclass
class RelativeCamera:
    camera: Camera
    mask: np.ndarray            # dilated edit mask (H, W) bool
    mask_nodilated: np.ndarray


class EditSession:
    def __init__(self, scene: GaussianScene, guidance: InpaintSDS,
                 raster_cfg: RasterConfig = RasterConfig(),
                 cfg: Optional[OptimConfig] = None,
                 lambda_sd: float = 10.0,
                 guidance_scale: float = 100.0,
                 max_epochs: int = 40, batch_size: int = 2):
        """Defaults from ref:gui/configs/default.yaml:26-31."""
        self.scene = scene
        self.guidance = guidance
        self.raster_cfg = raster_cfg
        self.lambda_sd = lambda_sd
        self.guidance_scale = guidance_scale
        self.max_epochs = max_epochs
        self.batch_size = batch_size
        self.tx = make_full_training_optimizer(
            cfg or OptimConfig(), spatial_lr_scale=1.0)
        self.opt_state = self.tx.init(scene.params())
        self.grad_mask: Optional[jax.Array] = None
        self.relative_cameras: List[RelativeCamera] = []

    def precompute(self, cameras: List[Camera], similarity_fn,
                   min_relative_ratio: float = 0.1) -> int:
        """Select cameras seeing the edit target; build dilated masks and
        the frozen-Gaussian mask (ref:gui/main_edit.py:312-395)."""
        sims_g = similarity_fn(self.scene.get_semantics())
        self.grad_mask = (jnp.asarray(sims_g) > 0).astype(jnp.float32)

        counts = []
        masks = []
        for cam in cameras:
            out = render(self.scene, cam, jnp.ones(3), self.raster_cfg)
            s = out["semantics"].shape[0]
            sim = similarity_fn(out["semantics"].reshape(s, -1).T)
            m = np.asarray(sim > 0).reshape(cam.height, cam.width)
            counts.append(m.sum())
            masks.append(m)
        max_count = max(counts) if counts else 0
        self.relative_cameras = []
        for cam, m, c in zip(cameras, masks, counts):
            if max_count == 0 or c < min_relative_ratio * max_count:
                continue
            dil = np.asarray(dilate_mask(jnp.asarray(m)))
            self.relative_cameras.append(
                RelativeCamera(camera=cam, mask=dil, mask_nodilated=m))
        return len(self.relative_cameras)

    def _make_step(self):
        guidance = self.guidance
        raster_cfg = self.raster_cfg
        tx = self.tx

        def step(params, opt_state, grad_mask, cams, masks, key,
                 step_ratio, base_scene):
            def loss_fn(params):
                scene = base_scene.with_params(params)

                def render_one(cam):
                    out = render(scene, cam, jnp.ones(3), raster_cfg)
                    return out["render"]

                imgs = jnp.stack([render_one(c) for c in cams])
                loss = guidance.train_step(
                    key, imgs, masks, step_ratio=step_ratio,
                    guidance_scale=self.guidance_scale)
                return loss * self.lambda_sd

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # zero grads outside the edit target
            # (ref:gui/main_edit.py:668-670 -> :396-432)
            grads = jax.tree.map(
                lambda g: g * grad_mask.reshape(
                    (-1,) + (1,) * (g.ndim - 1)), grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step, static_argnames=())

    def train(self, key=None, epochs: Optional[int] = None,
              log_every: int = 5):
        """(ref:gui/main_edit.py:481-504 train/train_epoch)."""
        assert self.relative_cameras, "call precompute() first"
        key = key if key is not None else jax.random.PRNGKey(0)
        epochs = epochs or self.max_epochs
        step = self._make_step()
        params = self.scene.params()
        rng = np.random.default_rng(0)
        n = len(self.relative_cameras)
        total_steps = epochs * max(1, n // self.batch_size)
        it = 0
        for ep in range(epochs):
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                batch = [self.relative_cameras[j]
                         for j in order[i:i + self.batch_size]]
                cams = tuple(b.camera for b in batch)
                masks = jnp.asarray(np.stack(
                    [b.mask[None] for b in batch])).astype(jnp.float32)
                key, sub = jax.random.split(key)
                it += 1
                params, self.opt_state, loss = step(
                    params, self.opt_state, self.grad_mask, cams, masks,
                    sub, it / total_steps, self.scene)
            if (ep + 1) % log_every == 0:
                print(f"edit epoch {ep + 1}/{epochs} "
                      f"loss {float(loss):.5f}")
        self.scene = self.scene.with_params(params)
        return self.scene
