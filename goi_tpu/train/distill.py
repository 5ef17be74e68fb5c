"""Semantic-field distillation training (the reference's core entry).

TPU re-design of ref:train.py:59-203: one jit-ed train step renders a
camera, decodes the semantic map, applies the 4-term codebook loss, and
updates three parameter groups (Gaussian semantics / decoder MLP / LUT)
with optax — all fused into a single XLA program per step instead of the
reference's per-op kernel launches. The k-means codebook init is
goi_tpu/semantic/codebook.py:init_codebook (ref:train.py:79-87).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.raster import RasterConfig, render
from goi_tpu.semantic.codebook import SemanticDecoder
from goi_tpu.semantic.losses import distillation_loss
from goi_tpu.train.optim import OptimConfig, make_scene_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistillState:
    scene: GaussianScene
    decoder: SemanticDecoder
    lut: jax.Array
    opt_scene: optax.OptState
    opt_decoder: optax.OptState
    opt_lut: optax.OptState
    step: jax.Array


def create_distill_state(
    scene: GaussianScene,
    decoder: SemanticDecoder,
    lut: jax.Array,
    cfg: OptimConfig,
    spatial_lr_scale: float = 1.0,
) -> Tuple[DistillState, Callable]:
    """Build state + the jit-able step function.

    Optimizers mirror ref:train.py:63-67: Adam(3e-3) on the MLP,
    Adam(1e-3) on the LUT, per-attribute Adam on the scene (only
    `semantics` by default)."""
    scene_tx = make_scene_optimizer(cfg, spatial_lr_scale)
    dec_tx = optax.adam(3e-3)
    lut_tx = optax.adam(1e-3)

    state = DistillState(
        scene=scene,
        decoder=decoder,
        lut=lut,
        opt_scene=scene_tx.init(scene.params()),
        opt_decoder=dec_tx.init(decoder),
        opt_lut=lut_tx.init(lut),
        step=jnp.int32(0),
    )

    def train_step(state: DistillState, cam: Camera, gt_features: jax.Array,
                   bg: jax.Array, raster_cfg: RasterConfig
                   ) -> Tuple[DistillState, Dict[str, jax.Array]]:
        """gt_features: (C, H, W) APE feature map for this camera."""

        def loss_fn(params, decoder, lut):
            out = render(state.scene.with_params(params), cam, bg,
                         raster_cfg)
            s, h, w = out["semantics"].shape
            sem_flat = out["semantics"].reshape(s, h * w).T
            gt_flat = gt_features.reshape(gt_features.shape[0], -1).T
            anneal_t = jnp.where(state.step < 1000, 1.0, 2.0)
            loss, aux = distillation_loss(decoder, lut, sem_flat,
                                          gt_flat, anneal_t)
            return loss, dict(aux, num_slots=out["num_slots"],
                              num_instances=out["num_instances"])

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.scene.params(), state.decoder, state.lut)
        g_scene, g_dec, g_lut = grads

        upd_s, opt_s = scene_tx.update(g_scene, state.opt_scene,
                                       state.scene.params())
        upd_d, opt_d = dec_tx.update(g_dec, state.opt_decoder)
        upd_l, opt_l = lut_tx.update(g_lut, state.opt_lut)
        new = DistillState(
            scene=state.scene.with_params(
                optax.apply_updates(state.scene.params(), upd_s)),
            decoder=optax.apply_updates(state.decoder, upd_d),
            lut=state.lut + upd_l,
            opt_scene=opt_s, opt_decoder=opt_d, opt_lut=opt_l,
            step=state.step + 1,
        )
        return new, aux

    return state, train_step


def train_distillation(
    scene: GaussianScene,
    cameras,                      # list[Camera]
    feature_maps,                 # list[np.ndarray (C,H,W)] (host RAM)
    *,
    tab_len: int = 300,
    ape_dim: int = 256,
    iterations: int = 1500,
    cfg: Optional[OptimConfig] = None,
    raster_cfg: Optional[RasterConfig] = None,
    white_background: bool = False,
    seed: int = 0,
    log_every: int = 100,
    callback=None,
    tb_log_dir: Optional[str] = None,
    spatial_lr_scale: float = 1.0,
):
    """Host-side driver (ref:train.py:96-202): random camera order per
    epoch, per-camera feature upload, periodic logging. Returns the final
    DistillState."""
    from goi_tpu.semantic.codebook import init_codebook

    cfg = cfg or OptimConfig(iterations=iterations)
    raster_cfg = raster_cfg or RasterConfig()
    key = jax.random.PRNGKey(seed)

    key, sub = jax.random.split(key)
    t0 = time.time()
    lut = init_codebook(sub, feature_maps, tab_len=tab_len)
    print(f"Kmeans time: {time.time() - t0:.2f}s")

    key, sub = jax.random.split(key)
    decoder = SemanticDecoder.create(
        sub, dim_in=scene.sem_dim, dim_out=tab_len, num_layer=1,
        use_bias=True)

    state, train_step = create_distill_state(
        scene, decoder, lut, cfg, spatial_lr_scale=spatial_lr_scale)
    step_jit = jax.jit(train_step, static_argnames=("raster_cfg",))

    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    rng = np.random.default_rng(seed)
    stack: list = []
    ema = 0.0
    tb = None
    if tb_log_dir:
        from goi_tpu.utils.logging import TensorBoardLogger
        tb = TensorBoardLogger(tb_log_dir)
    from goi_tpu.utils.profiling import StepTimer
    timer = StepTimer()
    for it in range(1, iterations + 1):
        if not stack:
            stack = list(rng.permutation(len(cameras)))
        ci = int(stack.pop())
        gt = jnp.asarray(feature_maps[ci])
        with timer:
            state, aux = step_jit(state, cameras[ci], gt, bg,
                                  raster_cfg)
        if tb is not None and it % 10 == 0:
            # (ref:train.py:230-233 total_loss / iter_time scalars)
            tb.scalar("train_loss_patches/total_loss",
                      float(aux["total"]), it)
            tb.scalar("iter_time", timer.ms, it)
        if it % log_every == 1 or it == iterations:
            slots = int(aux["num_slots"])
            ninst = int(aux["num_instances"])
            binned_cap = raster_cfg.max_binned or raster_cfg.max_instances
            if slots > binned_cap or ninst > raster_cfg.max_instances:
                from goi_tpu.train.rgb import _rebudget
                raster_cfg = _rebudget(raster_cfg, slots, ninst)
            loss = float(aux["total"])
            ema = 0.4 * loss + 0.6 * (ema or loss)
            print(f"iter {it}, sem_loss: {loss:.6f} "
                  f"(lab {float(aux['lab']):.4f} sl {float(aux['sl']):.4f} "
                  f"sl1 {float(aux['sl1']):.4f} "
                  f"recc {float(aux['recc']):.4f})")
        if callback is not None:
            callback(it, state, aux)
    if tb is not None:
        tb.close()
    return state
