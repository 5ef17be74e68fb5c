"""Sharded training step: camera-batch DP x Gaussian-parameter sharding.

The step is a single jit whose input shardings drive GSPMD: the scene
params arrive sharded over 'model' (set up by shard_scene), the camera
batch + feature maps arrive sharded over 'data' (shard_batch), and XLA
inserts the all-gather of splat parameters for the blend plus the
reduce-scatter/psum of parameter gradients over ICI — the TPU-native
replacement for the reference's nonexistent multi-GPU path
(SURVEY.md §2.3, §5 'Distributed communication backend').
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from goi_tpu.core.camera import Camera
from goi_tpu.raster import RasterConfig, render
from goi_tpu.semantic.losses import distillation_loss
from goi_tpu.train.distill import DistillState
from goi_tpu.train.optim import OptimConfig, make_scene_optimizer


def stack_cameras(cams) -> Camera:
    """list[Camera] -> batched Camera pytree (leading batch dim on array
    leaves; static width/height must agree)."""
    assert len({(c.width, c.height) for c in cams}) == 1
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def shard_batch(mesh, batched_cams: Camera, gt_feats: jax.Array):
    """Place a camera batch + feature maps with batch-axis 'data'
    sharding."""
    dp = NamedSharding(mesh, P("data"))
    cams = jax.tree.map(lambda x: jax.device_put(x, dp), batched_cams)
    gts = jax.device_put(gt_feats, dp)
    return cams, gts


def make_sharded_distill_step(
    cfg: OptimConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float = 1.0,
):
    """Returns (init_fn, step_fn).

    init_fn(scene, decoder, lut) -> DistillState (opt states inherit the
    params' shardings).
    step_fn(state, cams, gts, bg) -> (state, aux); jit-able; cams/gts are
    batched (stack_cameras / (B, C, H, W)).
    """
    scene_tx = make_scene_optimizer(cfg, spatial_lr_scale)
    dec_tx = optax.adam(3e-3)
    lut_tx = optax.adam(1e-3)

    def init_fn(scene, decoder, lut) -> DistillState:
        return DistillState(
            scene=scene, decoder=decoder, lut=lut,
            opt_scene=scene_tx.init(scene.params()),
            opt_decoder=dec_tx.init(decoder),
            opt_lut=lut_tx.init(lut),
            step=jnp.int32(0),
        )

    def step_fn(state: DistillState, cams: Camera, gts: jax.Array,
                bg: jax.Array) -> Tuple[DistillState, dict]:

        def loss_fn(params, decoder, lut):
            scene = state.scene.with_params(params)
            anneal_t = jnp.where(state.step < 1000, 1.0, 2.0)

            def one(cam, gt):
                out = render(scene, cam, bg, raster_cfg)
                s = out["semantics"]
                sem_flat = s.reshape(s.shape[0], -1).T
                gt_flat = gt.reshape(gt.shape[0], -1).T
                total, aux = distillation_loss(decoder, lut, sem_flat,
                                               gt_flat, anneal_t)
                return total, aux

            totals, auxs = jax.vmap(one)(cams, gts)
            return jnp.mean(totals), jax.tree.map(jnp.mean, auxs)

        (_, aux), grads = jax.value_and_grad(
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

    return init_fn, step_fn
