"""Per-attribute optimizers for the Gaussian scene, in optax.

Reference semantics (ref:scene/gaussian_model.py:163-244, train.py:63-67):
one Adam (eps=1e-15) with a parameter group per attribute, an exponential
log-lerp schedule on xyz, and per-attribute finetune toggles (GOI's
semantic distillation trains only `semantics` by default,
ref:arguments/__init__.py:85-90). Here each GaussianScene leaf gets its
own optax chain via `optax.multi_transform` over the pytree.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np
import optax

from goi_tpu.core.scene import GaussianScene


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Mirrors OptimizationParams (ref:arguments/__init__.py:64-91)."""

    iterations: int = 1500
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    semantic_lr: float = 0.005
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15000
    densify_grad_threshold: float = 0.0002
    # finetune toggles (GOI defaults: only semantics)
    position_finetune: bool = False
    feature_finetune: bool = False
    opacity_finetune: bool = False
    scaling_finetune: bool = False
    rotation_finetune: bool = False
    semantic_finetune: bool = True


def expon_lr_schedule(lr_init, lr_final, max_steps, lr_delay_steps=0,
                      lr_delay_mult=1.0):
    """Log-linear interpolation with optional delayed warmup, matching
    get_expon_lr_func (ref:utils/general_utils.py:98-121)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return schedule


def make_scene_optimizer(cfg: OptimConfig, spatial_lr_scale: float):
    """Returns an optax GradientTransformation over the scene params dict
    (GaussianScene.params()).

    Attributes with finetune=False get `optax.set_to_zero` (the analog of
    requires_grad_(False) + not adding the param group,
    ref:scene/gaussian_model.py:184-244)."""

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    xyz_sched = expon_lr_schedule(
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        cfg.position_lr_max_steps,
        lr_delay_mult=cfg.position_lr_delay_mult)

    txs = {
        "xyz": adam(xyz_sched) if cfg.position_finetune
        else optax.set_to_zero(),
        "features_dc": adam(cfg.feature_lr) if cfg.feature_finetune
        else optax.set_to_zero(),
        "features_rest": adam(cfg.feature_lr / 20.0) if cfg.feature_finetune
        else optax.set_to_zero(),
        "semantics": adam(cfg.semantic_lr) if cfg.semantic_finetune
        else optax.set_to_zero(),
        "opacity": adam(cfg.opacity_lr) if cfg.opacity_finetune
        else optax.set_to_zero(),
        "scaling": adam(cfg.scaling_lr) if cfg.scaling_finetune
        else optax.set_to_zero(),
        "rotation": adam(cfg.rotation_lr) if cfg.rotation_finetune
        else optax.set_to_zero(),
    }

    def label_fn(params: dict):
        return {k: k for k in params}

    return optax.multi_transform(txs, label_fn)


def make_full_training_optimizer(cfg: OptimConfig, spatial_lr_scale: float):
    """All-attribute optimizer for from-scratch RGB 3DGS training
    (training_setup, ref:scene/gaussian_model.py:163-182)."""
    full = dataclasses.replace(
        cfg, position_finetune=True, feature_finetune=True,
        opacity_finetune=True, scaling_finetune=True,
        rotation_finetune=True, semantic_finetune=True)
    return make_scene_optimizer(full, spatial_lr_scale)
