"""From-scratch RGB 3DGS training (the upstream-Inria loop the reference
builds on; ref:scene/gaussian_model.py:163-182 optimizers and the
standard (1-l)*L1 + l*(1-SSIM) photometric objective kept in
ref:train.py:137-140 as the commented baseline, lambda_dssim
ref:arguments/__init__.py:77).

One jit per step: render -> loss -> grads (including the screenspace
mean2d gradient used for densification stats) -> per-attribute Adam.
Densify/prune runs every `densification_interval` iterations as a
separate jit (static shapes, see train/densify.py); SH degree steps up
every 1000 iters (ref:train.py:117-119)."""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.eval.metrics import l1_loss, ssim
from goi_tpu.raster import RasterConfig, render
from goi_tpu.train.densify import (DensifyStats, add_stats,
                                   densify_and_prune, grow_capacity,
                                   reset_opacity)
from goi_tpu.train.optim import OptimConfig, make_full_training_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RGBTrainState:
    scene: GaussianScene
    opt_state: optax.OptState
    stats: DensifyStats
    step: jax.Array


def create_rgb_trainer(cfg: OptimConfig, raster_cfg: RasterConfig,
                       spatial_lr_scale: float = 1.0):
    # the reference scales the xyz schedule by the camera extent
    # (ref:scene/gaussian_model.py:169,179-182)
    """Returns (init_fn, step_fn, densify_fn)."""
    tx = make_full_training_optimizer(cfg, spatial_lr_scale)

    def init_fn(scene: GaussianScene) -> RGBTrainState:
        return RGBTrainState(
            scene=scene, opt_state=tx.init(scene.params()),
            stats=DensifyStats.create(scene.capacity),
            step=jnp.int32(0))

    def step_fn(state: RGBTrainState, cam: Camera, gt_image: jax.Array,
                bg: jax.Array) -> Tuple[RGBTrainState, dict]:
        offset0 = jnp.zeros_like(state.scene.xyz[:, :2])

        def loss_fn(params, mean2d_offset):
            out = render(state.scene.with_params(params), cam, bg,
                         raster_cfg, mean2d_offset=mean2d_offset)
            img = out["render"]
            ll1 = l1_loss(img, gt_image)
            s = ssim(img, gt_image)
            loss = (1.0 - cfg.lambda_dssim) * ll1 \
                + cfg.lambda_dssim * (1.0 - s)
            return loss, (out["radii"], ll1, out["num_slots"],
                          out["num_instances"])

        (loss, (radii, ll1, num_slots, num_inst)), (g_params, g_mean2d) = \
            jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.scene.params(), offset0)

        # gnorm is reported on the RAW grads (a NaN here means a bug in
        # the render backward); the applied grads are sanitized so one
        # degenerate sample can never permanently poison Adam moments.
        gnorm = optax.global_norm(g_params)
        g_params = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), g_params)
        updates, opt_state = tx.update(g_params, state.opt_state,
                                       state.scene.params())
        scene = state.scene.with_params(
            optax.apply_updates(state.scene.params(), updates))
        stats = add_stats(state.stats, g_mean2d, radii,
                          cam.width, cam.height)
        new = RGBTrainState(scene=scene, opt_state=opt_state,
                            stats=stats, step=state.step + 1)
        return new, {"loss": loss, "l1": ll1, "radii_max": radii.max(),
                     "num_slots": num_slots, "num_instances": num_inst,
                     "gnorm": gnorm}

    def densify_fn(state: RGBTrainState, key, extent: float,
                   max_screen_size: int = 0) -> Tuple[RGBTrainState, dict]:
        scene, opt_state, stats, info = densify_and_prune(
            state.scene, state.opt_state, state.stats, key,
            grad_threshold=cfg.densify_grad_threshold,
            min_opacity=0.005, extent=extent,
            percent_dense=cfg.percent_dense,
            max_screen_size=max_screen_size)
        return dataclasses.replace(state, scene=scene,
                                   opt_state=opt_state, stats=stats), info

    return init_fn, step_fn, densify_fn


def _rebudget(raster_cfg: RasterConfig, slots: int, ninst: int,
              final: bool = False) -> RasterConfig:
    """Grow whichever budget overflowed (1.5x headroom, quantum-rounded).

    slots = aligned post-cull demand (vs max_binned, or max_instances
    when coupled); ninst = raw rect expansion demand (vs
    max_instances). Silently truncating either collapses training
    (observed: clean 7k-iter run diverged at ~iter 4700 exactly when
    num_slots crossed the budget)."""
    from goi_tpu.raster.render import BUDGET_QUANTUM as _q

    def fit(x):
        return (int(x * 1.5) + _q - 1) // _q * _q

    binned_cap = raster_cfg.max_binned or raster_cfg.max_instances
    tag = "final-step budget overflow" if final \
        else "instance budget overflow"
    if raster_cfg.max_binned is None:
        # coupled mode: num_slots already folds in the raw demand
        new_mi = fit(max(slots, ninst, raster_cfg.max_instances))
        print(f"[goi_tpu] {tag} (demand {max(slots, ninst)}/"
              f"{raster_cfg.max_instances}); rebudgeting to {new_mi} "
              f"(re-jit)")
        return dataclasses.replace(raster_cfg, max_instances=new_mi)
    new_mi = fit(ninst) if ninst > raster_cfg.max_instances \
        else raster_cfg.max_instances
    new_mb = fit(slots) if slots > binned_cap else binned_cap
    print(f"[goi_tpu] {tag} (aligned {slots}/{binned_cap}, raw "
          f"{ninst}/{raster_cfg.max_instances}); rebudgeting to "
          f"{new_mi}/{new_mb} (re-jit)")
    return dataclasses.replace(raster_cfg, max_instances=new_mi,
                               max_binned=new_mb)


def train_rgb(
    scene: GaussianScene,
    cameras: List[Camera],
    images,                        # list of (3, H, W) arrays
    *,
    cfg: Optional[OptimConfig] = None,
    raster_cfg: Optional[RasterConfig] = None,
    iterations: int = 7000,
    scene_extent: float = 1.0,
    white_background: bool = False,
    seed: int = 0,
    log_every: int = 200,
    callback: Optional[Callable] = None,
    return_raster_cfg: bool = False,
):
    """Host driver mirroring the upstream loop: random camera order,
    SH warmup, densify every interval inside [densify_from_iter,
    densify_until_iter], opacity reset every opacity_reset_interval.

    With ``return_raster_cfg=True`` returns ``(state, raster_cfg)``
    where ``raster_cfg`` reflects any in-loop instance-budget rebudget
    — final eval renders MUST use it (a stale pre-rebudget budget
    silently truncates the deepest instances and depresses PSNR)."""
    cfg = cfg or OptimConfig(iterations=iterations)
    raster_cfg = raster_cfg or RasterConfig()
    init_fn, step_fn, densify_fn = create_rgb_trainer(
        cfg, raster_cfg, spatial_lr_scale=scene_extent)

    state = init_fn(scene)
    step_jit = jax.jit(step_fn)
    reset_jit = jax.jit(reset_opacity)
    key = jax.random.PRNGKey(seed)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)

    rng = np.random.default_rng(seed)
    stack: list = []
    pending_slots = None     # device scalar from the PREVIOUS step
    for it in range(1, iterations + 1):
        if it % 1000 == 0:
            state = dataclasses.replace(
                state, scene=state.scene.one_up_sh_degree())
        if not stack:
            stack = list(rng.permutation(len(cameras)))
        ci = int(stack.pop())
        state, aux = step_jit(state, cameras[ci],
                              jnp.asarray(images[ci]), bg)
        if cfg.densify_from_iter < it <= cfg.densify_until_iter \
                and it % cfg.densification_interval == 0:
            key, sub = jax.random.split(key)
            mss = 20 if it > cfg.opacity_reset_interval else 0
            state, dinfo = densify_fn(state, sub, scene_extent, mss)
            # ---- overflow hardening (a densifying scene can quietly
            # outgrow both the Gaussian capacity and the instance
            # budget; detect and re-budget instead of degrading) ----
            if int(dinfo["overflow"]) > 0:
                new_cap = max(int(state.scene.capacity * 1.5),
                              state.scene.capacity + 1024)
                print(f"[goi_tpu] densify overflow "
                      f"({int(dinfo['overflow'])} dropped); growing "
                      f"capacity {state.scene.capacity} -> {new_cap} "
                      f"(re-jit)")
                sc, op, st = grow_capacity(
                    state.scene, state.opt_state, state.stats, new_cap)
                state = RGBTrainState(scene=sc, opt_state=op, stats=st,
                                      step=state.step)
        # ---- instance-budget hardening, EVERY iteration: scales keep
        # growing after densification ends, so the aligned demand can
        # cross the budget at any point in training; past the budget
        # instances are silently truncated and the loss collapses
        # (observed: clean 7k-iter run diverged at ~iter 4700 exactly
        # when num_slots crossed max_instances). The check reads the
        # PREVIOUS step's counter: int() on the just-dispatched step
        # would block the host every iteration and defeat JAX's async
        # pipelining, while one step of slack costs at most one
        # truncated step before the rebudget fires. ----
        prev_slots, pending_slots = pending_slots, (
            aux["num_slots"], aux["num_instances"])
        slots, ninst = ((int(prev_slots[0]), int(prev_slots[1]))
                        if prev_slots is not None else (0, 0))
        binned_cap = raster_cfg.max_binned or raster_cfg.max_instances
        if slots > binned_cap or ninst > raster_cfg.max_instances:
            raster_cfg = _rebudget(raster_cfg, slots, ninst)
            _, step_fn, densify_fn = create_rgb_trainer(
                cfg, raster_cfg, spatial_lr_scale=scene_extent)
            step_jit = jax.jit(step_fn)
        if it % cfg.opacity_reset_interval == 0:
            new_scene, new_opt = reset_jit(state.scene, state.opt_state)
            state = dataclasses.replace(state, scene=new_scene,
                                        opt_state=new_opt)
        if it % log_every == 0:
            print(f"iter {it}: loss {float(aux['loss']):.5f} "
                  f"l1 {float(aux['l1']):.5f} "
                  f"n_valid {int(state.scene.num_valid)} "
                  f"slots {slots} radii_max {int(aux['radii_max'])}",
                  flush=True)
        if callback is not None:
            callback(it, state, aux)
    # the slack check above never sees the LAST step's counter; fold it
    # in so the returned raster_cfg is valid for final eval renders
    if pending_slots is not None:
        slots, ninst = int(pending_slots[0]), int(pending_slots[1])
        binned_cap = raster_cfg.max_binned or raster_cfg.max_instances
        if slots > binned_cap or ninst > raster_cfg.max_instances:
            raster_cfg = _rebudget(raster_cfg, slots, ninst, final=True)
    if return_raster_cfg:
        return state, raster_cfg
    return state
