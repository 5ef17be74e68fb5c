"""RGB training loop + densification + kNN init tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.eval.metrics import psnr
from goi_tpu.knn.knn import mean_knn_dist2
from goi_tpu.raster import RasterConfig, render
from goi_tpu.train.densify import DensifyStats, densify_and_prune
from goi_tpu.train.optim import OptimConfig
from goi_tpu.train.rgb import create_rgb_trainer
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 13, tile_cap=256, chunk=32)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
    d2 = np.asarray(mean_knn_dist2(jnp.asarray(pts)))
    # brute force incl. self (reference quirk): mean of 3 smallest
    full = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    expect = np.sort(full, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(d2, expect, rtol=1e-4, atol=1e-6)


def test_knn_large_window_path():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (6000, 3)).astype(np.float32)
    d2 = np.asarray(mean_knn_dist2(jnp.asarray(pts), chunk=1024))
    full = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    expect = np.sort(full, axis=1)[:, :3].mean(1)
    # Morton-window search is approximate (like the reference's
    # box-pruned search); it only ever over-estimates, the bulk must be
    # exact and the tail error small (it seeds log-scale init only)
    rel = (d2 - expect) / np.maximum(expect, 1e-9)
    assert np.all(rel > -1e-5)            # never underestimates
    assert np.mean(rel < 1e-4) > 0.85, np.mean(rel < 1e-4)
    assert np.quantile(rel, 0.95) < 0.5
    assert np.mean(rel) < 0.10


def test_densify_clone_split_prune():
    scene = make_random_scene(n=100, seed=0, capacity=300)
    cap = scene.capacity
    tx_state = {"mu": jnp.ones((cap, 3)), "nu": jnp.ones((cap, 3))}
    stats = DensifyStats(
        xyz_grad_accum=jnp.where(jnp.arange(cap) < 50, 1.0, 0.0),
        denom=jnp.ones((cap,)),
        max_radii=jnp.zeros((cap,), jnp.int32))
    # make first 25 small (clone) and next 25 big (split)
    scaling = np.asarray(scene.scaling).copy()
    scaling[:25] = -8.0   # tiny -> clone
    scaling[25:50] = 1.0  # huge -> split
    scene = scene.replace(scaling=jnp.asarray(scaling))

    new_scene, new_opt, new_stats, info = densify_and_prune(
        scene, tx_state, stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=1e-9, extent=1.0,
        percent_dense=0.01)
    assert int(info["n_clone"]) == 25
    assert int(info["n_split"]) == 25
    # 100 valid + 25 clones + 50 children - 25 split parents = 150
    assert int(info["n_valid"]) == 150
    assert int(info["overflow"]) == 0
    # moments of new rows zeroed, old rows untouched
    mu = np.asarray(new_opt["mu"])
    assert mu[:100].sum() == 300.0  # 100 rows x 3 ones
    written = np.asarray(new_scene.valid) & ~np.concatenate(
        [np.ones(100, bool), np.zeros(cap - 100, bool)])
    assert np.all(mu[written] == 0.0)


def test_rgb_training_improves_psnr():
    """Fit a fresh scene to views rendered from a target scene."""
    target = make_random_scene(n=150, seed=4)
    cams = [make_test_camera(width=48, height=48, angle=a)
            for a in (0.0, 0.5, -0.5)]
    bg = jnp.zeros(3)
    gts = [render(target, c, bg, CFG)["render"] for c in cams]

    start = make_random_scene(n=150, seed=99, capacity=200)
    ocfg = OptimConfig(
        position_lr_init=0.002, position_lr_final=0.0002,
        feature_lr=0.02, opacity_lr=0.05, scaling_lr=0.01,
        rotation_lr=0.005, lambda_dssim=0.2)
    init_fn, step_fn, densify_fn = create_rgb_trainer(ocfg, CFG)
    state = init_fn(start)
    step = jax.jit(step_fn)

    p0 = float(psnr(render(start, cams[0], bg, CFG)["render"], gts[0]))
    rng = np.random.default_rng(0)
    for it in range(150):
        ci = int(rng.integers(0, len(cams)))
        state, aux = step(state, cams[ci], gts[ci], bg)
    p1 = float(psnr(render(state.scene, cams[0], bg, CFG)["render"],
                    gts[0]))
    assert p1 > p0 + 1.5, (p0, p1)

    # densify must run end-to-end on the trained state
    state2, info = densify_fn(state, jax.random.PRNGKey(1), extent=1.0)
    assert int(info["n_valid"]) >= 1
    out = render(state2.scene, cams[0], bg, CFG)
    assert np.isfinite(np.asarray(out["render"])).all()


def test_rgb_psnr_bar():
    """HARD quality bar (VERDICT.md round-2 item 1): the training loop
    must reach >= 25 dB fitting a small scene — a regression gate on
    the full optimizer/render/schedule stack. The full-scale recipe
    (examples/tune_rgb.py E1_sched: 32 views, 7k iters, pos-LR decay
    over the run, densify until 0.65, opacity reset 3000) measured
    28.13 dB held-out on TPU, reference-class 3DGS quality
    (ref:train.py:96-202)."""
    target = make_random_scene(n=120, seed=7)
    cams = [make_test_camera(width=48, height=48, angle=a)
            for a in (0.0, 0.35)]
    bg = jnp.zeros(3)
    gts = [render(target, c, bg, CFG)["render"] for c in cams]

    start = make_random_scene(n=150, seed=21, capacity=200)
    ocfg = OptimConfig(
        position_lr_init=0.002, position_lr_final=0.0001,
        position_lr_max_steps=700,
        feature_lr=0.02, opacity_lr=0.05, scaling_lr=0.01,
        rotation_lr=0.005, lambda_dssim=0.2)
    init_fn, step_fn, _ = create_rgb_trainer(ocfg, CFG)
    state = init_fn(start)
    step = jax.jit(step_fn)
    rng = np.random.default_rng(0)
    for _ in range(700):
        ci = int(rng.integers(0, len(cams)))
        state, _ = step(state, cams[ci], gts[ci], bg)
    vals = [float(psnr(render(state.scene, c, bg, CFG)["render"], g))
            for c, g in zip(cams, gts)]
    assert float(np.mean(vals)) >= 25.0, vals
