"""End-to-end mini training: semantic distillation on a synthetic scene.

The SURVEY §4 'mini train loop to fixed loss' test: random Gaussians,
synthetic two-cluster APE feature maps; after a few dozen steps the
4-term loss must drop substantially and the rendered semantic field must
become separable by the codebook decode path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.raster import RasterConfig, render
from goi_tpu.semantic.codebook import SemanticDecoder
from goi_tpu.train.distill import create_distill_state
from goi_tpu.train.optim import OptimConfig
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 13, tile_cap=256, chunk=32)


def test_distillation_loss_decreases():
    scene = make_random_scene(n=200, seed=11, sem_dim=10)
    # zero semantic init like the reference's fresh field
    scene = scene.replace(semantics=jnp.zeros_like(scene.semantics))
    cam = make_test_camera(width=32, height=32)

    key = jax.random.PRNGKey(0)
    ape_dim, K = 32, 8
    # synthetic "APE" map: left half cluster A, right half cluster B
    protos = jax.random.normal(key, (2, ape_dim))
    col_is_left = (jnp.arange(32) < 16)[None, None, :]      # (1,1,W)
    gt = jnp.where(col_is_left, protos[0][:, None, None],
                   protos[1][:, None, None])                # (C,H,W)
    gt = jnp.broadcast_to(gt, (ape_dim, 32, 32))

    decoder = SemanticDecoder.create(key, dim_in=10, dim_out=K)
    lut = jax.random.normal(key, (K, ape_dim)) * 0.1
    ocfg = OptimConfig(semantic_finetune=True)
    state, train_step = create_distill_state(scene, decoder, lut, ocfg)
    step = jax.jit(train_step, static_argnames=("raster_cfg",))

    bg = jnp.zeros(3)
    losses = []
    for _ in range(60):
        state, aux = step(state, cam, gt, bg, CFG)
        losses.append(float(aux["total"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    # semantics actually moved
    assert float(jnp.abs(state.scene.semantics).max()) > 1e-3
    # decoder/lut moved too
    assert float(jnp.abs(state.lut - lut).max()) > 1e-4


def test_optimizer_respects_finetune_flags():
    scene = make_random_scene(n=100, seed=12)
    cam = make_test_camera(width=32, height=32)
    key = jax.random.PRNGKey(1)
    decoder = SemanticDecoder.create(key, dim_in=10, dim_out=8)
    lut = jax.random.normal(key, (8, 16)) * 0.1
    gt = jax.random.normal(key, (16, 32, 32))

    ocfg = OptimConfig(semantic_finetune=True)  # default: only semantics
    state, train_step = create_distill_state(scene, decoder, lut, ocfg)
    step = jax.jit(train_step, static_argnames=("raster_cfg",))
    state2, _ = step(state, cam, gt, jnp.zeros(3), CFG)

    np.testing.assert_array_equal(np.asarray(state2.scene.xyz),
                                  np.asarray(scene.xyz))
    np.testing.assert_array_equal(np.asarray(state2.scene.opacity),
                                  np.asarray(scene.opacity))
    assert not np.array_equal(np.asarray(state2.scene.semantics),
                              np.asarray(scene.semantics))
