"""Checkpoint round-trip for full training states."""

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.raster import RasterConfig
from goi_tpu.semantic.codebook import SemanticDecoder
from goi_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from goi_tpu.train.distill import create_distill_state
from goi_tpu.train.optim import OptimConfig
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 12, tile_cap=256, chunk=32)


def test_distill_state_roundtrip(tmp_path):
    scene = make_random_scene(n=80, seed=0)
    key = jax.random.PRNGKey(0)
    decoder = SemanticDecoder.create(key, dim_in=10, dim_out=8)
    lut = jax.random.normal(key, (8, 16)) * 0.1
    state, train_step = create_distill_state(scene, decoder, lut,
                                             OptimConfig())
    step = jax.jit(train_step, static_argnames=("raster_cfg",))
    cam = make_test_camera(width=32, height=32)
    gt = jax.random.normal(key, (16, 32, 32))
    # advance a few steps so the optimizer state is non-trivial
    for _ in range(3):
        state, _ = step(state, cam, gt, jnp.zeros(3), CFG)

    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = load_checkpoint(path)

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # static metadata survives via the treedef
    assert restored.scene.max_sh_degree == state.scene.max_sh_degree

    # training resumes identically from the restored state
    s1, aux1 = step(state, cam, gt, jnp.zeros(3), CFG)
    s2, aux2 = step(restored, cam, gt, jnp.zeros(3), CFG)
    np.testing.assert_allclose(float(aux1["total"]),
                               float(aux2["total"]), rtol=1e-6)
