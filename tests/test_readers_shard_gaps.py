"""Round-1 test gaps (VERDICT item 9): ScanNet reader + DP distill step."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import make_random_scene


def _write_scannet(tmp_path):
    scene_id = "scene0042_00"
    root = os.path.join(tmp_path, scene_id)
    os.makedirs(os.path.join(root, "image", "pose"))
    os.makedirs(os.path.join(root, "image", "color"))
    os.makedirs(os.path.join(root, "clip_feat"))
    w, h, fx, fy = 64, 48, 70.0, 65.0
    n_frames = 33
    with open(os.path.join(root, scene_id + ".txt"), "w") as f:
        f.write(f"colorWidth = {w}\ncolorHeight = {h}\n"
                f"fx_color = {fx}\nfy_color = {fy}\n"
                f"numColorFrames = {n_frames}\nother = junk\n")
    import imageio.v2 as imageio
    import torch
    rng = np.random.default_rng(0)
    for i in range(0, n_frames, 8):
        if i == 16:  # invalid pose must be skipped
            c2w = np.full((4, 4), np.inf)
        else:
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(0, 1, 3)
        np.savetxt(os.path.join(root, f"image/pose/{i}.txt"), c2w)
        imageio.imwrite(os.path.join(root, f"image/color/{i}.jpg"),
                        rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        torch.save(torch.zeros(8, 6, 8),
                   os.path.join(root, f"clip_feat/{i}.pt"))
    # point cloud
    from goi_tpu.core.ply import write_ply
    pts = rng.normal(0, 1, (50, 3)).astype(np.float32)
    write_ply(os.path.join(root, scene_id + "_vh_clean_2.ply"), {
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "red": np.full(50, 100, np.uint8),
        "green": np.full(50, 150, np.uint8),
        "blue": np.full(50, 200, np.uint8)})
    return root, w, h, fx


def test_scannet_reader(tmp_path):
    from goi_tpu.data.readers import load_scene_info, read_scannet_scene

    root, w, h, fx = _write_scannet(tmp_path)
    info = read_scannet_scene(root)
    # frames 0, 8, 24, 32 (16 skipped: inf pose)
    assert [c.uid for c in info.train_cameras] == [0, 24, 32, 8]  # name-sorted
    assert {c.uid for c in info.train_cameras} == {0, 8, 24, 32}
    c0 = info.train_cameras[0]
    assert (c0.width, c0.height) == (w, h)
    assert abs(w / (2 * np.tan(c0.fovx / 2)) - fx) < 1e-4
    assert info.point_cloud["points"].shape == (50, 3)
    assert os.path.exists(c0.semantic_path)

    # dispatch: no sparse/, no transforms_train.json -> ScanNet
    info2 = load_scene_info(root)
    assert len(info2.train_cameras) == 4

    # eval split
    info3 = read_scannet_scene(root, eval_split=True, llffhold=2)
    assert len(info3.test_cameras) == 2


def test_sharded_distill_step():
    """make_sharded_distill_step on the 2x4 virtual mesh: loss drops and
    the scene semantics update only (GOI finetune default)."""
    from goi_tpu.dist.mesh import make_mesh, shard_scene
    from goi_tpu.dist.shard import (make_sharded_distill_step,
                                    shard_batch, stack_cameras)
    from goi_tpu.raster import RasterConfig
    from goi_tpu.semantic.codebook import SemanticDecoder
    from goi_tpu.train.optim import OptimConfig
    from tests.conftest import make_test_camera

    mesh = make_mesh(n_data=2, n_model=4)
    scene = make_random_scene(n=256, seed=3, sem_dim=8)
    scene = shard_scene(scene, mesh)
    cams = stack_cameras([make_test_camera(width=64, height=48,
                                           angle=0.2 * i)
                          for i in range(2)])
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.normal(0, 1, (2, 16, 48, 64))
                      .astype(np.float32))
    cams, gts = shard_batch(mesh, cams, gts)

    dec = SemanticDecoder.create(jax.random.PRNGKey(0), dim_in=8,
                                 dim_out=12, num_layer=1, use_bias=True)
    lut = jnp.asarray(rng.normal(0, 1, (12, 16)).astype(np.float32))
    init_fn, step_fn = make_sharded_distill_step(
        OptimConfig(), RasterConfig(max_instances=1 << 13,
                                    tile_cap=256, chunk=32))
    state = init_fn(scene, dec, lut)
    step_jit = jax.jit(step_fn)
    xyz0 = np.asarray(jax.device_get(state.scene.xyz))
    losses = []
    for _ in range(8):
        state, aux = step_jit(state, cams, gts,
                              jnp.zeros(3))
        losses.append(float(aux["total"]))
    assert losses[-1] < losses[0], losses
    # only semantics trains by default (ref:arguments/__init__.py:85-90)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(state.scene.xyz)), xyz0)
    assert np.abs(np.asarray(jax.device_get(
        state.scene.semantics))).sum() > 0
