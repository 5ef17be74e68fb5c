"""Data readers, configs, scene orchestration, viewer protocol, utils."""

import json
import os
import socket
import struct
import threading

import numpy as np
import pytest


def _write_colmap_binary(sparse_dir, n_pts=50):
    os.makedirs(sparse_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # PINHOLE
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    # images.bin: 4 images
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 4))
        for i in range(4):
            f.write(struct.pack("<i", i + 1))
            q = np.array([1.0, 0, 0, 0])
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", 0.1 * i, 0.0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    # points3D.bin
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *rng.normal(0, 1, 3)))
            f.write(struct.pack("<BBB", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def _make_colmap_scene(root):
    _write_colmap_binary(os.path.join(root, "sparse/0"))
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    from PIL import Image
    for i in range(4):
        Image.new("RGB", (64, 48), (i * 30, 100, 200)).save(
            os.path.join(img_dir, f"img_{i:03d}.png"))
    feat_dir = os.path.join(root, "clip_feat")
    os.makedirs(feat_dir, exist_ok=True)
    for i in range(4):
        np.save(os.path.join(feat_dir, f"img_{i:03d}.npy"),
                np.random.default_rng(i).normal(
                    0, 1, (8, 48, 64)).astype(np.float32))


def test_colmap_reader(tmp_path):
    root = str(tmp_path / "scene")
    _make_colmap_scene(root)
    from goi_tpu.data.readers import load_scene_info

    info = load_scene_info(root, eval_split=True)
    assert len(info.train_cameras) == 3
    assert len(info.test_cameras) == 1
    assert info.point_cloud["points"].shape == (50, 3)
    assert info.nerf_normalization["radius"] > 0
    c = info.train_cameras[0]
    assert c.width == 64 and c.height == 48
    # focal 60 at 64px -> fovx
    import math
    assert abs(c.fovx - 2 * math.atan(64 / 120)) < 1e-6
    # PLY cache got written and reads back
    assert os.path.exists(os.path.join(root, "sparse/0/points3D.ply"))


def test_colmap_text_reader(tmp_path):
    sparse = str(tmp_path / "sparse0")
    os.makedirs(sparse)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 64 48 60.0 32 24\n")
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("# c\n1 1 0 0 0 0.5 0 2 1 a.png\n1.0 2.0 5\n")
    with open(os.path.join(sparse, "points3D.txt"), "w") as f:
        f.write("1 0.1 0.2 0.3 10 20 30 0.5 1 0\n")
    from goi_tpu.data.colmap import read_model
    cams, imgs, (xyz, rgb, err) = read_model(sparse)
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert imgs[1].name == "a.png"
    np.testing.assert_allclose(xyz[0], [0.1, 0.2, 0.3])


def test_blender_reader(tmp_path):
    root = str(tmp_path / "blender")
    os.makedirs(root)
    from PIL import Image
    os.makedirs(os.path.join(root, "train"))
    frames = []
    for i in range(3):
        Image.new("RGBA", (32, 32), (50, 100, 150, 255)).save(
            os.path.join(root, f"train/r_{i}.png"))
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i * 0.1
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    from goi_tpu.data.readers import load_scene_info
    info = load_scene_info(root, load_sem=False)
    assert len(info.train_cameras) == 3
    assert info.point_cloud is not None  # random cloud generated


def test_scene_end_to_end(tmp_path):
    """Scene: create from pcd, save, reload the saved iteration."""
    root = str(tmp_path / "scene")
    _make_colmap_scene(root)
    from goi_tpu.configs.params import ModelParams
    from goi_tpu.data.scene import Scene

    mp = ModelParams(source_path=root,
                     model_path=str(tmp_path / "model"), eval=True)
    sc = Scene(mp)
    assert sc.gaussians.num_valid == 13  # 50 pts, ::4 subsample
    assert len(sc.train_cameras) == 3
    out_dir = sc.save(7)
    assert os.path.exists(os.path.join(out_dir, "point_cloud.ply"))
    assert os.path.exists(os.path.join(mp.model_path, "cameras.json"))

    sc2 = Scene(mp, load_iteration=-1)
    assert sc2.loaded_iter == 7
    np.testing.assert_allclose(np.asarray(sc2.gaussians.xyz),
                               np.asarray(sc.gaussians.xyz), atol=1e-6)


def test_params_roundtrip(tmp_path):
    from argparse import ArgumentParser

    from goi_tpu.configs.params import (ModelParams, add_params,
                                        extract_params,
                                        load_saved_params, save_params)

    parser = ArgumentParser()
    add_params(parser, ModelParams, "model")
    args = parser.parse_args(["-s", "/data/x", "--sh_degree", "2",
                              "--white_background"])
    mp = extract_params(args, ModelParams)
    assert mp.source_path == "/data/x"
    assert mp.sh_degree == 2
    assert mp.white_background is True
    save_params(str(tmp_path), mp)
    back = load_saved_params(str(tmp_path), ModelParams)
    assert back == mp


def test_viewer_protocol_loopback():
    from goi_tpu.viewer.server import NetworkGUI

    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]

    recv_holder = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        wv = np.eye(4).flatten().tolist()
        msg = json.dumps({
            "resolution_x": 8, "resolution_y": 6, "train": False,
            "fov_x": 0.8, "fov_y": 0.6, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": wv, "view_projection_matrix": wv,
        }).encode()
        s.sendall(len(msg).to_bytes(4, "little") + msg)
        img = b""
        while len(img) < 8 * 6 * 3:
            img += s.recv(4096)
        vlen = int.from_bytes(img[8 * 6 * 3:8 * 6 * 3 + 4] or
                              s.recv(4), "little")
        recv_holder["img_len"] = len(img)
        s.close()

    import time

    t = threading.Thread(target=client)
    t.start()
    served = False
    for _ in range(200):
        time.sleep(0.02)
        flags = gui.serve_step(
            lambda cam, sm: np.zeros((3, cam.height, cam.width),
                                     np.float32),
            verify="test")
        if flags:
            served = True
            break
    t.join(timeout=5)
    assert served
    assert recv_holder["img_len"] >= 8 * 6 * 3


def test_pose_interpolation():
    from goi_tpu.utils.pose import interpolate_poses

    a = np.eye(4)
    b = np.eye(4)
    b[:3, 3] = [1.0, 0, 0]
    th = np.pi / 2
    b[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    path = interpolate_poses([a, b], steps_per_segment=10)
    assert len(path) == 11
    mid = path[5]
    # halfway: 45 degrees, x=0.5
    assert abs(mid[0, 3] - 0.5) < 1e-6
    assert abs(np.arccos(np.clip(mid[0, 0], -1, 1)) - np.pi / 4) < 1e-6
    for m in path:
        RtR = m[:3, :3].T @ m[:3, :3]
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-6)


def test_image_utils():
    import jax.numpy as jnp

    from goi_tpu.utils.image import (calculate_iou, clip_color,
                                     compute_mask_ratio, turbo_colormap)

    v = jnp.linspace(0, 1, 10)
    c = np.asarray(turbo_colormap(v))
    assert c.shape == (10, 3)
    assert c.min() >= 0 and c.max() <= 1
    # turbo: low values blue-ish, high values red-ish
    assert c[0, 2] > c[0, 0]
    assert c[-1, 0] > c[-1, 2]

    sim = jnp.asarray(np.random.default_rng(0).uniform(0.8, 1.0, 48))
    bg = sim < 0.9
    heat, alpha = clip_color(sim, bg, 6, 8, thresh=0.86, coloring=True)
    assert heat.shape == (6, 8, 3)

    a = np.array([1, 1, 0, 0], bool)
    b = np.array([1, 0, 1, 0], bool)
    assert abs(calculate_iou(a, b) - 1 / 3) < 1e-9
    assert abs(compute_mask_ratio(a, b) - 0.5) < 1e-9
