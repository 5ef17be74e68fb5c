"""Core state, camera math, SH, and PLY round-trip tests."""

import math
import os

import jax.numpy as jnp
import numpy as np

from goi_tpu.core.camera import (Camera, get_projection_matrix,
                                 get_world2view, ndc2pix, project_points)
from goi_tpu.core.ply import (load_gaussians_ply, read_ply,
                              save_gaussians_ply, write_ply)
from goi_tpu.core.scene import GaussianScene, build_rotation_matrix
from goi_tpu.core.sh import C0, eval_sh, rgb_to_sh, sh_to_rgb
from tests.conftest import make_random_scene, make_test_camera


def test_rotation_matrix_orthonormal():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(50, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = np.asarray(build_rotation_matrix(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (50, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_identity_quat_identity_rotation():
    R = np.asarray(build_rotation_matrix(jnp.array([1.0, 0, 0, 0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_projection_matrix_matches_reference_form():
    znear, zfar, fovx, fovy = 0.01, 100.0, 0.9, 0.7
    P = get_projection_matrix(znear, zfar, fovx, fovy)
    # reference formula (ref:utils/graphics_utils.py:51-71)
    assert abs(P[0, 0] - 1.0 / math.tan(fovx / 2)) < 1e-6
    assert abs(P[1, 1] - 1.0 / math.tan(fovy / 2)) < 1e-6
    assert P[3, 2] == 1.0
    assert abs(P[2, 2] - zfar / (zfar - znear)) < 1e-6
    assert abs(P[2, 3] + zfar * znear / (zfar - znear)) < 1e-6


def test_camera_center_matches_inverse():
    cam = make_test_camera()
    w2c = np.asarray(cam.world_view)
    c2w = np.linalg.inv(w2c)
    np.testing.assert_allclose(np.asarray(cam.camera_center),
                               c2w[:3, 3], atol=1e-5)


def test_project_points_center():
    cam = make_test_camera(width=64, height=64)
    # the look-at target projects to the image center
    p_proj, p_view = project_points(jnp.zeros((1, 3)), cam)
    assert float(p_view[0, 2]) > 0  # in front
    px = ndc2pix(p_proj[0, 0], cam.width)
    py = ndc2pix(p_proj[0, 1], cam.height)
    assert abs(float(px) - (64 - 1) / 2) < 1e-3
    assert abs(float(py) - (64 - 1) / 2) < 1e-3


def test_sh_constants_roundtrip():
    rgb = np.array([[0.1, 0.5, 0.9]], np.float32)
    sh = rgb_to_sh(rgb)
    np.testing.assert_allclose(sh_to_rgb(sh), rgb, atol=1e-6)
    # deg-0 eval: C0 * sh == rgb - 0.5
    out = np.asarray(eval_sh(0, jnp.asarray(sh)[:, None, :],
                             jnp.array([[0.0, 0, 1]])))
    np.testing.assert_allclose(out, rgb - 0.5, atol=1e-6)


def test_ply_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "t.ply")
    props = {"x": np.arange(5, dtype=np.float32),
             "y": np.ones(5, np.float32),
             "flag": np.arange(5, dtype=np.uint8)}
    write_ply(path, props)
    back = read_ply(path)
    for k in props:
        np.testing.assert_array_equal(back[k], props[k])


def test_gaussian_ply_roundtrip(tmp_path):
    scene = make_random_scene(n=64, seed=1, sh_degree=3, capacity=100)
    path = os.path.join(tmp_path, "gauss.ply")
    save_gaussians_ply(path, scene)
    # property order must match the reference exactly
    names = list(read_ply(path))
    assert names[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert names[6:9] == ["f_dc_0", "f_dc_1", "f_dc_2"]
    assert names[9] == "f_rest_0" and names[53] == "f_rest_44"
    assert names[54] == "sem_0" and names[63] == "sem_9"
    assert names[64] == "opacity"
    assert names[65:68] == ["scale_0", "scale_1", "scale_2"]
    assert names[68:] == ["rot_0", "rot_1", "rot_2", "rot_3"]

    back = load_gaussians_ply(path, sh_degree=3, sem_dim=10)
    valid = np.asarray(scene.valid)
    for field in ("xyz", "features_dc", "features_rest", "semantics",
                  "scaling", "rotation", "opacity"):
        a = np.asarray(getattr(scene, field))[valid]
        b = np.asarray(getattr(back, field))
        np.testing.assert_allclose(a, b, atol=0, err_msg=field)


def test_capacity_padding_is_invisible():
    """A scene padded to 2x capacity renders identically."""
    from goi_tpu.raster import RasterConfig, render
    s1 = make_random_scene(n=150, seed=2)
    s2 = make_random_scene(n=150, seed=2, capacity=300)
    cam = make_test_camera()
    cfg = RasterConfig(max_instances=1 << 14, tile_cap=512, chunk=32)
    o1 = render(s1, cam, jnp.zeros(3), cfg)
    o2 = render(s2, cam, jnp.zeros(3), cfg)
    np.testing.assert_allclose(np.asarray(o1["render"]),
                               np.asarray(o2["render"]), atol=1e-6)
