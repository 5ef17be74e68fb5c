"""NGP-convention orbit camera (ref:gui/cam_utils_ngp.py)."""

import numpy as np

from goi_tpu.app.orbit_ngp import (NGPOrbitCamera, intrinsic_to_fov,
                                   look_at_rotation, orbit_pose)


def test_orbit_pose_positions():
    # azimuth 0 -> +z, elevation 0
    p = orbit_pose(0, 0, radius=2.0)
    np.testing.assert_allclose(p[:3, 3], [0, 0, 2], atol=1e-6)
    # azimuth 90 -> +x
    p = orbit_pose(0, 90, radius=2.0)
    np.testing.assert_allclose(p[:3, 3], [2, 0, 0], atol=1e-6)
    # elevation 90 -> -y
    p = orbit_pose(90, 0, radius=2.0)
    np.testing.assert_allclose(p[:3, 3], [0, -2, 0], atol=1e-6)
    # rotation is orthonormal, det +1
    R = p[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99


def test_look_at_conventions():
    R_gl = look_at_rotation([0, 0, 3], [0, 0, 0], opengl=True)
    # OpenGL: forward column = campos - target direction (+z here)
    np.testing.assert_allclose(R_gl[:, 2], [0, 0, 1], atol=1e-6)
    R_cv = look_at_rotation([0, 0, 3], [0, 0, 0], opengl=False)
    np.testing.assert_allclose(R_cv[:, 2], [0, 0, -1], atol=1e-6)


def test_intrinsic_fov_roundtrip():
    fovx, fovy = intrinsic_to_fov(400.0, 300.0, 640, 480)
    assert abs(640 / (2 * np.tan(fovx / 2)) - 400.0) < 1e-6
    assert abs(480 / (2 * np.tan(fovy / 2)) - 300.0) < 1e-6


def test_to_camera_matches_look_at():
    """The NGP camera at (0,0,r) must project points like the
    renderer's own look_at camera from the same spot."""
    import jax.numpy as jnp

    from goi_tpu.core.camera import Camera, ndc2pix, project_points

    cam_ngp = NGPOrbitCamera(64, 48, r=3.0, fovy=50.0)
    cam_ngp.orbit_to(20.0, 35.0)
    c = cam_ngp.to_camera()

    eye = cam_ngp.campos
    ref = Camera.look_at(eye, [0, 0, 0], [0, 1, 0],
                         fovx=cam_ngp.fovx, fovy=cam_ngp.fovy,
                         width=64, height=48)
    pts = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.4, (20, 3)).astype(np.float32))
    pa, va = project_points(pts, c)
    pb, vb = project_points(pts, ref)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ndc2pix(pa[:, 0], 64)),
        np.asarray(ndc2pix(pb[:, 0], 64)), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ndc2pix(pa[:, 1], 48)),
        np.asarray(ndc2pix(pb[:, 1], 48)), atol=1e-3)


def test_mvp_maps_target_to_center():
    cam = NGPOrbitCamera(64, 64, r=2.5, fovy=45.0)
    cam.orbit_to(-15.0, 120.0)
    h = cam.mvp @ np.array([0, 0, 0, 1.0])
    ndc = h[:3] / h[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)
