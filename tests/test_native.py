"""Native C++ COLMAP parser vs the pure-Python parser."""

import os

import numpy as np
import pytest

from goi_tpu.data.colmap import (read_images_binary,
                                 read_points3d_binary)
from goi_tpu.native.loader import (native_available,
                                   read_images_binary_native,
                                   read_points3d_binary_native)
from tests.test_data_io import _write_colmap_binary


@pytest.fixture
def sparse_dir(tmp_path):
    d = str(tmp_path / "sparse")
    _write_colmap_binary(d, n_pts=500)
    return d


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_native_points3d_matches_python(sparse_dir):
    path = os.path.join(sparse_dir, "points3D.bin")
    py_xyz, py_rgb, py_err = read_points3d_binary(path)
    nat = read_points3d_binary_native(path)
    assert nat is not None
    xyz, rgb, err = nat
    np.testing.assert_allclose(xyz, py_xyz, rtol=1e-6)
    np.testing.assert_array_equal(rgb, py_rgb)
    np.testing.assert_allclose(err, py_err, rtol=1e-6)


def test_native_images_matches_python(sparse_dir):
    path = os.path.join(sparse_dir, "images.bin")
    py = read_images_binary(path)
    nat = read_images_binary_native(path)
    assert nat is not None
    assert set(nat) == set(py)
    for k in py:
        np.testing.assert_allclose(nat[k].qvec, py[k].qvec)
        np.testing.assert_allclose(nat[k].tvec, py[k].tvec)
        assert nat[k].name == py[k].name
        assert nat[k].camera_id == py[k].camera_id
