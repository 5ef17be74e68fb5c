"""Build + bind the native COLMAP parser (ctypes, no pybind11).

Compiled lazily on first use into ~/.cache/goi_tpu/ (content-addressed
by source hash); any failure falls back to the pure-Python parsers in
goi_tpu/data/colmap.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "colmap_native.cpp")


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser("~/.cache/goi_tpu"))
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"colmap_native_{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError,
                OSError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.colmap_points3d_parse.restype = ctypes.c_longlong
    lib.colmap_points3d_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_longlong]
    lib.colmap_images_parse.restype = ctypes.c_longlong
    lib.colmap_images_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_longlong]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def read_points3d_binary_native(path: str
                                ) -> Optional[Tuple[np.ndarray,
                                                    np.ndarray,
                                                    np.ndarray]]:
    lib = _get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    n = lib.colmap_points3d_parse(data, len(data), None, None, None, 0)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float32)
    got = lib.colmap_points3d_parse(
        data, len(data),
        xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        err.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        return None
    return xyz.astype(np.float64), rgb, err.astype(np.float64)


def read_images_binary_native(path: str):
    """Returns dict[id] -> ColmapImage (without 2D point payloads, which
    the pipeline never uses; ref cameras only need pose + name)."""
    lib = _get_lib()
    if lib is None:
        return None
    from goi_tpu.data.colmap import ColmapImage

    with open(path, "rb") as f:
        data = f.read()
    n = lib.colmap_images_parse(data, len(data), None, None, None, None,
                                None, None, 0)
    if n < 0:
        return None
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    iid = np.empty((n,), np.int32)
    cid = np.empty((n,), np.int32)
    noff = np.empty((n,), np.int64)
    nlen = np.empty((n,), np.int64)
    got = lib.colmap_images_parse(
        data, len(data),
        qvec.ctypes.data_as(ctypes.c_void_p),
        tvec.ctypes.data_as(ctypes.c_void_p),
        iid.ctypes.data_as(ctypes.c_void_p),
        cid.ctypes.data_as(ctypes.c_void_p),
        noff.ctypes.data_as(ctypes.c_void_p),
        nlen.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        return None
    out = {}
    empty = np.zeros((0, 2))
    empty_ids = np.zeros((0,), np.int64)
    for i in range(n):
        name = data[noff[i]:noff[i] + nlen[i]].decode("utf-8")
        out[int(iid[i])] = ColmapImage(
            int(iid[i]), qvec[i], tvec[i], int(cid[i]), name,
            empty, empty_ids)
    return out
