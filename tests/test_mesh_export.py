"""Marching tetrahedra + texture baking (VERDICT round-2 item 5)."""

import os

import jax.numpy as jnp
import numpy as np

from goi_tpu.export.marching import Mesh, marching_tetrahedra
from goi_tpu.core.scene import GaussianScene


def _sphere_grid(r=0.7, res=40, lo=-1.0, hi=1.0):
    ax = np.linspace(lo, hi, res)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    d = np.sqrt(x * x + y * y + z * z)
    return (1.0 - d / r).astype(np.float32), ax[1] - ax[0]


def test_marching_tetrahedra_sphere():
    grid, voxel = _sphere_grid()
    mesh = marching_tetrahedra(grid, 0.0, origin=(-1.0, -1.0, -1.0),
                               voxel=voxel)
    v, f = mesh.vertices, mesh.faces
    assert len(f) > 500
    # every vertex sits on the r=0.7 sphere (linear interp error < voxel)
    rad = np.linalg.norm(v, axis=1)
    assert np.abs(rad - 0.7).max() < voxel

    # watertight: every edge shared by exactly two triangles
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # Euler characteristic of a sphere: V - E + F == 2
    n_e = len(np.unique(edges, axis=0))
    assert len(v) - n_e + len(f) == 2

    # outward orientation: triangle normal . centroid > 0
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1)
    assert ((n * c).sum(1) > 0).mean() > 0.99

    # area close to 4 pi r^2
    area = 0.5 * np.linalg.norm(n, axis=1).sum()
    assert abs(area / (4 * np.pi * 0.7 ** 2) - 1) < 0.05


def test_mesh_write_obj_ply(tmp_path):
    grid, voxel = _sphere_grid(res=16)
    mesh = marching_tetrahedra(grid, 0.0, origin=(-1, -1, -1),
                               voxel=voxel)
    obj = os.path.join(tmp_path, "m.obj")
    mesh.write_obj(obj)
    txt = open(obj).read()
    assert txt.count("\nf ") == len(mesh.faces) - (txt[:2] == "f ")
    ply = os.path.join(tmp_path, "m.ply")
    mesh.write_ply(ply)
    raw = open(ply, "rb").read()
    assert b"element face" in raw and b"vertex_indices" in raw


def _ball_scene():
    """One cluster of large opaque Gaussians with a red DC color."""
    rng = np.random.default_rng(0)
    n = 60
    xyz = rng.normal(0, 0.08, (n, 3)).astype(np.float32)
    colors = np.tile([[0.9, 0.2, 0.1]], (n, 1)).astype(np.float32)
    scene = GaussianScene.create(xyz, colors, sh_degree=0, sem_dim=4,
                                 scales=np.full(n, 0.12, np.float32))
    return scene.replace(opacity=jnp.full_like(scene.opacity, 3.0))


def test_extract_textured_mesh_end_to_end(tmp_path):
    from goi_tpu.export.texture import extract_textured_mesh
    from goi_tpu.raster.render import RasterConfig

    scene = _ball_scene()
    cfg = RasterConfig(max_instances=1 << 14, tile_cap=256, chunk=32)
    mesh = extract_textured_mesh(
        scene, jnp.zeros(3), cfg, density_thresh=0.5, resolution=32,
        texture_size=128, render_resolution=64)
    assert len(mesh.faces) > 50
    assert mesh.uvs.shape == (len(mesh.faces) * 3, 2)
    assert mesh.albedo.shape == (128, 128, 3)
    # chart texels must be baked and carry the gaussian's red color
    baked = mesh.albedo.reshape(-1, 3)
    lit = baked[baked.sum(1) > 0.05]
    assert len(lit) > 100
    assert lit[:, 0].mean() > 2.0 * lit[:, 2].mean()

    obj = os.path.join(tmp_path, "ball.obj")
    mesh.write_obj(obj)
    assert os.path.exists(os.path.join(tmp_path, "ball.png"))
    assert os.path.exists(os.path.join(tmp_path, "ball.mtl"))
    txt = open(obj).read()
    assert "vt " in txt and "mtllib" in txt
