"""Geometry export: density grids, colored point clouds, ellipsoid
meshes.

Role of the reference's mesh/texture export stack (ref:gui/main.py:
606-767 with gui/mesh.py, gui/grid_put.py — nvdiffrast texture baking).
nvdiffrast is CUDA-only; the TPU-native exports here cover the same
user needs (take the reconstruction into DCC tools): a volume density
grid (feed any external marching-cubes/Poisson step), a colored point
cloud PLY, and an ellipsoid OBJ visualizing the Gaussians directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.core.scene import GaussianScene, build_rotation_matrix
from goi_tpu.core.sh import sh_to_rgb


def density_grid(scene: GaussianScene, resolution: int = 128,
                 bounds: Optional[Tuple[float, float]] = None,
                 chunk: int = 64) -> Tuple[np.ndarray, np.ndarray,
                                           float]:
    """Evaluate the opacity-weighted Gaussian mixture on a regular grid.

    Returns (grid (R,R,R) float32, origin (3,), voxel_size). Chunked
    over z-slabs; per slab evaluates all valid Gaussians (exp falloff,
    matching the rasterizer's 3D density definition)."""
    xyz = np.asarray(scene.xyz)
    valid = np.asarray(scene.valid)
    pts = xyz[valid]
    if bounds is None:
        lo = np.percentile(pts, 1, axis=0) - 0.1
        hi = np.percentile(pts, 99, axis=0) + 0.1
        lo, hi = float(lo.min()), float(hi.max())
    else:
        lo, hi = bounds
    voxel = (hi - lo) / resolution
    chunk = min(chunk, resolution)
    axes = jnp.linspace(lo + voxel / 2, hi - voxel / 2, resolution)

    opa = scene.get_opacity()[:, 0] * scene.valid
    cov_r = build_rotation_matrix(scene.get_rotation())
    inv_s = 1.0 / jnp.maximum(scene.get_scaling(), 1e-6)
    # inverse covariance: R diag(1/s^2) R^T
    prec = jnp.einsum("nik,nk,njk->nij", cov_r, inv_s ** 2, cov_r)
    mu = scene.xyz

    @jax.jit
    def slab(z0):
        zs = jax.lax.dynamic_slice(axes, (z0,), (chunk,))
        gx, gy, gz = jnp.meshgrid(axes, axes, zs, indexing="ij")
        p = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # (R*R*chunk, 3)

        def one_point(pt):
            d = pt[None, :] - mu                        # (N, 3)
            m = jnp.einsum("ni,nij,nj->n", d, prec, d)
            return jnp.sum(opa * jnp.exp(-0.5 * m))

        return jax.lax.map(one_point, p, batch_size=4096).reshape(
            resolution, resolution, chunk)

    slabs = []
    for z0 in range(0, resolution, chunk):
        slabs.append(np.asarray(slab(z0)))
    grid = np.concatenate(slabs, axis=2)[:, :, :resolution]
    return grid, np.array([lo, lo, lo], np.float32), voxel


def export_colored_point_cloud(path: str, scene: GaussianScene,
                               min_opacity: float = 0.1) -> int:
    """PLY with x/y/z + red/green/blue from the SH DC term."""
    from goi_tpu.core.ply import write_ply

    valid = np.asarray(scene.valid) & (
        np.asarray(scene.get_opacity())[:, 0] > min_opacity)
    xyz = np.asarray(scene.xyz)[valid]
    rgb = np.clip(np.asarray(
        sh_to_rgb(np.asarray(scene.features_dc)[valid][:, 0])), 0, 1)
    write_ply(path, {
        "x": xyz[:, 0].astype(np.float32),
        "y": xyz[:, 1].astype(np.float32),
        "z": xyz[:, 2].astype(np.float32),
        "red": (rgb[:, 0] * 255).astype(np.uint8),
        "green": (rgb[:, 1] * 255).astype(np.uint8),
        "blue": (rgb[:, 2] * 255).astype(np.uint8),
    })
    return int(valid.sum())


# unit octahedron template (6 verts, 8 faces)
_OCTA_V = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                    [0, 0, 1], [0, 0, -1]], np.float32)
_OCTA_F = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                    [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])


def export_ellipsoids_obj(path: str, scene: GaussianScene,
                          min_opacity: float = 0.3, sigma: float = 1.5,
                          max_gaussians: int = 100_000) -> int:
    """OBJ of one octahedron per Gaussian, transformed by its
    covariance — a direct visualization of the reconstruction."""
    valid = np.asarray(scene.valid) & (
        np.asarray(scene.get_opacity())[:, 0] > min_opacity)
    idx = np.where(valid)[0][:max_gaussians]
    mu = np.asarray(scene.xyz)[idx]
    r = np.asarray(build_rotation_matrix(scene.get_rotation()))[idx]
    s = np.asarray(scene.get_scaling())[idx] * sigma
    rgb = np.clip(np.asarray(
        sh_to_rgb(np.asarray(scene.features_dc)[idx][:, 0])), 0, 1)

    verts = np.einsum("nij,vj,nj->nvi", r, _OCTA_V, s) + mu[:, None]
    with open(path, "w") as f:
        f.write("# goi_tpu gaussian ellipsoids\n")
        for n in range(len(idx)):
            for v, c in zip(verts[n], [rgb[n]] * 6):
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f} "
                        f"{c[0]:.3f} {c[1]:.3f} {c[2]:.3f}\n")
        for n in range(len(idx)):
            base = n * 6 + 1
            for tri in _OCTA_F:
                f.write(f"f {base + tri[0]} {base + tri[1]} "
                        f"{base + tri[2]}\n")
    return len(idx)
