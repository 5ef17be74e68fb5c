"""Texture baking: per-triangle UV atlas + multi-view color back-projection.

TPU-native replacement for the reference's nvdiffrast texture extraction
(ref:gui/main.py:606-767: orbit views -> rasterize mesh -> mipmap
grid_put into an xatlas UV chart; ref:gui/grid_put.py). nvdiffrast and
xatlas are CUDA/native dependencies; here the SAME outputs (OBJ + MTL +
PNG albedo) are produced with the framework's own Gaussian renderer:

  - UV atlas: one uniform chart cell per triangle (right-triangle
    packing). Deterministic, watertight per face, no unwrap library.
  - Baking: every texel maps to a barycentric 3D point; each orbit view
    renders the GAUSSIAN scene (color + depth + alpha) and texels that
    project onto a facing, depth-consistent, opaque pixel take that
    color. Earlier views win, as in the reference (cnt < 0.1 gating,
    ref:gui/main.py:717-721).
  - Inpainting: empty texels copy their nearest baked texel
    (ref:gui/main.py:731-752).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from goi_tpu.core.camera import Camera
from goi_tpu.export.marching import Mesh

# same orbit schedule as the reference (ref:gui/main.py:630-631)
_VERS = [0] * 8 + [-45] * 8 + [45] * 8 + [-89.9, 89.9]
_HORS = [0, 45, -45, 90, -90, 135, -135, 180] * 3 + [0, 0]


def _chart_layout(num_faces: int, texture_size: int, margin: float = 1.0):
    """Uniform grid of per-triangle chart cells. Returns
    (uvs (F*3, 2) in [0,1] with v up (OBJ convention),
     texel barycentrics (T, 3), texel cell offsets (T, 2) in pixels,
     cells_per_side)."""
    side = int(math.ceil(math.sqrt(num_faces)))
    cell = texture_size / side
    m = min(margin, cell / 4)
    # canonical right triangle corners inside a cell (pixel units)
    c0 = np.array([m, m])
    c1 = np.array([cell - 2 * m, m])
    c2 = np.array([m, cell - 2 * m])

    f = np.arange(num_faces)
    cx = (f % side) * cell
    cy = (f // side) * cell
    corners = np.stack([c0, c1, c2], 0)[None] \
        + np.stack([cx, cy], -1)[:, None, :]            # (F, 3, 2)
    uvs = corners.reshape(-1, 2) / texture_size
    uvs = np.stack([uvs[:, 0], 1.0 - uvs[:, 1]], -1)     # OBJ v-up

    # texels of the canonical cell that fall inside the triangle
    # (+0.75px halo so bilinear lookups at edges stay in-chart)
    g = np.arange(int(math.ceil(cell))) + 0.5
    ty, tx = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([tx.ravel(), ty.ravel()], -1)          # (cell^2, 2)
    # barycentrics wrt (c0, c1, c2): affine solve
    M = np.stack([c1 - c0, c2 - c0], axis=1)             # rows
    bary12 = (pts - c0) @ np.linalg.inv(M)
    bary = np.concatenate([1 - bary12.sum(-1, keepdims=True), bary12], -1)
    halo = 0.75 / max(cell - 3 * m, 1e-6)
    keep = (bary > -halo).all(axis=1)
    return uvs, bary[keep], pts[keep], side


def bake_texture(
    render_fn,
    mesh: Mesh,
    *,
    texture_size: int = 1024,
    render_resolution: int = 512,
    radius: Optional[float] = None,
    fov: float = 0.9,
    depth_tol: float = 0.02,   # relative z-buffer tolerance
    viewcos_min: float = 0.5,
    center: Optional[np.ndarray] = None,
) -> Mesh:
    """Bake an albedo texture for `mesh` by back-projecting rendered
    views. `render_fn(cam) -> dict(render (3,H,W), depth (1,H,W),
    alpha (1,H,W))` is any renderer honoring the render() contract
    (typically functools.partial(goi_tpu.raster.render, scene, bg=...,
    config=...)). Returns the mesh with `uvs` and `albedo` set."""
    v, f = mesh.vertices, mesh.faces
    if center is None:
        center = 0.5 * (v.min(0) + v.max(0))
    if radius is None:
        radius = 2.2 * float(np.linalg.norm(v - center, axis=1).max())

    uvs, bary, cell_pts, side = _chart_layout(len(f), texture_size)
    cell = texture_size / side

    # texel world positions + normals: (F, T, 3)
    tri = v[f]                                           # (F, 3, 3)
    pos = np.einsum("tb,fbc->ftc", bary, tri)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)

    # texel pixel coords in the atlas
    fx = (np.arange(len(f)) % side) * cell
    fy = (np.arange(len(f)) // side) * cell
    px = (fx[:, None] + cell_pts[None, :, 0]).astype(np.int64)
    py = (fy[:, None] + cell_pts[None, :, 1]).astype(np.int64)
    px = np.clip(px, 0, texture_size - 1)
    py = np.clip(py, 0, texture_size - 1)

    albedo = np.zeros((texture_size, texture_size, 3), np.float32)
    baked = np.zeros((texture_size, texture_size), bool)

    flat_pos = pos.reshape(-1, 3)
    flat_n = np.repeat(n, bary.shape[0], axis=0)
    flat_py = py.reshape(-1)
    flat_px = px.reshape(-1)

    for ver, hor in zip(_VERS, _HORS):
        va, ha = math.radians(ver), math.radians(hor)
        eye = center + radius * np.array([
            math.cos(va) * math.sin(ha),
            math.sin(va),
            -math.cos(va) * math.cos(ha)])
        cam = Camera.look_at(eye, center, [0, 1, 0], fovx=fov, fovy=fov,
                             width=render_resolution,
                             height=render_resolution)
        out = render_fn(cam)
        img = np.asarray(out["render"])                  # (3, H, W)
        alp = np.asarray(out["alpha"])[0]

        # project texels
        import jax.numpy as jnp
        from goi_tpu.core.camera import ndc2pix, project_points
        p_proj, p_view = project_points(jnp.asarray(flat_pos), cam)
        sx = np.asarray(ndc2pix(p_proj[:, 0], render_resolution))
        sy = np.asarray(ndc2pix(p_proj[:, 1], render_resolution))
        z = np.asarray(p_view[:, 2])
        ix = np.round(sx).astype(np.int64)
        iy = np.round(sy).astype(np.int64)
        inb = ((ix >= 0) & (ix < render_resolution)
               & (iy >= 0) & (iy < render_resolution) & (z > 0.2))
        ix_c = np.clip(ix, 0, render_resolution - 1)
        iy_c = np.clip(iy, 0, render_resolution - 1)

        viewdir = (np.asarray(eye)[None] - flat_pos)
        viewdir /= np.maximum(
            np.linalg.norm(viewdir, axis=1, keepdims=True), 1e-12)
        facing = (flat_n * viewdir).sum(1) > viewcos_min
        solid = alp[iy_c, ix_c] > 0.5
        # self-occlusion: z-buffer built from the projected texels
        # themselves (the software analog of the reference's nvdiffrast
        # mesh rasterization gate, ref:gui/main.py:682-702)
        pid = iy_c * render_resolution + ix_c
        zbuf = np.full(render_resolution * render_resolution, np.inf,
                       np.float64)
        front = inb & facing
        np.minimum.at(zbuf, pid[front], z[front])
        vis = z <= zbuf[pid] * (1.0 + depth_tol)
        ok = inb & facing & solid & vis
        fresh = ok & ~baked[flat_py, flat_px]
        albedo[flat_py[fresh], flat_px[fresh]] = \
            img[:, iy_c[fresh], ix_c[fresh]].T
        baked[flat_py[fresh], flat_px[fresh]] = True

    # nearest-neighbor inpaint of unbaked chart texels
    # (ref:gui/main.py:731-752)
    want = np.zeros_like(baked)
    want[flat_py, flat_px] = True
    hole = want & ~baked
    if hole.any() and baked.any():
        from sklearn.neighbors import NearestNeighbors
        src = np.stack(np.nonzero(baked), -1)
        dst = np.stack(np.nonzero(hole), -1)
        nn = NearestNeighbors(n_neighbors=1).fit(src)
        _, idx = nn.kneighbors(dst)
        albedo[tuple(dst.T)] = albedo[tuple(src[idx[:, 0]].T)]

    mesh.uvs = uvs.astype(np.float32)
    mesh.albedo = albedo
    return mesh


def extract_textured_mesh(scene, bg, config, *,
                          density_thresh: float = 1.0,
                          resolution: int = 128,
                          texture_size: int = 1024,
                          **bake_kw) -> Mesh:
    """One-call scene -> textured mesh (the reference's 'geo+tex' save
    mode, ref:gui/main.py:609-755)."""
    from functools import partial

    from goi_tpu.export.marching import extract_mesh
    from goi_tpu.raster.render import render

    mesh = extract_mesh(scene, density_thresh=density_thresh,
                        resolution=resolution)
    fn = lambda cam: render(scene, cam, bg, config)  # noqa: E731
    return bake_texture(fn, mesh, texture_size=texture_size, **bake_kw)
