"""Per-Gaussian rasterization preprocess (frustum cull, EWA projection).

Vectorized XLA equivalent of preprocessCUDA
(ref:cuda_rasterizer/forward.cu:154-256). All quantities are computed for
every Gaussian in the (static-capacity) scene; a validity mask replaces
the CUDA early-returns. Everything except the integer radius/rect is
differentiable, so `jax.grad` through this module reproduces the
hand-written CUDA backward (computeCov2DCUDA / preprocessCUDA-bw,
ref:cuda_rasterizer/backward.cu:144-412) automatically and exactly.

TPU notes: this is pure VPU-friendly elementwise math over N; XLA fuses
it into a handful of kernels. No Pallas needed here — the hot loops are
binning and blending.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from goi_tpu.core.camera import Camera, ndc2pix
from goi_tpu.core.scene import GaussianScene, build_cov3d
from goi_tpu.core.sh import sh_to_color

TILE = 16  # matches ref config.h BLOCK_X/BLOCK_Y (ref:cuda_rasterizer/config.h:16-17)
NEAR_Z = 0.2  # frustum near cull (ref:cuda_rasterizer/auxiliary.h:154)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Splats:
    """Per-Gaussian screen-space quantities (capacity N rows)."""

    mean2d: jax.Array        # (N, 2) pixel coords
    depth: jax.Array         # (N,) view-space z
    conic: jax.Array         # (N, 3) inverse 2D cov (a, b, c)
    opacity: jax.Array       # (N,) activated opacity
    color: jax.Array         # (N, 3) RGB from SH (or precomputed)
    semantics: jax.Array     # (N, S)
    radius: jax.Array        # (N,) int32 pixel radius (0 = culled)
    rect_min: jax.Array      # (N, 2) int32 tile coords (x, y)
    rect_max: jax.Array      # (N, 2) int32 tile coords, exclusive
    tiles_touched: jax.Array  # (N,) int32
    valid: jax.Array         # (N,) bool


def compute_cov2d(p_orig: jax.Array, cov3d: jax.Array, cam: Camera,
                  in_front: Optional[jax.Array] = None):
    """EWA projection of the world covariance to screen space
    (ref:cuda_rasterizer/forward.cu:73-113): clamp the view-space point to
    1.3*tan_fov, J @ R @ Sigma @ R^T @ J^T, +0.3 low-pass on the diagonal.

    `in_front` masks rows culled by the near plane: their view z is
    replaced by 1 BEFORE any division so the VJP stays finite. The CUDA
    kernels simply skip culled threads; under autodiff a forward-masked
    1/z still back-propagates NaN from z=0 (the where-grad trap), and a
    single NaN gradient permanently corrupts that Gaussian's Adam
    moments — observed as progressive scene collapse in long RGB runs.

    Returns (N, 3) packed (cov_xx, cov_xy, cov_yy)."""
    W = cam.world_view[:3, :3]
    t = p_orig @ W.T + cam.world_view[:3, 3]
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tz = t[:, 2] if in_front is None else jnp.where(
        in_front, t[:, 2], 1.0)
    txtz = t[:, 0] / tz
    tytz = t[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    fx, fy = cam.focal_x, cam.focal_y
    # J is the 2x3 projective Jacobian at the clamped point.
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # M = J @ W : (N, 2, 3)
    m0 = j00[:, None] * W[0][None, :] + j02[:, None] * W[2][None, :]
    m1 = j11[:, None] * W[1][None, :] + j12[:, None] * W[2][None, :]

    # Sigma (N, 3, 3) from packed upper triangle
    c = cov3d
    sig = jnp.stack([
        jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
        jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
        jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
    ], axis=-2)

    s0 = jnp.einsum("ni,nij->nj", m0, sig)
    s1 = jnp.einsum("ni,nij->nj", m1, sig)
    cov_xx = jnp.einsum("ni,ni->n", s0, m0) + 0.3
    cov_xy = jnp.einsum("ni,ni->n", s0, m1)
    cov_yy = jnp.einsum("ni,ni->n", s1, m1) + 0.3
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def preprocess(
    scene: GaussianScene,
    cam: Camera,
    *,
    scaling_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    cov3d_precomp: Optional[jax.Array] = None,
    semantic_masks: Optional[jax.Array] = None,
) -> Splats:
    grid_x = (cam.width + TILE - 1) // TILE
    grid_y = (cam.height + TILE - 1) // TILE

    xyz = scene.xyz
    ones = jnp.ones_like(xyz[:, :1])
    hom = jnp.concatenate([xyz, ones], axis=-1)
    p_clip = hom @ cam.full_proj.T
    p_view_z = hom @ cam.world_view[2].T

    in_front = p_view_z > NEAR_Z  # ref:auxiliary.h:154

    # safe-where the perspective division: culled rows (w ~ 0) must not
    # leak NaN into the backward pass (see compute_cov2d docstring)
    p_w = 1.0 / jnp.where(in_front, p_clip[:, 3] + 1e-7, 1.0)
    p_proj = p_clip[:, :3] * p_w[:, None]

    if cov3d_precomp is None:
        cov3d = build_cov3d(scene.get_scaling() * scaling_modifier,
                            scene.get_rotation())
    else:
        cov3d = cov3d_precomp
    cov2d = compute_cov2d(xyz, cov3d, cam, in_front=in_front)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv,
                       cov2d[:, 0] * det_inv], axis=-1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + disc  # >= mid - disc always
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    radius = radius_f.astype(jnp.int32)

    px = ndc2pix(p_proj[:, 0], cam.width)
    py = ndc2pix(p_proj[:, 1], cam.height)
    mean2d = jnp.stack([px, py], axis=-1)

    # Tile rect (ref:auxiliary.h:46-56). C int-cast truncates toward zero,
    # but negatives clamp to 0 anyway, so floor+clip is equivalent.
    rmin_x = jnp.clip(jnp.floor((px - radius_f) / TILE).astype(jnp.int32),
                      0, grid_x)
    rmin_y = jnp.clip(jnp.floor((py - radius_f) / TILE).astype(jnp.int32),
                      0, grid_y)
    rmax_x = jnp.clip(jnp.floor((px + radius_f + TILE - 1) / TILE)
                      .astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(jnp.floor((py + radius_f + TILE - 1) / TILE)
                      .astype(jnp.int32), 0, grid_y)
    area = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = scene.valid & in_front & det_ok & (area > 0)
    radius = jnp.where(valid, radius, 0)
    tiles = jnp.where(valid, area, 0)

    if override_color is not None:
        color = override_color
    else:
        color = sh_to_color(scene.active_sh_degree, scene.get_features(),
                            xyz, cam.camera_center)

    return Splats(
        mean2d=mean2d,
        depth=p_view_z,
        conic=conic,
        opacity=scene.get_opacity()[:, 0],
        color=color,
        semantics=scene.get_semantics(semantic_masks),
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tiles,
        valid=valid,
    )
