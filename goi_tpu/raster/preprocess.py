"""Per-Gaussian rasterization preprocess (frustum cull, EWA projection).

Vectorized XLA equivalent of preprocessCUDA
(ref:cuda_rasterizer/forward.cu:154-256). All quantities are computed for
every Gaussian in the (static-capacity) scene; a validity mask replaces
the CUDA early-returns. Everything except the integer radius/rect is
differentiable, so `jax.grad` through this module reproduces the
hand-written CUDA backward (computeCov2DCUDA / preprocessCUDA-bw,
ref:cuda_rasterizer/backward.cu:144-412) automatically and exactly.

TPU notes: ALL internal math is written over 1-D (N,) arrays — scalar
components x, y, z, c0..c5, ... — never (N, 3)/(N, 3, 3) stacks. On TPU
the minor-most axis maps to the 128 vector lanes, so an (N, 3)
elementwise op runs at 3/128 lane utilization; the same op over (N,)
components is fully dense. The (N, k) stacks exist only at the Splats
boundary (row-gather layout for binning/packing). Measured: the stacked
form of this file cost ~7.4 ms fwd / ~2 ms bwd at N=100k on one chip;
the scalar form is HBM-traffic bound instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from goi_tpu.core.camera import Camera, ndc2pix
from goi_tpu.core.scene import GaussianScene
from goi_tpu.core.sh import C0, C1, C2, C3

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
    tiles_touched: jax.Array  # (N,) int32 EXACT kept-cell count for
    #                           rects up to 3x3 (see cell_sel), else
    #                           the rect area
    valid: jax.Array         # (N,) bool
    # Packed cell-select tables for the EXACT-count expansion: for
    # rects with both dims <= 3 (the overwhelming share of a production
    # scene — 2x2 rects alone were 55% of raw instances at the 1M
    # bench, and their missed corners 80% of the rect overcount),
    # tiles_touched counts only cells passing the exact ellipse/tile
    # overlap test, and cell_sel[:, 0/1] pack the flat 3x3 cell index
    # of the l-th passing cell as the l-th nibble (ranks 0-5 in col 0,
    # 6-8 in col 1; nibble sums < 16^6 < 2^24 stay f32-exact). A
    # NEGATIVE col-0 value marks the fallback: rect-area counts with
    # the in-stream cull (big rects, non-PSD conics, resliced shards).
    # Shrinks the instance budget ~19% at the 1M bench — every
    # instance-scaled stage (sorts, pack gather, chain reduce) scales
    # with it.
    cell_sel: jax.Array = None  # (N, 2) f32


def cell_min_q(lx, ux, ly, uy, ca, cb, cc):
    """Exact min of the (positive-definite) conic quadratic
    Q(d) = ca dx^2 + 2 cb dx dy + cc dy^2 over the box
    [lx, ux] x [ly, uy]: 0 if the origin is inside, else the min over
    the four edges (each edge a convex 1-D quadratic whose clamped
    stationary point is its exact minimum). Shared by the in-stream
    overlap cull (raster/binning.py) and the preprocess-time exact
    cell counting — both sides must evaluate the IDENTICAL expression
    so an enumerated cell can never be admitted by one and rejected by
    the other with consequences (a disagreement only yields a harmless
    zero-contribution sentinel instance)."""
    inside = (lx <= 0) & (ux >= 0) & (ly <= 0) & (uy >= 0)
    ca_s = jnp.maximum(ca, 1e-20)
    cc_s = jnp.maximum(cc, 1e-20)

    def q_at(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    dy_l = jnp.clip(-cb * lx / cc_s, ly, uy)
    dy_u = jnp.clip(-cb * ux / cc_s, ly, uy)
    dx_l = jnp.clip(-cb * ly / ca_s, lx, ux)
    dx_u = jnp.clip(-cb * uy / ca_s, lx, ux)
    min_q = jnp.minimum(
        jnp.minimum(q_at(lx, dy_l), q_at(ux, dy_u)),
        jnp.minimum(q_at(dx_l, ly), q_at(dx_u, uy)))
    return jnp.where(inside, 0.0, min_q)


def _cov3d_scalar(scaling, rotation, modifier: float = 1.0):
    """Packed world covariance (c0..c5) = R diag((s*modifier)^2) R^T from
    raw (log-scale, unnormalized quaternion) params, all (N,) ops
    (ref:cuda_rasterizer/forward.cu:118-152)."""
    s0 = jnp.exp(scaling[:, 0]) * modifier
    s1 = jnp.exp(scaling[:, 1]) * modifier
    s2 = jnp.exp(scaling[:, 2]) * modifier
    # normalize the quaternion; clamp the SQUARED norm (sqrt VJP at 0)
    qr, qi, qj, qk = (rotation[:, 0], rotation[:, 1], rotation[:, 2],
                      rotation[:, 3])
    n2 = qr * qr + qi * qi + qj * qj + qk * qk
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-24))
    r, i, j, k = qr * inv_n, qi * inv_n, qj * inv_n, qk * inv_n
    # rotation matrix entries (ref:utils/general_utils.py build_rotation)
    r00 = 1 - 2 * (j * j + k * k)
    r01 = 2 * (i * j - r * k)
    r02 = 2 * (i * k + r * j)
    r10 = 2 * (i * j + r * k)
    r11 = 1 - 2 * (i * i + k * k)
    r12 = 2 * (j * k - r * i)
    r20 = 2 * (i * k - r * j)
    r21 = 2 * (j * k + r * i)
    r22 = 1 - 2 * (i * i + j * j)
    v0, v1, v2 = s0 * s0, s1 * s1, s2 * s2
    c0 = r00 * r00 * v0 + r01 * r01 * v1 + r02 * r02 * v2   # xx
    c1 = r00 * r10 * v0 + r01 * r11 * v1 + r02 * r12 * v2   # xy
    c2 = r00 * r20 * v0 + r01 * r21 * v1 + r02 * r22 * v2   # xz
    c3 = r10 * r10 * v0 + r11 * r11 * v1 + r12 * r12 * v2   # yy
    c4 = r10 * r20 * v0 + r11 * r21 * v1 + r12 * r22 * v2   # yz
    c5 = r20 * r20 * v0 + r21 * r21 * v1 + r22 * r22 * v2   # zz
    return c0, c1, c2, c3, c4, c5


def _cov2d_scalar(x, y, z, cov, cam: Camera, in_front):
    """EWA projection to screen space over (N,) components
    (ref:cuda_rasterizer/forward.cu:73-113): clamp the view-space point
    to 1.3*tan_fov, J @ W @ Sigma @ W^T @ J^T, +0.3 low-pass on the
    diagonal.

    `in_front` masks rows culled by the near plane: their view z is
    replaced by 1 BEFORE any division so the VJP stays finite (the
    where-grad trap; a single NaN gradient permanently corrupts that
    Gaussian's Adam moments)."""
    c0, c1, c2, c3, c4, c5 = cov
    W = cam.world_view
    w00, w01, w02 = W[0, 0], W[0, 1], W[0, 2]
    w10, w11, w12 = W[1, 0], W[1, 1], W[1, 2]
    w20, w21, w22 = W[2, 0], W[2, 1], W[2, 2]
    b0, b1, b2 = W[0, 3], W[1, 3], W[2, 3]
    t0 = w00 * x + w01 * y + w02 * z + b0
    t1 = w10 * x + w11 * y + w12 * z + b1
    t2 = w20 * x + w21 * y + w22 * z + b2

    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tz = jnp.where(in_front, t2, 1.0)
    tx = jnp.clip(t0 / tz, -limx, limx) * tz
    ty = jnp.clip(t1 / tz, -limy, limy) * tz

    fx, fy = cam.focal_x, cam.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # M = J @ W : two rows of (N,) components
    m00 = j00 * w00 + j02 * w20
    m01 = j00 * w01 + j02 * w21
    m02 = j00 * w02 + j02 * w22
    m10 = j11 * w10 + j12 * w20
    m11 = j11 * w11 + j12 * w21
    m12 = j11 * w12 + j12 * w22

    # S = M @ Sigma (rows), then cov2d = S @ M^T
    s00 = m00 * c0 + m01 * c1 + m02 * c2
    s01 = m00 * c1 + m01 * c3 + m02 * c4
    s02 = m00 * c2 + m01 * c4 + m02 * c5
    s10 = m10 * c0 + m11 * c1 + m12 * c2
    s11 = m10 * c1 + m11 * c3 + m12 * c4
    s12 = m10 * c2 + m11 * c4 + m12 * c5
    cov_xx = s00 * m00 + s01 * m01 + s02 * m02 + 0.3
    cov_xy = s00 * m10 + s01 * m11 + s02 * m12
    cov_yy = s10 * m10 + s11 * m11 + s12 * m12 + 0.3
    return cov_xx, cov_xy, cov_yy


def compute_cov2d(p_orig: jax.Array, cov3d: jax.Array, cam: Camera,
                  in_front: Optional[jax.Array] = None):
    """Stacked-layout wrapper over _cov2d_scalar: (N, 3) points +
    (N, 6) packed cov3d -> (N, 3) packed (cov_xx, cov_xy, cov_yy)."""
    x, y, z = p_orig[:, 0], p_orig[:, 1], p_orig[:, 2]
    cov = tuple(cov3d[:, i] for i in range(6))
    inf = jnp.ones_like(x, bool) if in_front is None else in_front
    cov_xx, cov_xy, cov_yy = _cov2d_scalar(x, y, z, cov, cam, inf)
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def _sh_color_scalar(deg: int, features, dx, dy, dz):
    """SH -> RGB over (N,) components (ref:cuda_rasterizer/forward.cu:
    20-71): basis polynomials in the view direction, per-channel FMA
    chain over the (16, 3, N) transposed coefficients, +0.5 and clamp.
    The ReLU derivative reproduces the CUDA clamp mask backward."""
    f = features.transpose(1, 2, 0)        # (B, 3, N) one transpose
    basis = [jnp.full_like(dx, C0)]
    if deg > 0:
        basis += [-C1 * dy, C1 * dz, -C1 * dx]
        if deg > 1:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            basis += [
                C2[0] * dx * dy,
                C2[1] * dy * dz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * dx * dz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    C3[0] * dy * (3.0 * xx - yy),
                    C3[1] * dx * dy * dz,
                    C3[2] * dy * (4.0 * zz - xx - yy),
                    C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    C3[4] * dx * (4.0 * zz - xx - yy),
                    C3[5] * dz * (xx - yy),
                    C3[6] * dx * (xx - 3.0 * yy),
                ]
    chans = []
    for c in range(3):
        acc = basis[0] * f[0, c]
        for k in range(1, len(basis)):
            acc = acc + basis[k] * f[k, c]
        chans.append(jnp.maximum(acc + 0.5, 0.0))
    return chans


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
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    # view/clip transforms as explicit FMA rows (see module docstring)
    P = cam.full_proj
    pc0 = P[0, 0] * x + P[0, 1] * y + P[0, 2] * z + P[0, 3]
    pc1 = P[1, 0] * x + P[1, 1] * y + P[1, 2] * z + P[1, 3]
    pc3 = P[3, 0] * x + P[3, 1] * y + P[3, 2] * z + P[3, 3]
    V = cam.world_view
    p_view_z = V[2, 0] * x + V[2, 1] * y + V[2, 2] * z + V[2, 3]

    in_front = p_view_z > NEAR_Z  # ref:auxiliary.h:154

    # safe-where the perspective division: culled rows (w ~ 0) must not
    # leak NaN into the backward pass (see _cov2d_scalar docstring)
    p_w = 1.0 / jnp.where(in_front, pc3 + 1e-7, 1.0)

    if cov3d_precomp is None:
        cov = _cov3d_scalar(scene.scaling, scene.rotation,
                            scaling_modifier)
    else:
        cov = tuple(cov3d_precomp[:, i] for i in range(6))
    cov_xx, cov_xy, cov_yy = _cov2d_scalar(x, y, z, cov, cam,
                                           in_front)

    det = cov_xx * cov_yy - cov_xy * cov_xy
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic_a = cov_yy * det_inv
    conic_b = -cov_xy * det_inv
    conic_c = cov_xx * det_inv

    mid = 0.5 * (cov_xx + cov_yy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + disc  # >= mid - disc always
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    radius = radius_f.astype(jnp.int32)

    opacity = jax.nn.sigmoid(scene.opacity[:, 0])
    # Opacity-aware BINNING radius (the reported `radius` above stays
    # at the reference's 3*sigma for densify-stat parity): a pixel only
    # blends when alpha = opa * exp(-q/2) >= 1/255, i.e. q <= 2 ln(255
    # opa), and |d|^2 <= q * lam_max on the level set — so tiles
    # beyond r_bin = sqrt(min(9, 2 ln(255 opa)) * lam_max) hold pixels
    # the CUDA kernel walks but ALWAYS skips
    # (ref:cuda_rasterizer/forward.cu:336-344 alpha < 1/255 continue).
    # Dropping those instances is output-exact and shrinks every
    # M-scaled stage (binning, pack, kernel walks, gradient scatter).
    # The min(9, .) keeps the 3-sigma cap: the reference's rect never
    # exceeds 3 sigma even when opacity could push alpha past 1/255
    # farther out, and exceeding it would ADD pixels the reference
    # structurally excludes. The tiny (1 + 1e-6) guard absorbs fp32
    # rounding differences between this bound and the kernel's own
    # per-pixel power evaluation.
    # (q_cut <= 0 iff opa <= 1/255: the whole Gaussian is sub-threshold
    # everywhere; r_bin = 0 still bins the ~1-tile rect around the
    # center, and the blend's per-pixel alpha >= 1/255 test skips it.)
    q_cut = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)
    r_bin = jnp.ceil(jnp.sqrt(
        jnp.minimum(9.0, jnp.maximum(q_cut, 0.0) * (1.0 + 1e-6))
        * jnp.maximum(lam_max, 0.0)))

    px = ndc2pix(pc0 * p_w, cam.width)
    py = ndc2pix(pc1 * p_w, cam.height)

    # Tile rect (ref:auxiliary.h:46-56), from the opacity-aware binning
    # radius. C int-cast truncates toward zero, but negatives clamp to
    # 0 anyway, so floor+clip is equivalent.
    inv_t = 1.0 / TILE
    rmin_x = jnp.clip(jnp.floor((px - r_bin) * inv_t).astype(jnp.int32),
                      0, grid_x)
    rmin_y = jnp.clip(jnp.floor((py - r_bin) * inv_t).astype(jnp.int32),
                      0, grid_y)
    rmax_x = jnp.clip(jnp.floor((px + r_bin + TILE - 1) * inv_t)
                      .astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(jnp.floor((py + r_bin + TILE - 1) * inv_t)
                      .astype(jnp.int32), 0, grid_y)
    area = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    # validity/radius keep the reference's 3-sigma rect semantics
    # (ref:forward.cu:191-195): a Gaussian whose 3-sigma rect is on
    # screen stays `valid` (and reports its radius to the densify
    # stats) even when its sub-threshold rect binned zero tiles.
    a3_x = (jnp.clip(jnp.floor((px + radius_f + TILE - 1) * inv_t)
                     .astype(jnp.int32), 0, grid_x)
            - jnp.clip(jnp.floor((px - radius_f) * inv_t)
                       .astype(jnp.int32), 0, grid_x))
    a3_y = (jnp.clip(jnp.floor((py + radius_f + TILE - 1) * inv_t)
                     .astype(jnp.int32), 0, grid_y)
            - jnp.clip(jnp.floor((py - radius_f) * inv_t)
                       .astype(jnp.int32), 0, grid_y))

    valid = scene.valid & in_front & det_ok & (a3_x * a3_y > 0)
    radius = jnp.where(valid, radius, 0)
    tiles = jnp.where(valid, area, 0)

    # EXACT per-cell overlap counting for small rects (see the
    # Splats.cell_sel docstring). Evaluates the same ellipse/tile test
    # the binning stream applies per instance, but per CELL of the
    # <= 3x3 rect, at Gaussian (not instance) scale — so the instance
    # budget is sized by what actually bins instead of the rect area.
    w_r = rmax_x - rmin_x
    h_r = rmax_y - rmin_y
    pd = (conic_a > 0.0) & (conic_c > 0.0) \
        & (conic_a * conic_c - conic_b * conic_b > 0.0)
    small = (w_r <= 3) & (h_r <= 3) & pd
    qc = jnp.maximum(q_cut, 0.0) * (1.0 + 1e-6)
    cnt = jnp.zeros_like(area)
    sel_lo = jnp.zeros_like(px)
    sel_hi = jnp.zeros_like(px)
    for j in range(9):
        dxc, dyc = j % 3, j // 3
        tx = rmin_x + dxc
        ty = rmin_y + dyc
        lx = (tx * TILE).astype(jnp.float32) - px
        ly = (ty * TILE).astype(jnp.float32) - py
        ok_j = (dxc < w_r) & (dyc < h_r) & (
            cell_min_q(lx, lx + (TILE - 1), ly, ly + (TILE - 1),
                       conic_a, conic_b, conic_c) <= qc)
        # pack cell index j as the cnt-th nibble (ldexp is exact)
        nib = jnp.ldexp(jnp.float32(j), 4 * jnp.minimum(cnt, 5))
        nib_hi = jnp.ldexp(jnp.float32(j),
                           4 * jnp.maximum(cnt - 6, 0))
        sel_lo = sel_lo + jnp.where(ok_j & (cnt < 6), nib, 0.0)
        sel_hi = sel_hi + jnp.where(ok_j & (cnt >= 6), nib_hi, 0.0)
        cnt = cnt + ok_j.astype(jnp.int32)
    tiles = jnp.where(small, jnp.where(valid, cnt, 0), tiles)
    cell_sel = jnp.where(small[:, None],
                         jnp.stack([sel_lo, sel_hi], axis=-1), -1.0)

    if override_color is not None:
        color = override_color
    else:
        # direction from camera to the Gaussian mean, normalized
        cc = cam.camera_center
        dx, dy, dz = x - cc[0], y - cc[1], z - cc[2]
        inv_n = 1.0 / jnp.maximum(
            jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-12)
        dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n
        r, g, b = _sh_color_scalar(scene.active_sh_degree,
                                   scene.get_features(), dx, dy, dz)
        color = jnp.stack([r, g, b], axis=-1)

    return Splats(
        mean2d=jnp.stack([px, py], axis=-1),
        depth=p_view_z,
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        opacity=opacity,
        color=color,
        semantics=scene.get_semantics(semantic_masks),
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tiles,
        valid=valid,
        cell_sel=cell_sel,
    )
