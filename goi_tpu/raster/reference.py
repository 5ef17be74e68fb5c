"""Oracle rasterizer: exact, slow, pure-jnp per-pixel blend.

This reproduces the sequential semantics of renderCUDA
(ref:cuda_rasterizer/forward.cu:261-386) in closed form so it can serve
as the golden reference for the fast tiled path and for gradient checks
(it is fully differentiable by jax autodiff):

  for each pixel, over Gaussians sorted by (depth asc, index asc) and
  restricted to those whose tile-rect covers the pixel's tile:
    power = -0.5(A dx^2 + C dy^2) - B dx dy ; skip if power > 0
    alpha = min(0.99, opacity * exp(power)) ; skip if alpha < 1/255
    stop the pixel when T*(1-alpha) < 1e-4 (the stopping splat excluded)
    C += c * alpha * T ; S += s * alpha * T ; D += d * alpha * T
    T *= (1-alpha)
  out_color = C + T*bg ; out_semantic = S (no bg, ref:forward.cu:382)
  out_alpha = 1 - T ; out_depth = D

The sticky early-termination is closed-formed with a masked inclusive
cumulative product: because (1-alpha) <= 1 the unstopped cumprod is
monotone non-increasing, so "first index where T*(1-a) < 1e-4" and
everything after it is exactly {i : cumprod_incl_i < 1e-4}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.raster.preprocess import TILE, preprocess

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_CLAMP = 0.99


def blend_weights(alpha: jax.Array, contrib: jax.Array):
    """Given per-step alphas (..., K) in traversal order and a contribution
    mask, return (weights (...,K), T_final (...,)) implementing the exact
    sequential semantics above. Used by the oracle; the tiled path's
    chunk-level equivalent lives in blend.py chunk_weights."""
    valid = contrib & (alpha >= ALPHA_MIN)
    q = jnp.where(valid, 1.0 - alpha, 1.0)
    p_incl = jnp.cumprod(q, axis=-1)
    active = valid & (p_incl >= T_EPS)
    t_prev = p_incl / q  # exclusive cumprod; q >= 1 - 0.99 = 0.01 > 0
    w = jnp.where(active, alpha * t_prev, 0.0)
    t_final = jnp.prod(jnp.where(active, q, 1.0), axis=-1)
    return w, t_final


def render_reference(
    scene: GaussianScene,
    cam: Camera,
    bg_color,
    *,
    scaling_modifier: float = 1.0,
    override_color=None,
    semantic_masks=None,
    mean2d_offset=None,
    row_chunk: int = 16,
):
    """Returns dict(render (3,H,W), semantics (S,H,W), depth (1,H,W),
    alpha (1,H,W), radii (N,)) matching the reference render() output
    contract (ref:gaussian_renderer/__init__.py:99-105).

    semantic_masks / mean2d_offset match render()'s semantics so the
    oracle backend never silently diverges from xla/pallas."""
    import dataclasses as _dc

    H, W = cam.height, cam.width
    sp = preprocess(scene, cam, scaling_modifier=scaling_modifier,
                    override_color=override_color,
                    semantic_masks=semantic_masks)
    if mean2d_offset is not None:
        sp = _dc.replace(sp, mean2d=sp.mean2d + mean2d_offset)

    order = jnp.argsort(jnp.where(sp.valid, sp.depth, jnp.inf),
                        stable=True)
    mean2d = sp.mean2d[order]
    conic = sp.conic[order]
    opac = sp.opacity[order]
    color = sp.color[order]
    sems = sp.semantics[order]
    depth = sp.depth[order]
    rmin = sp.rect_min[order]
    rmax = sp.rect_max[order]
    valid = sp.valid[order]

    bg = jnp.asarray(bg_color, jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    tile_x = (jnp.arange(W) // TILE)

    def render_row(y):
        yf = y.astype(jnp.float32)
        ty = y // TILE
        dx = mean2d[None, :, 0] - xs[:, None]          # (W, K)
        dy = mean2d[None, :, 1] - yf
        a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP, opac * jnp.exp(power))
        in_rect = ((tile_x[:, None] >= rmin[None, :, 0])
                   & (tile_x[:, None] < rmax[None, :, 0])
                   & (ty >= rmin[None, :, 1]) & (ty < rmax[None, :, 1]))
        contrib = valid[None, :] & in_rect & (power <= 0.0)
        w, t_final = blend_weights(alpha, contrib)
        out_c = w @ color + t_final[:, None] * bg[None, :]
        out_s = w @ sems
        out_d = w @ depth
        return out_c, out_s, out_d, 1.0 - t_final

    out_c, out_s, out_d, out_a = jax.lax.map(
        render_row, jnp.arange(H), batch_size=row_chunk)

    return {
        "render": out_c.transpose(2, 0, 1),
        "semantics": out_s.transpose(2, 0, 1),
        "depth": out_d[None],
        "alpha": out_a[None],
        "radii": sp.radius,
        "visibility_filter": sp.radius > 0,
    }
