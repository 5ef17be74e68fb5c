"""Tiled alpha blend: the XLA formulation of renderCUDA.

One 16x16 tile is one unit of work (ref:cuda_rasterizer/config.h:16-17);
each tile blends its depth-ordered instance slice front-to-back with the
same skip/termination rules as the CUDA kernel
(ref:cuda_rasterizer/forward.cu:331-371). Instead of one pixel per
thread, we vectorize (tiles, pixels, chunk) and run a `lax.scan` over
instance chunks carrying per-pixel transmittance — the chunk-level
composition of the closed-form masked cumprod (see
goi_tpu/raster/reference.py). Results are exactly the sequential
semantics, and the whole thing is jax-differentiable: gather VJPs become
deterministic scatter-adds (the TPU replacement for the CUDA backward's
atomicAdd scatter, ref:cuda_rasterizer/backward.cu:565-621).

Per-tile instance slices are padded to a static `tile_cap`; tiles whose
slice exceeds the cap truncate the *farthest* instances (depth order), a
documented deviation bounded by transmittance decay. The Pallas kernel
path removes this cap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from goi_tpu.raster.binning import Binning
from goi_tpu.raster.preprocess import TILE, Splats
from goi_tpu.raster.reference import ALPHA_CLAMP, ALPHA_MIN, T_EPS


def _tile_pixel_coords(grid_x: int, grid_y: int):
    """(T, 256, 2) float pixel centers for every tile."""
    t = jnp.arange(grid_x * grid_y)
    ox = (t % grid_x) * TILE
    oy = (t // grid_x) * TILE
    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)
    xs = ox[:, None] + px[None, :]
    ys = oy[:, None] + py[None, :]
    return xs.astype(jnp.float32), ys.astype(jnp.float32)


@partial(jax.jit,
         static_argnames=("grid_x", "grid_y", "tile_cap", "chunk"))
def blend_tiles(
    sp: Splats,
    binning: Binning,
    bg: jax.Array,
    *,
    grid_x: int,
    grid_y: int,
    tile_cap: int = 4096,
    chunk: int = 64,
):
    """Returns per-tile images:
    color (T, 256, 3), semantics (T, 256, S), depth (T, 256),
    alpha (T, 256)."""
    num_tiles = grid_x * grid_y
    S = sp.semantics.shape[-1]

    # Per-tile padded instance index grid -> Gaussian ids. Clipped gather
    # indices are masked out below.
    k = jnp.arange(tile_cap, dtype=jnp.int32)
    idx = binning.tile_start[:, None] + k[None, :]                # (T, K)
    in_slice = idx < binning.tile_end[:, None]
    idx = jnp.minimum(idx, binning.point_list.shape[0] - 1)
    gid = binning.point_list[idx]                                  # (T, K)

    xs, ys = _tile_pixel_coords(grid_x, grid_y)                    # (T, 256)

    n_chunks = (tile_cap + chunk - 1) // chunk
    gid_c = gid[:, : n_chunks * chunk].reshape(num_tiles, n_chunks, chunk)
    msk_c = in_slice[:, : n_chunks * chunk].reshape(
        num_tiles, n_chunks, chunk)
    # scan over chunks (time-major)
    gid_t = jnp.moveaxis(gid_c, 1, 0)      # (n_chunks, T, chunk)
    msk_t = jnp.moveaxis(msk_c, 1, 0)

    # Rematerialize each chunk in the backward pass instead of saving
    # per-chunk alphas/weights (the CUDA backward makes the same trade:
    # it re-walks the sorted list and recomputes alpha from conic+mean,
    # ref:cuda_rasterizer/backward.cu:530-545). Without this, reverse-mode
    # through the scan stores O(tiles * 256 * chunk) floats per step.
    # The scan carries TWO transmittances per pixel: t_all multiplies the
    # q of EVERY valid instance and drives the T<1e-4 threshold — it is
    # monotone non-increasing, so early termination is sticky across
    # chunks (matching the CUDA done-flag and the oracle's closed form,
    # ref:cuda_rasterizer/forward.cu:349-357); t_cur multiplies only the
    # BLENDED instances' q and is the T composited with the background.
    # Until the stop point the two are equal, so weights computed from
    # t_all are exact.
    @jax.checkpoint
    def step(carry, inp):
        t_all, t_cur, acc_c, acc_s, acc_d = carry
        g, m = inp                          # (T, chunk)
        xy = sp.mean2d[g]                   # (T, chunk, 2)
        con = sp.conic[g]
        opa = sp.opacity[g]
        col = sp.color[g]
        sem = sp.semantics[g]
        dep = sp.depth[g]

        dx = xy[:, None, :, 0] - xs[:, :, None]      # (T, 256, chunk)
        dy = xy[:, None, :, 1] - ys[:, :, None]
        a = con[:, None, :, 0]
        b = con[:, None, :, 1]
        c = con[:, None, :, 2]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP, opa[:, None, :] * jnp.exp(power))

        valid = m[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        q = jnp.where(valid, 1.0 - alpha, 1.0)
        p_incl = t_all[:, :, None] * jnp.cumprod(q, axis=-1)
        active = valid & (p_incl >= T_EPS)
        w = jnp.where(active, alpha * p_incl / q, 0.0)  # alpha * T_prev

        acc_c = acc_c + jnp.einsum("tpk,tkc->tpc", w, col)
        acc_s = acc_s + jnp.einsum("tpk,tks->tps", w, sem)
        acc_d = acc_d + jnp.einsum("tpk,tk->tp", w, dep)
        t_cur = t_cur * jnp.prod(jnp.where(active, q, 1.0), axis=-1)
        t_all = p_incl[:, :, -1]
        return (t_all, t_cur, acc_c, acc_s, acc_d), None

    t0 = jnp.ones((num_tiles, TILE * TILE), jnp.float32)
    acc0 = (t0, t0,
            jnp.zeros((num_tiles, TILE * TILE, 3), jnp.float32),
            jnp.zeros((num_tiles, TILE * TILE, S), jnp.float32),
            jnp.zeros((num_tiles, TILE * TILE), jnp.float32))
    (_, t_final, acc_c, acc_s, acc_d), _ = jax.lax.scan(
        step, acc0, (gid_t, msk_t))

    bg = jnp.asarray(bg, jnp.float32)
    color = acc_c + t_final[:, :, None] * bg[None, None, :]
    return color, acc_s, acc_d, 1.0 - t_final


def tiles_to_image(tiles: jax.Array, grid_x: int, grid_y: int,
                   height: int, width: int) -> jax.Array:
    """(T, 256, C) tile-major -> (C, H, W) image, cropping tile padding."""
    c = tiles.shape[-1]
    img = tiles.reshape(grid_y, grid_x, TILE, TILE, c)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        c, grid_y * TILE, grid_x * TILE)
    return img[:, :height, :width]
