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


def tile_slices(binning: Binning, tile_cap: int, chunk: int):
    """Per-tile padded instance slices, chunked time-major for a scan:
    returns (gid_t, msk_t), each (n_chunks, T, chunk). Pads the column
    axis when tile_cap is not a chunk multiple (the padding columns are
    masked, never blended)."""
    k = jnp.arange(tile_cap, dtype=jnp.int32)
    idx = binning.tile_start[:, None] + k[None, :]               # (T, K)
    in_slice = idx < binning.tile_end[:, None]
    idx = jnp.minimum(idx, binning.point_list.shape[0] - 1)
    gid = binning.point_list[idx]                                 # (T, K)
    num_tiles = gid.shape[0]
    n_chunks = (tile_cap + chunk - 1) // chunk
    pad = n_chunks * chunk - tile_cap
    if pad:
        gid = jnp.pad(gid, ((0, 0), (0, pad)))
        in_slice = jnp.pad(in_slice, ((0, 0), (0, pad)))
    gid_t = jnp.moveaxis(
        gid.reshape(num_tiles, n_chunks, chunk), 1, 0)
    msk_t = jnp.moveaxis(
        in_slice.reshape(num_tiles, n_chunks, chunk), 1, 0)
    return gid_t, msk_t


def chunk_weights(sp: Splats, g, m, xs, ys, t_all, pix_ok=None):
    """Shared per-chunk blend math — power/alpha/skip thresholds and
    the two-transmittance bookkeeping (ref:cuda_rasterizer/forward.cu:
    331-371) — used by both the XLA blend scan and the trace walk so
    the termination rules can never diverge between them.

    g/m: (T, chunk) gathered Gaussian ids + slice mask; xs/ys: (T, P)
    pixel centers; t_all: (T, P) all-valid transmittance carry;
    pix_ok: optional (T, P) pixel validity (tile padding)."""
    xy = sp.mean2d[g]                   # (T, chunk, 2)
    con = sp.conic[g]
    opa = sp.opacity[g]
    dx = xy[:, None, :, 0] - xs[:, :, None]      # (T, P, chunk)
    dy = xy[:, None, :, 1] - ys[:, :, None]
    power = (-0.5 * (con[:, None, :, 0] * dx * dx
                     + con[:, None, :, 2] * dy * dy)
             - con[:, None, :, 1] * dx * dy)
    alpha = jnp.minimum(ALPHA_CLAMP, opa[:, None, :] * jnp.exp(power))
    valid = m[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    if pix_ok is not None:
        valid = valid & pix_ok[:, :, None]
    q = jnp.where(valid, 1.0 - alpha, 1.0)
    p_incl = t_all[:, :, None] * jnp.cumprod(q, axis=-1)
    active = valid & (p_incl >= T_EPS)
    w = jnp.where(active, alpha * p_incl / q, 0.0)  # alpha * T_prev
    return dict(alpha=alpha, valid=valid, q=q, p_incl=p_incl,
                active=active, w=w)


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

    xs, ys = _tile_pixel_coords(grid_x, grid_y)                    # (T, 256)
    gid_t, msk_t = tile_slices(binning, tile_cap, chunk)

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
        col = sp.color[g]
        sem = sp.semantics[g]
        dep = sp.depth[g]

        ck = chunk_weights(sp, g, m, xs, ys, t_all)
        w, q, active, p_incl = (ck["w"], ck["q"], ck["active"],
                                ck["p_incl"])

        # Precision.HIGHEST: DEFAULT truncates both fp32 operands to
        # bf16 per MXU pass on TPU (~0.4% relative color error; the
        # CUDA reference accumulates in full fp32)
        hi = jax.lax.Precision.HIGHEST
        acc_c = acc_c + jnp.einsum("tpk,tkc->tpc", w, col,
                                   precision=hi)
        acc_s = acc_s + jnp.einsum("tpk,tks->tps", w, sem,
                                   precision=hi)
        acc_d = acc_d + jnp.einsum("tpk,tk->tp", w, dep, precision=hi)
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
