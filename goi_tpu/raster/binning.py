"""Tile binning: duplicate Gaussians into the tiles they touch, ordered
by (tile, depth).

TPU re-design of the CUDA pipeline (CUB prefix scan + duplicateWithKeys +
64-bit radix sort + identifyTileRanges,
ref:cuda_rasterizer/rasterizer_impl.cu:35-138,279-322):

- Instead of packing [tileID|depth-bits] into one 64-bit key and radix
  sorting N instances, we (1) stably sort the P Gaussians by depth once,
  (2) expand instances in that order with a vectorized searchsorted over
  the cumulative tile counts, and (3) stably sort the instances by int32
  tile id. Stability makes per-tile order = (depth asc, Gaussian index
  asc), bit-identical to the CUDA stable radix sort over packed keys
  (positive depths sort identically as floats and as bit patterns).
- XLA needs static shapes, so the instance buffer has a fixed budget
  `max_instances`; overflow instances get the sentinel tile and sort to
  the end (callers can detect overflow via `num_instances`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from goi_tpu.raster.preprocess import Splats


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Binning:
    point_list: jax.Array   # (max_instances,) int32 Gaussian ids, tile-major
    tile_start: jax.Array   # (num_tiles,) int32 start offset per tile
    tile_end: jax.Array     # (num_tiles,) int32 end offset (exclusive)
    num_instances: jax.Array  # () int32 actual instance count (may exceed budget)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "max_instances"))
def bin_splats(sp: Splats, *, grid_x: int, grid_y: int,
               max_instances: int) -> Binning:
    num_tiles = grid_x * grid_y

    # 1) depth sort of Gaussians (stable; invalid to the back).
    order = jnp.argsort(jnp.where(sp.valid, sp.depth, jnp.inf), stable=True)
    counts = sp.tiles_touched[order].astype(jnp.int32)
    rmin = sp.rect_min[order]
    rmax = sp.rect_max[order]

    offsets = jnp.cumsum(counts)           # inclusive
    total = offsets[-1]

    # 2) instance expansion: slot s belongs to sorted-Gaussian g(s).
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32)
    in_range = slots < total
    g_safe = jnp.minimum(g, counts.shape[0] - 1)
    base = jnp.where(g_safe > 0, offsets[jnp.maximum(g_safe - 1, 0)], 0)
    local = slots - base
    # row-major walk of the rect, matching duplicateWithKeys' y-outer
    # x-inner loop (ref:rasterizer_impl.cu:70-95).
    width = jnp.maximum(rmax[g_safe, 0] - rmin[g_safe, 0], 1)
    tx = rmin[g_safe, 0] + local % width
    ty = rmin[g_safe, 1] + local // width
    tile = ty * grid_x + tx
    tile = jnp.where(in_range, tile, num_tiles)  # sentinel for padding

    # 3) stable sort instances by tile id; per-tile order stays depth asc.
    tile_sorted, inst_perm = jax.lax.sort_key_val(
        tile, slots, is_stable=True)
    gid = order[g_safe[inst_perm]].astype(jnp.int32)

    starts = jnp.searchsorted(tile_sorted,
                              jnp.arange(num_tiles, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted,
                            jnp.arange(num_tiles, dtype=jnp.int32),
                            side="right").astype(jnp.int32)

    return Binning(point_list=gid, tile_start=starts, tile_end=ends,
                   num_instances=total)
