"""Tile binning: duplicate Gaussians into the tiles they touch, ordered
by (tile, depth).

TPU re-design of the CUDA pipeline (CUB prefix scan + duplicateWithKeys +
64-bit radix sort + identifyTileRanges,
ref:cuda_rasterizer/rasterizer_impl.cu:35-138,279-322):

- Expand instances in Gaussian-INDEX order (no standalone depth
  argsort — depth rides the instance sort below as a second key). The
  slot->Gaussian mapping is a scatter + cummax (marking each Gaussian's
  first slot, then a running max) — an associative scan instead of the
  binary-search `searchsorted`, which costs log(P) serialized gather
  rounds on TPU.
- Per-instance attributes come from ONE fused row-gather of a packed
  per-Gaussian int matrix (TPU gathers amortize over contiguous rows).
- Instances sort by a stable two-key (tile, depth-bits) lexicographic
  sort with the Gaussian id as payload; stability breaks (tile, depth)
  ties by expansion-stream order — the same order as the CUDA stable
  radix sort over [tileID|depth] keys (ref:rasterizer_impl.cu:279-322).
- XLA needs static shapes: the instance buffer is a fixed
  `max_instances` budget. On overflow the expansion stream truncates at
  the budget, dropping the instances of the HIGHEST Gaussian indices
  (arbitrary scene content — not the deepest); `num_slots` reports the
  true demand so training loops detect the overflow and rebudget
  (train/rgb.py, train/distill.py). Padding carries a sentinel tile id.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

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
    num_slots: jax.Array    # () int32 buffer slots DEMANDED incl. alignment
    #                         padding; num_slots > max_instances <=> some
    #                         instances were truncated (overflow detector)
    # --- optional (bin_splats(export_perm=True), align > 0 only):
    # the expansion-stream view of the sort, for sorted-key gradient
    # reductions. stream_pos[i] = aligned buffer slot of expansion
    # instance i (2^30 sentinel when dropped); stream_gid[i] = its
    # Gaussian id — MONOTONE non-decreasing (gaussian-index-major
    # expansion), which is what makes a sorted segment-sum applicable.
    stream_pos: Optional[jax.Array] = None   # (max_instances,) int32
    stream_gid: Optional[jax.Array] = None   # (max_instances,) int32


@partial(jax.jit, static_argnames=("grid_x", "grid_y"))
def tile_counts(sp: Splats, *, grid_x: int, grid_y: int) -> jax.Array:
    """Exact per-tile instance counts WITHOUT expanding instances: each
    valid Gaussian adds +1 over its tile rect via a 2D difference array
    followed by a 2D cumsum (O(N + tiles) instead of O(instances)).
    Used to size instance budgets incl. per-tile alignment padding."""
    one = jnp.where(sp.valid & (sp.tiles_touched > 0), 1, 0) \
        .astype(jnp.int32)
    x0, y0 = sp.rect_min[:, 0], sp.rect_min[:, 1]
    x1, y1 = sp.rect_max[:, 0], sp.rect_max[:, 1]
    diff = jnp.zeros((grid_y + 1, grid_x + 1), jnp.int32)
    diff = diff.at[y0, x0].add(one)
    diff = diff.at[y0, x1].add(-one)
    diff = diff.at[y1, x0].add(-one)
    diff = diff.at[y1, x1].add(one)
    counts = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)
    return counts[:grid_y, :grid_x].reshape(-1)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "max_instances",
                                   "align", "export_perm"))
def bin_splats(sp: Splats, *, grid_x: int, grid_y: int,
               max_instances: int, align: int = 0,
               export_perm: bool = False) -> Binning:
    """align > 0 pads every tile's segment start to a multiple of
    `align` slots (sentinel-filled gaps) so fixed-size chunk walks in the
    Pallas kernels never cross a tile boundary. The instance buffer must
    then budget for up to num_tiles*align extra slots."""
    num_tiles = grid_x * grid_y
    n_inst = max_instances

    # 1) expand instances in Gaussian-INDEX order. No standalone depth
    # argsort: the depth ordering rides the instance sort below as a
    # second lexicographic key — an N-sized XLA sort costs ~2.6 ms at
    # N=100k, and fusing it also shrinks the per-instance info gather
    # (gid == g_stream in index order).
    counts = sp.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(counts)
    base = offsets - counts
    total = offsets[-1]

    # packed per-Gaussian info for one fused row gather:
    # [rect(10b x0 | 10b y0 | 10b w), base, depth-bits] — the rect
    # packs into one int32 (10 bits each supports 1024-tile grids =
    # 16k-pixel frames). Valid depths are positive (near-plane culled),
    # so their fp32 bit pattern is order-preserving as int32.
    assert grid_x <= 1024 and grid_y <= 1024, "rect packing is 10-bit"
    # width is stored as w-1 (0..1023): a full-frame Gaussian on a
    # 1024-wide grid has w == 1024, which would overflow a raw 10-bit
    # field into y0 and make the % / // below divide by zero
    rect = (sp.rect_min[:, 0] << 20) | (sp.rect_min[:, 1] << 10) | \
        (jnp.maximum(sp.rect_max[:, 0] - sp.rect_min[:, 0], 1) - 1)
    depth_bits = jax.lax.bitcast_convert_type(
        sp.depth.astype(jnp.float32), jnp.int32)
    info = jnp.stack([rect, base, depth_bits], axis=1)

    # 2) slot -> Gaussian index: mark first slot of each Gaussian,
    # then cummax (marks are increasing along the stream).
    slots = jnp.arange(n_inst, dtype=jnp.int32)
    g_idx = jnp.arange(counts.shape[0], dtype=jnp.int32)
    mark = jnp.zeros(n_inst, jnp.int32).at[
        jnp.where(counts > 0, base, n_inst)].set(g_idx, mode="drop")
    g_stream = jax.lax.cummax(mark)

    # g_stream is a cummax => monotone non-decreasing, always in
    # [0, P): the sorted/in-bounds hints let XLA emit a sequential
    # run-expansion instead of a random-access gather
    inst_info = info.at[g_stream].get(
        indices_are_sorted=True, mode="promise_in_bounds")  # (n_inst, 3)
    rect_i = inst_info[:, 0]
    local = slots - inst_info[:, 1]
    # row-major walk of the rect, matching duplicateWithKeys' y-outer
    # x-inner loop (ref:rasterizer_impl.cu:70-95).
    w_i = (rect_i & 0x3FF) + 1
    tx = (rect_i >> 20) + local % w_i
    ty = ((rect_i >> 10) & 0x3FF) + local // w_i
    in_range = slots < total
    tile = jnp.where(in_range, ty * grid_x + tx, num_tiles)

    # 3) ONE stable two-key lexicographic sort by (tile, depth) with
    # the Gaussian id payload — the TPU shape of the CUDA 64-bit
    # [tileID | depth] radix sort (ref:rasterizer_impl.cu:279-322).
    # Stability makes equal (tile, depth) pairs fall back to the
    # expansion stream's Gaussian-index order, exactly like the
    # reference's stable radix over its duplicateWithKeys stream.
    if export_perm:
        assert align, "export_perm requires the aligned (pallas) layout"
        tile_sorted, _, gid, stream_sorted = jax.lax.sort(
            (tile, inst_info[:, 2], g_stream, slots), num_keys=2,
            is_stable=True)
    else:
        tile_sorted, _, gid = jax.lax.sort(
            (tile, inst_info[:, 2], g_stream), num_keys=2,
            is_stable=True)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tids,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tids,
                            side="right").astype(jnp.int32)

    if align:
        # re-scatter each tile's contiguous run to an align-rounded start
        counts_t = ends - starts
        seg = jnp.ceil(counts_t / align).astype(jnp.int32) * align
        seg_cum = jnp.cumsum(seg)
        a_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   seg_cum[:-1]]).astype(jnp.int32)
        a_end = a_start + counts_t
        # fused (T, 2) lut gather: aligned start & unaligned start.
        # tile_clipped rides the sort => non-decreasing, in [0, T)
        lut = jnp.stack([a_start, starts], axis=1)
        tile_clipped = jnp.minimum(tile_sorted, num_tiles - 1)
        lrow = lut.at[tile_clipped].get(indices_are_sorted=True,
                                        mode="promise_in_bounds")
        rank = jnp.arange(n_inst, dtype=jnp.int32) - lrow[:, 1]
        pos = lrow[:, 0] + rank
        ok = tile_sorted < num_tiles
        # valid pos is STRICTLY increasing (rank increases within a
        # tile, aligned starts increase across tiles); sentinel rows
        # are the sorted tail — a 2^30 sentinel keeps the whole index
        # stream sorted and out-of-bounds (mode="drop" discards it)
        pos = jnp.where(ok, pos, jnp.int32(2 ** 30))
        gid_aligned = jnp.full_like(gid, -1).at[pos].set(
            gid, mode="drop", indices_are_sorted=True)
        # clamp ranges into the (static) buffer: overflow truncates
        # instances of the highest-index tiles (the CUDA version cannot
        # overflow — it allocates exactly; rebudget-on-overflow is the
        # training-loop safety net here). The
        # ALIGNED demand (seg_cum[-1]) is reported in num_slots so
        # callers can detect truncation — the alignment padding can
        # overflow the buffer even when the raw count fits.
        cap = jnp.int32(n_inst)
        a_start = jnp.minimum(a_start, cap)
        a_end = jnp.minimum(a_end, cap)
        spos = sgid = None
        if export_perm:
            # invert the sort: expansion-stream index -> aligned slot
            # (2^30 sentinel for instances the clamp dropped and the
            # padding tail — both stay un-set via mode='drop')
            spos = jnp.full(n_inst, 2 ** 30, jnp.int32).at[
                jnp.where(ok & (pos < n_inst), stream_sorted, n_inst)
            ].set(pos, mode="drop")
            sgid = g_stream
        return Binning(point_list=gid_aligned, tile_start=a_start,
                       tile_end=a_end, num_instances=total,
                       num_slots=seg_cum[-1], stream_pos=spos,
                       stream_gid=sgid)

    return Binning(point_list=gid, tile_start=starts, tile_end=ends,
                   num_instances=total, num_slots=total)
