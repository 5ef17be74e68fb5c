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
- An exact ellipse/tile overlap test culls rect instances no pixel of
  the tile can ever blend (alpha < 1/255 across the whole tile box) —
  output-exact, and shrinks every instance-scaled downstream stage.
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

from goi_tpu.raster.preprocess import TILE, Splats, cell_min_q


def _decode_cell(sel_lo, sel_hi, local, x0, y0, w_i):
    """Instance-local index -> tile coords. Exact-count Gaussians
    (cell_sel >= 0, preprocess counted only passing cells of a <= 3x3
    rect) read the local-th nibble of the packed select table — the
    flat 3x3 cell index of the local-th passing cell; fallback
    Gaussians (sel_lo < 0: big rects, non-PSD conics, resliced shards)
    keep the rect row-major walk (matching duplicateWithKeys,
    ref:cuda_rasterizer/rasterizer_impl.cu:70-95) with the in-stream
    cull as their filter."""
    fb = sel_lo < 0.0
    packed = jnp.where(local < 6, sel_lo, sel_hi)
    shift = jnp.where(local < 6, local, local - 6)
    # nibble extract in exact f32 arithmetic (values < 16^6 < 2^24)
    sh = jnp.clip(shift, 0, 5)
    c = jnp.floor(packed * jnp.ldexp(jnp.float32(1), -4 * sh))
    c = (c - 16.0 * jnp.floor(c / 16.0)).astype(jnp.int32)
    c = jnp.clip(c, 0, 8)
    tx_f = x0 + local % w_i
    ty_f = y0 + local // w_i
    tx = jnp.where(fb, tx_f, x0 + c % 3)
    ty = jnp.where(fb, ty_f, y0 + c // 3)
    return tx, ty


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Binning:
    point_list: jax.Array   # (max_instances,) int32 Gaussian ids, tile-major
    tile_start: jax.Array   # (num_tiles,) int32 start offset per tile
    tile_end: jax.Array     # (num_tiles,) int32 end offset (exclusive)
    num_instances: jax.Array  # () int32 raw rect instance count (may exceed budget)
    num_slots: jax.Array    # () int32 buffer slots DEMANDED: max of the
    #                         aligned post-cull demand and the raw rect
    #                         expansion demand; num_slots > max_instances
    #                         <=> some instances were truncated
    #                         (single overflow detector for both stages)
    # --- optional (bin_splats(export_perm=True), align > 0 only):
    # the expansion-stream view of the sort, for sorted-key gradient
    # reductions. stream_pos[i] = aligned buffer slot of expansion
    # instance i (2^30 sentinel when dropped); stream_gid[i] = its
    # Gaussian id — MONOTONE non-decreasing (gaussian-index-major
    # expansion), which is what makes a sorted segment-sum applicable.
    stream_pos: Optional[jax.Array] = None   # (max_instances,) int32
    stream_gid: Optional[jax.Array] = None   # (max_instances,) int32
    # --- chunked layout only (bin_splats_chunked): exclusive prefix of
    # per-tile CHUNK counts for the backward's per-(tile,chunk) output
    # rows. Presence marks the chunked (unaligned floor-walk) layout:
    # tile segments are contiguous in the sorted stream (no alignment
    # gaps); kernels walk K-aligned windows from (start//K)*K and mask
    # lanes outside [start, end).
    chunk_base: Optional[jax.Array] = None   # (num_tiles,) int32
    # chunked + export_perm: sort_slots[p] = EXPANSION index of the
    # instance at sorted position p (the sort permutation, carried as a
    # payload). The chain gradient reduction inverts it lazily in the
    # backward to map expansion order -> backward row index.
    sort_slots: Optional[jax.Array] = None   # (max_instances,) int32
    # chunked + export_perm: g_stream[r] = Gaussian owning expansion
    # slot r (already computed for the expansion's table gather; round
    # 5 exports it so the chain reduce derives its dense segment-start
    # indicators by one diff instead of a 1M-row scatter).
    g_stream: Optional[jax.Array] = None     # (max_instances,) int32


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


def _expand_instances(sp: Splats, *, grid_x: int, grid_y: int,
                      n_inst: int, cull: bool = True):
    """Expand Gaussians into per-tile instances in Gaussian-INDEX order.
    Returns (tile, g_stream, depth_bits, total): the instance's tile id
    (num_tiles sentinel for padding and culled instances), its Gaussian
    id (monotone non-decreasing), depth sort bits, and the RAW rect
    instance count.

    No standalone depth argsort: the depth ordering rides the caller's
    instance sort as a second lexicographic key — an N-sized XLA sort
    costs ~2.6 ms at N=100k, and fusing it also shrinks the
    per-instance info gather (gid == g_stream in index order).

    cull=True applies the exact ellipse/tile overlap test: an instance
    whose tile box lies entirely outside the Gaussian's alpha >= 1/255
    level set is re-tiled to the sentinel. The CUDA kernel walks those
    pixels but skips every one (alpha < 1/255 continue,
    ref:cuda_rasterizer/forward.cu:336-344), so dropping the instance
    is output-exact while shrinking every instance-scaled stage
    (segments, pack, kernel chunk walks, gradient reduction) —
    measured ~16% of rect instances on an isotropic random scene, more
    on anisotropic real scenes (a thin ellipse's rect is mostly empty
    corners)."""
    num_tiles = grid_x * grid_y
    counts = sp.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(counts)
    base = offsets - counts
    total = offsets[-1]

    # packed per-Gaussian info for one fused row gather:
    # [rect(10b x0 | 10b y0 | 10b w), base, depth-bits, then the
    # bitcast float columns the overlap test needs]. The rect packs
    # into one int32 (10 bits each supports 1024-tile grids = 16k-pixel
    # frames). Valid depths are positive (near-plane culled), so their
    # fp32 bit pattern is order-preserving as int32.
    assert grid_x <= 1024 and grid_y <= 1024, "rect packing is 10-bit"
    # width is stored as w-1 (0..1023): a full-frame Gaussian on a
    # 1024-wide grid has w == 1024, which would overflow a raw 10-bit
    # field into y0 and make the % / // below divide by zero
    rect = (sp.rect_min[:, 0] << 20) | (sp.rect_min[:, 1] << 10) | \
        (jnp.maximum(sp.rect_max[:, 0] - sp.rect_min[:, 0], 1) - 1)
    depth_bits = jax.lax.bitcast_convert_type(
        sp.depth.astype(jnp.float32), jnp.int32)
    cols = [rect, base, depth_bits,
            jax.lax.bitcast_convert_type(
                sp.cell_sel[:, 0].astype(jnp.float32), jnp.int32),
            jax.lax.bitcast_convert_type(
                sp.cell_sel[:, 1].astype(jnp.float32), jnp.int32)]
    if cull:
        # alpha >= 1/255 <=> Q <= q_cut, Q the conic quadratic form;
        # same cutoff/guard as the opacity-aware binning radius
        # (raster/preprocess.py r_bin)
        q_cut = jnp.maximum(
            2.0 * jnp.log(jnp.maximum(sp.opacity, 1e-12) * 255.0), 0.0
        ) * (1.0 + 1e-6)
        fcols = [sp.mean2d[:, 0], sp.mean2d[:, 1], sp.conic[:, 0],
                 sp.conic[:, 1], sp.conic[:, 2], q_cut]
        cols += [jax.lax.bitcast_convert_type(
            c.astype(jnp.float32), jnp.int32) for c in fcols]
    info = jnp.stack(cols, axis=1)

    # slot -> Gaussian index: mark first slot of each Gaussian,
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
        indices_are_sorted=True, mode="promise_in_bounds")
    rect_i = inst_info[:, 0]
    local = slots - inst_info[:, 1]
    # row-major rect walk for fallback Gaussians (matching
    # duplicateWithKeys' y-outer x-inner loop,
    # ref:rasterizer_impl.cu:70-95); packed-nibble cell select for
    # exact-count Gaussians (see _decode_cell)
    w_i = (rect_i & 0x3FF) + 1
    tx, ty = _decode_cell(
        jax.lax.bitcast_convert_type(inst_info[:, 3], jnp.float32),
        jax.lax.bitcast_convert_type(inst_info[:, 4], jnp.float32),
        local, rect_i >> 20, (rect_i >> 10) & 0x3FF, w_i)
    in_range = slots < total
    keep = in_range
    if cull:
        fx = jax.lax.bitcast_convert_type(inst_info[:, 5:11],
                                          jnp.float32)
        px, py = fx[:, 0], fx[:, 1]
        ca, cb, cc = fx[:, 2], fx[:, 3], fx[:, 4]
        qc = fx[:, 5]
        # Tile box in the kernel's pixel coordinates (integer pixel
        # centers tx*16 .. tx*16+15), relative to the Gaussian mean.
        # Q(d) = ca dx^2 + 2 cb dx dy + cc dy^2 is symmetric under
        # d -> -d, so the sign convention vs the kernel's (mean - pix)
        # is immaterial.
        lx = (tx * TILE).astype(jnp.float32) - px
        ly = (ty * TILE).astype(jnp.float32) - py
        min_q = cell_min_q(lx, lx + (TILE - 1), ly, ly + (TILE - 1),
                           ca, cb, cc)
        # non-positive-definite conics (det <= 0 never blends a pixel:
        # the kernel's power <= 0 test): keep, stay conservative
        pd = (ca > 0.0) & (cc > 0.0) & (ca * cc - cb * cb > 0.0)
        keep = keep & ((min_q <= qc) | ~pd)
    tile = jnp.where(keep, ty * grid_x + tx, num_tiles)
    return tile, g_stream, inst_info[:, 2], total


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "max_instances"))
def exact_tile_counts(sp: Splats, *, grid_x: int, grid_y: int,
                      max_instances: int) -> jax.Array:
    """Per-tile instance counts AFTER the exact overlap cull (what
    bin_splats actually bins). Needs an expansion buffer covering the
    RAW rect demand (max_instances >= sum(tiles_touched)); used by
    suggest_instance_budget to size the aligned buffer exactly."""
    tile, _, _, _ = _expand_instances(
        sp, grid_x=grid_x, grid_y=grid_y, n_inst=max_instances)
    num_tiles = grid_x * grid_y
    ones = jnp.where(tile < num_tiles, 1, 0)
    return jax.ops.segment_sum(ones, jnp.minimum(tile, num_tiles - 1),
                               num_segments=num_tiles)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "max_instances",
                                   "align", "export_perm", "cull",
                                   "binned_slots"))
def bin_splats(sp: Splats, *, grid_x: int, grid_y: int,
               max_instances: int, align: int = 0,
               export_perm: bool = False, cull: bool = True,
               binned_slots: Optional[int] = None) -> Binning:
    """align > 0 pads every tile's segment start to a multiple of
    `align` slots (sentinel-filled gaps) so fixed-size chunk walks in the
    Pallas kernels never cross a tile boundary.

    Two independent static sizes (the cull makes them diverge):
    - max_instances sizes the EXPANSION/sort arrays — must cover the raw
      rect demand (sum(tiles_touched)); overflow truncates the expansion
      stream and is reported via num_instances.
    - binned_slots (align path only; default max_instances) sizes the
      ALIGNED instance buffer everything downstream scales with (pack,
      kernel walks, gradient reduction) — must cover the post-cull
      K-aligned demand; overflow clamps tile ranges and is reported via
      num_slots.

    cull=True drops instances whose tile never blends (see
    _expand_instances) — output-exact; cull=False keeps the raw rect
    expansion (the CUDA reference's behavior, for tests/debugging)."""
    num_tiles = grid_x * grid_y
    n_inst = max_instances
    n_binned = binned_slots if binned_slots is not None else n_inst

    tile, g_stream, depth_bits, total = _expand_instances(
        sp, grid_x=grid_x, grid_y=grid_y, n_inst=n_inst, cull=cull)
    slots = jnp.arange(n_inst, dtype=jnp.int32)

    # 3) ONE stable two-key lexicographic sort by (tile, depth) with
    # the Gaussian id payload — the TPU shape of the CUDA 64-bit
    # [tileID | depth] radix sort (ref:rasterizer_impl.cu:279-322).
    # Stability makes equal (tile, depth) pairs fall back to the
    # expansion stream's Gaussian-index order, exactly like the
    # reference's stable radix over its duplicateWithKeys stream.
    if export_perm:
        assert align, "export_perm requires the aligned (pallas) layout"
        tile_sorted, _, gid, stream_sorted = jax.lax.sort(
            (tile, depth_bits, g_stream, slots), num_keys=2,
            is_stable=True)
    else:
        tile_sorted, _, gid = jax.lax.sort(
            (tile, depth_bits, g_stream), num_keys=2,
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
        gid_aligned = jnp.full(n_binned, -1, gid.dtype).at[pos].set(
            gid, mode="drop", indices_are_sorted=True)
        # clamp ranges into the (static) buffer: overflow truncates
        # instances of the highest-index tiles (the CUDA version cannot
        # overflow — it allocates exactly; rebudget-on-overflow is the
        # training-loop safety net here). The
        # ALIGNED demand (seg_cum[-1]) is reported in num_slots so
        # callers can detect truncation — the alignment padding can
        # overflow the buffer even when the raw count fits.
        cap = jnp.int32(n_binned)
        a_start = jnp.minimum(a_start, cap)
        a_end = jnp.minimum(a_end, cap)
        spos = sgid = None
        if export_perm:
            # invert the sort: expansion-stream index -> aligned slot
            # (2^30 sentinel for instances the clamp dropped and the
            # padding tail — both stay un-set via mode='drop')
            spos = jnp.full(n_inst, 2 ** 30, jnp.int32).at[
                jnp.where(ok & (pos < n_binned), stream_sorted, n_inst)
            ].set(pos, mode="drop")
            sgid = g_stream
        # num_slots reports the aligned buffer demand; when the two
        # sizes are coupled (binned_slots defaulted) it also folds in
        # the raw expansion demand so the single budget stays safe.
        # With decoupled sizes, check num_instances vs max_instances
        # separately for expansion truncation.
        aligned_demand = seg_cum[-1]
        if binned_slots is None:
            aligned_demand = jnp.maximum(aligned_demand, total)
        return Binning(point_list=gid_aligned, tile_start=a_start,
                       tile_end=a_end, num_instances=total,
                       num_slots=aligned_demand,
                       stream_pos=spos, stream_gid=sgid)

    return Binning(point_list=gid, tile_start=starts, tile_end=ends,
                   num_instances=total, num_slots=total)


# ---------------------------------------------------------------------------
# Chunked (round-3) layout: no realign, no aligned buffer
# ---------------------------------------------------------------------------

def _expand_chunked(sp: Splats, *, grid_x: int, grid_y: int,
                    n_inst: int, cull: bool, use_mono: bool):
    """Expansion for the chunked layout. Differences vs
    _expand_instances:

    - counts' = max(counts, 1): zero-count Gaussians keep ONE sentinel
      slot, which makes the expansion stream's Gaussian ids DENSE
      (every id in any covered range occurs), the precondition for the
      block-diagonal MXU gather (raster/gather.py) that replaces the
      per-element XLA row gather (measured ~15 ms of the round-2
      binning at 2.46M instances).
    - all per-Gaussian columns travel as genuine f32 VALUES (ints
      < 2^24 are f32-exact; depth sort bits are re-derived by bitcast
      AFTER the gather), because the matmul-gather copies real floats
      bit-exactly but would not preserve bitcast-int payloads.

    Returns (tile, g_stream, depth_bits, raw_total, demand) — demand
    includes the forced sentinel slots (the budget must cover it)."""
    num_tiles = grid_x * grid_y
    counts_true = sp.tiles_touched.astype(jnp.int32)
    counts = jnp.maximum(counts_true, 1)
    offsets = jnp.cumsum(counts)
    base = offsets - counts
    demand = offsets[-1]
    raw_total = jnp.sum(counts_true)

    q_cut = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(sp.opacity, 1e-12) * 255.0), 0.0
    ) * (1.0 + 1e-6)
    cols = [
        sp.rect_min[:, 0].astype(jnp.float32),                 # 0 x0
        sp.rect_min[:, 1].astype(jnp.float32),                 # 1 y0
        (jnp.maximum(sp.rect_max[:, 0] - sp.rect_min[:, 0], 1)
         ).astype(jnp.float32),                                # 2 w
        base.astype(jnp.float32),                              # 3 base
        counts_true.astype(jnp.float32),                       # 4 count
        sp.depth.astype(jnp.float32),                          # 5 depth
        sp.mean2d[:, 0], sp.mean2d[:, 1],                      # 6,7
        sp.conic[:, 0], sp.conic[:, 1], sp.conic[:, 2],        # 8-10
        q_cut,                                                 # 11
        sp.cell_sel[:, 0], sp.cell_sel[:, 1],                  # 12,13
    ]
    table = jnp.stack(cols, axis=0)                            # (14, N)

    slots = jnp.arange(n_inst, dtype=jnp.int32)
    g_idx = jnp.arange(counts.shape[0], dtype=jnp.int32)
    mark = jnp.zeros(n_inst, jnp.int32).at[
        jnp.minimum(base, n_inst - 1)].set(g_idx, mode="drop")
    g_stream = jax.lax.cummax(mark)

    if use_mono:
        from goi_tpu.raster.gather import SPAN, monotone_gather
        table_p = jnp.pad(table, ((0, 0), (0, SPAN + 128)))
        rows = monotone_gather(table_p, g_stream)      # (12, M)
    else:
        rows = table[:, g_stream]

    x0 = rows[0].astype(jnp.int32)
    y0 = rows[1].astype(jnp.int32)
    w_i = rows[2].astype(jnp.int32)
    base_i = rows[3].astype(jnp.int32)
    count_i = rows[4].astype(jnp.int32)
    depth_bits = jax.lax.bitcast_convert_type(rows[5], jnp.int32)
    local = slots - base_i
    tx, ty = _decode_cell(rows[12], rows[13], local, x0, y0, w_i)
    keep = (slots < demand) & (local < count_i)
    if cull:
        px, py = rows[6], rows[7]
        ca, cb, cc = rows[8], rows[9], rows[10]
        qc = rows[11]
        lx = (tx * TILE).astype(jnp.float32) - px
        ly = (ty * TILE).astype(jnp.float32) - py
        min_q = cell_min_q(lx, lx + (TILE - 1), ly, ly + (TILE - 1),
                           ca, cb, cc)
        pd = (ca > 0.0) & (cc > 0.0) & (ca * cc - cb * cb > 0.0)
        keep = keep & ((min_q <= qc) | ~pd)
    tile = jnp.where(keep, ty * grid_x + tx, num_tiles)
    return tile, g_stream, depth_bits, raw_total, demand


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "max_instances",
                                   "chunk_k", "cull", "use_mono",
                                   "export_perm"))
def bin_splats_chunked(sp: Splats, *, grid_x: int, grid_y: int,
                       max_instances: int, chunk_k: int,
                       cull: bool = True,
                       use_mono: Optional[bool] = None,
                       export_perm: bool = False) -> Binning:
    """Round-3 binning layout: ONE contiguous tile-sorted stream, no
    alignment gaps, no realign scatter (the round-2 realign cost ~21 ms
    at 2.46M instances — a per-element XLA sorted scatter plus LUT
    gathers). Kernels instead walk K-aligned windows from
    (start//K)*K and mask lanes outside [start, end); the per-tile
    CHUNK index prefix (chunk_base) gives the backward disjoint output
    rows (adjacent tiles share a boundary stream chunk, so stream-offset
    writes would race).

    Sort order (and therefore blend order) is IDENTICAL to bin_splats:
    stable (tile, depth-bits) with Gaussian-index tie-break
    (ref:cuda_rasterizer/rasterizer_impl.cu:279-322).

    use_mono: block-diagonal MXU gather for the expansion (default: on
    for TPU, off under CPU interpret where the plain gather is fine).
    """
    num_tiles = grid_x * grid_y
    n_inst = max_instances
    if use_mono is None:
        use_mono = jax.default_backend() != "cpu"

    tile, g_stream, depth_bits, raw_total, demand = _expand_chunked(
        sp, grid_x=grid_x, grid_y=grid_y, n_inst=n_inst, cull=cull,
        use_mono=use_mono)

    sort_slots = g_stream_out = None
    if export_perm:
        # carry the expansion index as a payload (~2 ms at 2.4M): the
        # chain reduce's permutation
        slots = jnp.arange(n_inst, dtype=jnp.int32)
        tile_sorted, _, gid, sort_slots = jax.lax.sort(
            (tile, depth_bits, g_stream, slots), num_keys=2,
            is_stable=True)
        g_stream_out = g_stream
    else:
        tile_sorted, _, gid = jax.lax.sort(
            (tile, depth_bits, g_stream), num_keys=2, is_stable=True)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tids,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tids,
                            side="right").astype(jnp.int32)
    walk = (starts // chunk_k) * chunk_k
    nch = jnp.where(ends > starts,
                    (ends - walk + chunk_k - 1) // chunk_k, 0)
    chunk_base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nch)[:-1]]).astype(
        jnp.int32)
    return Binning(point_list=gid, tile_start=starts, tile_end=ends,
                   num_instances=raw_total, num_slots=demand,
                   chunk_base=chunk_base, sort_slots=sort_slots,
                   g_stream=g_stream_out)


def chunk_capacity(max_instances: int, num_tiles: int,
                   chunk_k: int) -> int:
    """Static bound on the total chunk count of a chunked binning:
    every tile adds at most one boundary chunk beyond the stream's
    own ceil(M/K)."""
    return max_instances // chunk_k + num_tiles + 1
