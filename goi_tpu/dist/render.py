"""Multi-chip sharded rendering: Gaussian shards x tile slices.

The BASELINE north star: shard tiles/rays and Gaussian primitives
across a TPU slice with per-Gaussian parameter gradients all-reduced
over ICI. Expressed as one shard_map over the mesh's 'model' axis:

  1. each device preprocesses ITS Gaussian shard (N/D rows),
  2. all-gathers the screen-space splat attributes (the ZeRO-style
     param-shard -> activation-gather trade; ~20 floats/Gaussian over
     ICI),
  3. bins + Pallas-blends ONLY its slice of tile rows (the instance
     sort/duplication work also splits ~1/D per device),
  4. returns its image rows; out_specs reassemble the full frame.

Backward through the same program: the all_gather transposes to a
reduce-scatter of splat gradients back to each shard's owner — exactly
the per-Gaussian grad reduction over ICI, scheduled by XLA to overlap
with the blend backward.

The reference is single-GPU (SURVEY.md §2.3); this is new capability.

Round 4: honors `config.layout` — the pallas backend runs the
PRODUCTION chunked layout (floor-walk kernels + chain/transported-key
reduction) per tile slice, so multi-chip and single-chip production
execute the same kernels; 'aligned' remains as the legacy fallback.

Round 4 (memory scaling, VERDICT r3 item 6): exchange="rows" replaces
the full splat all-gather of step 2 with a TILE-ROW-BUCKETED
all_to_all: each device packs, per destination, only the splats whose
screen rect intersects that destination's tile rows, so a device
receives ~N/D rows (+ slice-boundary overlap) instead of all N — peak
per-device splat activation scales ~1/D. This is the SURVEY §5
"partition the pixels x Gaussians axis" design realized spatially
rather than by depth: row bucketing keeps every tile's full
front-to-back blend on ONE device (bit-identical inputs to the
single-device path — no cross-shard (color, T) compositing, no
early-termination-cutoff semantics to re-derive), while the
depth-bucketed ring variant would exchange the same ~N/D rows but pay
partial-frame compositing traffic on top. The all_to_all transposes to
an all_to_all of splat gradients (each row's grad returns to its
owner), so the backward rides ICI exactly like the forward. Packs are
fixed-capacity (static shapes under jit) with deterministic
lowest-global-index-first truncation; the true demand is returned as
`exchange_demand` for rebudget-on-overflow, mirroring the binning
budget contract.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.raster.binning import bin_splats, bin_splats_chunked
from goi_tpu.raster.preprocess import TILE, Splats, preprocess
from goi_tpu.raster.render import RasterConfig, _effective_reduce


def _exchange_rows(sp: Splats, axis: str, n_dev: int, gy_local: int,
                   cap: int):
    """Tile-row-bucketed splat exchange: every device packs, for each
    destination d, its local splats whose screen rect intersects d's
    tile rows [d*gy_local, (d+1)*gy_local), then one all_to_all swaps
    the packs. Returns (Splats with n_dev*cap rows, per-pair demand).

    Pack order is local-index order and packs concatenate source-major,
    so surviving rows keep the GLOBAL index order — the tile sort's
    tie-breaking then matches the single-device path bit-for-bit.
    Overflowing rows (demand > cap) are dropped deterministically
    (highest local index first); callers rebudget off the returned
    demand, mirroring the binning overflow contract."""
    n_loc = sp.valid.shape[0]
    row_lo = sp.rect_min[:, 1]            # tile-row extent [lo, hi)
    row_hi = sp.rect_max[:, 1]
    has_area = sp.valid & (sp.rect_max[:, 0] > sp.rect_min[:, 0]) \
        & (row_hi > row_lo)

    # Batched over destinations (round 5, VERDICT r4 weak #5: the
    # per-destination Python loop emitted O(D) unrolled HLO — a full
    # mask/cumsum/scatter per destination — whose TRACE grows with the
    # mesh; a 'model' axis of 16-64 chips needs D-independent HLO).
    # Total work is unchanged (D x n_loc = N_global rows per device);
    # the (D, n_loc) membership matrix, its row-wise cumsum, and ONE
    # flat scatter replace the loop, so trace/compile cost is constant
    # in D (measured: examples/micro_exchange_pack.py).
    d_ix = jnp.arange(n_dev, dtype=jnp.int32)[:, None]       # (D, 1)
    m = has_area[None, :] & (row_lo[None, :] < (d_ix + 1) * gy_local) \
        & (row_hi[None, :] > d_ix * gy_local)                # (D, n_loc)
    pos = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
    demand = pos[:, -1] + 1                                   # (D,)
    keep = m & (pos < cap)
    # scatter local row index into its pack slot, all destinations in
    # ONE flat scatter (the cap sentinel slot absorbs masked/overflow
    # rows per destination)
    slot = jnp.where(keep, pos, cap) + d_ix * (cap + 1)       # (D, n_loc)
    src = jnp.broadcast_to(jnp.arange(n_loc, dtype=jnp.int32),
                           (n_dev, n_loc))
    idx_all = jnp.zeros(n_dev * (cap + 1), jnp.int32).at[
        slot.reshape(-1)].set(src.reshape(-1), mode="drop") \
        .reshape(n_dev, cap + 1)[:, :cap]                     # (D, cap)
    ok_all = jnp.zeros(n_dev * (cap + 1), jnp.bool_).at[
        slot.reshape(-1)].set(True, mode="drop") \
        .reshape(n_dev, cap + 1)[:, :cap]                     # (D, cap)

    def pack_and_swap(x):
        rows = jnp.where(
            ok_all.reshape(ok_all.shape + (1,) * (x.ndim - 1)),
            x[idx_all.reshape(-1)].reshape((n_dev, cap) + x.shape[1:]),
            0)
        got = jax.lax.all_to_all(rows, axis, split_axis=0,
                                 concat_axis=0, tiled=True)
        return got.reshape((n_dev * cap,) + x.shape[1:])

    # ok_all is already in pack layout — only the swap applies
    valid = jax.lax.all_to_all(ok_all, axis, split_axis=0,
                               concat_axis=0, tiled=True).reshape(-1)
    full = Splats(
        mean2d=pack_and_swap(sp.mean2d),
        depth=pack_and_swap(sp.depth),
        conic=pack_and_swap(sp.conic),
        opacity=pack_and_swap(sp.opacity),
        color=pack_and_swap(sp.color),
        semantics=pack_and_swap(sp.semantics),
        radius=pack_and_swap(sp.radius),
        rect_min=pack_and_swap(sp.rect_min),
        rect_max=pack_and_swap(sp.rect_max),
        tiles_touched=pack_and_swap(sp.tiles_touched),
        valid=valid,
        # exchanged splats get resliced to local tile rows below, so
        # the preprocess-time cell tables no longer apply: force the
        # rect-walk fallback instead of exchanging them
        cell_sel=jnp.full(valid.shape + (2,), -1.0),
    )
    # worst pair demand anywhere on the mesh drives rebudgeting
    return full, jax.lax.pmax(jnp.max(demand), axis)


def render_sharded(
    scene: GaussianScene,
    cam: Camera,
    bg,
    config: RasterConfig,
    mesh: Mesh,
    *,
    axis: str = "model",
    exchange: str = "gather",
    exchange_cap: int | None = None,
):
    """Differentiable sharded render. `scene` arrays must be sharded on
    their leading axis over `axis` (see dist.mesh.shard_scene); the
    camera/bg are replicated. Returns the same dict contract as
    render() (radii/visibility stay shard-local -> gathered).

    exchange: "gather" all-gathers every splat to every device (memory
    ~N/device); "rows" runs the tile-row-bucketed all_to_all (memory
    ~exchange_cap * D = O(N/D) rows/device; adds `exchange_demand` to
    the output dict). exchange_cap is the per-(src,dst) pack capacity —
    default ceil(margin * N_local / D) with margin 2, enough for
    uniformly spread scenes; callers rebudget off `exchange_demand`."""
    n_dev = mesh.shape[axis]
    grid_x = (cam.width + TILE - 1) // TILE
    grid_y = (cam.height + TILE - 1) // TILE
    # auto-pad the tile rows to a multiple of the device count: the
    # padding rows lie below the frame, so no instance ever touches
    # them — trailing devices just blend background-only tiles that the
    # final [:h] slice discards
    grid_y_pad = -(-grid_y // n_dev) * n_dev
    gy_local = grid_y_pad // n_dev
    local_budget = config.max_instances // n_dev

    from goi_tpu.raster.pallas_blend import K as PALLAS_K
    from goi_tpu.raster.pallas_blend import blend_tiles_pallas
    from goi_tpu.raster.blend import blend_tiles, tiles_to_image

    n_local = scene.valid.shape[0] // n_dev
    if exchange == "rows":
        cap = exchange_cap or max(-(-2 * n_local // n_dev), 64)
    elif exchange != "gather":
        raise ValueError(f"unknown exchange {exchange!r}")

    def fn(params, valid, bg):
        # local scene shard
        shard = scene.with_params(params).replace(valid=valid)
        sp = preprocess(shard, cam)

        if exchange == "rows":
            # tile-row-bucketed all_to_all: each device receives only
            # the ~N/D splats touching its rows (module docstring)
            full, demand = _exchange_rows(sp, axis, n_dev, gy_local,
                                          cap)
        else:
            # gather screen-space splats from all shards
            # (differentiable: transpose = reduce-scatter of splat
            # grads over ICI)
            demand = jnp.int32(0)

            def gather(x):
                return jax.lax.all_gather(x, axis, tiled=True)

            full = Splats(
                mean2d=gather(sp.mean2d), depth=gather(sp.depth),
                conic=gather(sp.conic), opacity=gather(sp.opacity),
                color=gather(sp.color), semantics=gather(sp.semantics),
                radius=gather(sp.radius), rect_min=gather(sp.rect_min),
                rect_max=gather(sp.rect_max),
                tiles_touched=gather(sp.tiles_touched),
                valid=gather(sp.valid),
                # resliced below: force the rect-walk fallback (see
                # the rows-exchange note above)
                cell_sel=jnp.full(
                    (sp.valid.shape[0] * n_dev, 2), -1.0),
            )

        # restrict to this device's tile rows [row0, row0 + gy_local)
        m = jax.lax.axis_index(axis)
        row0 = m * gy_local
        rmin_y = jnp.clip(full.rect_min[:, 1] - row0, 0, gy_local)
        rmax_y = jnp.clip(full.rect_max[:, 1] - row0, 0, gy_local)
        area = (full.rect_max[:, 0] - full.rect_min[:, 0]) \
            * (rmax_y - rmin_y)
        local = dataclasses.replace(
            full,
            # blend works in the device's local pixel frame: shift the
            # splat centers up by the slice's row offset
            mean2d=full.mean2d - jnp.array([0.0, row0 * TILE])[None, :],
            rect_min=jnp.stack([full.rect_min[:, 0], rmin_y], -1),
            rect_max=jnp.stack([full.rect_max[:, 0], rmax_y], -1),
            tiles_touched=jnp.where(full.valid, area, 0),
            valid=full.valid & (area > 0),
            cell_sel=jnp.full(full.valid.shape + (2,), -1.0),
        )

        local_ng = jax.tree.map(jax.lax.stop_gradient, local)
        if config.backend == "pallas" and config.layout == "chunked":
            # production (round-3 default) layout, now honored under
            # shard_map (VERDICT r3 item 4): contiguous floor-walk
            # stream + chain/scatter transported-key reduction. The
            # chunked expansion forces one sentinel slot per Gaussian,
            # so the LOCAL budget must cover the full (gathered)
            # Gaussian count plus this slice's instances.
            reduce = _effective_reduce(config)
            binning = bin_splats_chunked(
                local_ng, grid_x=grid_x, grid_y=gy_local,
                max_instances=local_budget, chunk_k=PALLAS_K,
                cull=config.cull, export_perm=(reduce == "chain"))
        elif config.backend == "pallas":
            reduce = "scatter"
            binning = bin_splats(
                local_ng, grid_x=grid_x, grid_y=gy_local,
                max_instances=local_budget, align=PALLAS_K,
                cull=config.cull)
        else:
            binning = bin_splats(
                local_ng, grid_x=grid_x, grid_y=gy_local,
                max_instances=local_budget, align=0, cull=config.cull)

        if config.backend == "pallas":
            color_t, sem_t, depth_t, alpha_t = blend_tiles_pallas(
                local, binning, jnp.asarray(bg, jnp.float32),
                grid_x=grid_x, grid_y=gy_local, reduce=reduce)
        else:
            color_t, sem_t, depth_t, alpha_t = blend_tiles(
                local, binning, jnp.asarray(bg, jnp.float32),
                grid_x=grid_x, grid_y=gy_local,
                tile_cap=config.tile_cap, chunk=config.chunk)

        h_local = gy_local * TILE
        img = tiles_to_image(color_t, grid_x, gy_local,
                             h_local, cam.width)
        sem = tiles_to_image(sem_t, grid_x, gy_local,
                             h_local, cam.width)
        dep = tiles_to_image(depth_t[..., None], grid_x, gy_local,
                             h_local, cam.width)
        alp = tiles_to_image(alpha_t[..., None], grid_x, gy_local,
                             h_local, cam.width)
        # binning overflow demand, pmax'd over the mesh (round 5,
        # VERDICT r4 weak #4: within-shard truncation at local_budget
        # was SILENT in exactly the biggest-scene path; the single-
        # device render()'s num_slots/max_tile_depth rebudget contract
        # now holds shard_map'd too — callers compare num_slots against
        # max_instances // n_dev and regrow, see binning.py docstring)
        num_slots = jax.lax.pmax(binning.num_slots, axis)
        tile_depth = jax.lax.pmax(
            jnp.max(binning.tile_end - binning.tile_start), axis)
        return (img, sem, dep, alp, sp.radius, demand, num_slots,
                tile_depth)

    pspec = {k: P(axis) for k in scene.params()}
    img, sem, dep, alp, radii, demand, num_slots, tile_depth = \
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(pspec, P(axis), P()),
            out_specs=(P(None, axis, None), P(None, axis, None),
                       P(None, axis, None), P(None, axis, None),
                       P(axis), P(), P(), P()),
            check_vma=False,  # pallas shapes carry no vma annotations
        )(scene.params(), scene.valid, jnp.asarray(bg, jnp.float32))

    h = cam.height
    out = {
        "render": img[:, :h], "semantics": sem[:, :h],
        "depth": dep[:, :h], "alpha": alp[:, :h],
        "radii": radii, "visibility_filter": radii > 0,
        # worst-shard binning demand vs the per-shard budget
        # (max_instances // n_dev): num_slots above it means a shard
        # truncated instances — rebudget, as for single-device render()
        "num_slots": num_slots, "max_tile_depth": tile_depth,
        "local_budget": jnp.int32(local_budget),
    }
    if exchange == "rows":
        # worst per-(src,dst) pack demand vs exchange_cap: demand > cap
        # means rows were dropped — re-call with a larger exchange_cap
        out["exchange_demand"] = demand
        out["exchange_cap"] = cap
        out["exchange_rows_per_device"] = n_dev * cap
    return out
