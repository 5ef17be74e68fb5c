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


def render_sharded(
    scene: GaussianScene,
    cam: Camera,
    bg,
    config: RasterConfig,
    mesh: Mesh,
    *,
    axis: str = "model",
):
    """Differentiable sharded render. `scene` arrays must be sharded on
    their leading axis over `axis` (see dist.mesh.shard_scene); the
    camera/bg are replicated. Returns the same dict contract as
    render() (radii/visibility stay shard-local -> gathered)."""
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

    def fn(params, valid, bg):
        # local scene shard
        shard = scene.with_params(params).replace(valid=valid)
        sp = preprocess(shard, cam)

        # gather screen-space splats from all shards (differentiable:
        # transpose = reduce-scatter of splat grads over ICI)
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
        return img, sem, dep, alp, sp.radius

    pspec = {k: P(axis) for k in scene.params()}
    img, sem, dep, alp, radii = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspec, P(axis), P()),
        out_specs=(P(None, axis, None), P(None, axis, None),
                   P(None, axis, None), P(None, axis, None), P(axis)),
        check_vma=False,  # pallas_call shapes carry no vma annotations
    )(scene.params(), scene.valid, jnp.asarray(bg, jnp.float32))

    h = cam.height
    return {
        "render": img[:, :h], "semantics": sem[:, :h],
        "depth": dep[:, :h], "alpha": alp[:, :h],
        "radii": radii, "visibility_filter": radii > 0,
    }
