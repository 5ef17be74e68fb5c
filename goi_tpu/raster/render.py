"""Public differentiable render / trace API.

TPU-native counterpart of the reference render()/trace()
(ref:gaussian_renderer/__init__.py:18-192) and of the autograd binding
(ref:diff_gaussian_rasterization/__init__.py:72-189). The returned dict
matches the reference contract: render, semantics, depth, alpha,
radii, visibility_filter.

Gradients: the full pipeline (preprocess -> gather -> tiled blend) is
jax-differentiable; binning indices are integer and naturally constant.
Scatter/atomics of the CUDA backward become deterministic gather-VJPs
(segment sums), a reproducibility upgrade over the reference
(ref:cuda_rasterizer/backward.cu:565-621).

For densification statistics the reference reads the gradient of a
zero screenspace tensor (ref:gaussian_renderer/__init__.py:26-30); here
pass `mean2d_offset` (an (N,2) zeros array) and differentiate w.r.t. it
— its cotangent is dL/d(pixel mean2d); multiply by (W/2, H/2) to get the
reference's NDC-scaled stat (ref:cuda_rasterizer/backward.cu:498-499).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from goi_tpu.core.camera import Camera
from goi_tpu.core.scene import GaussianScene
from goi_tpu.raster.binning import bin_splats
from goi_tpu.raster.blend import blend_tiles, tiles_to_image
from goi_tpu.raster.preprocess import TILE, preprocess
from goi_tpu.raster.reference import ALPHA_CLAMP, ALPHA_MIN, T_EPS


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterization budgets (all shapes must be static under jit).

    max_instances: instance (Gaussian x tile duplication) buffer size;
        the CUDA version allocates this dynamically per frame
        (ref:rasterizer_impl.cu:155-230) — on TPU it is a fixed budget.
    tile_cap: per-tile blended instance cap for the XLA path.
    chunk: instances blended per scan step.
    backend: 'xla' | 'pallas' | 'reference'.
    """

    max_instances: int = 1 << 20
    tile_cap: int = 4096
    chunk: int = 64
    backend: str = "xla"
    debug: bool = False
    # pallas backend: size of the K-aligned post-cull instance buffer
    # (pack, kernel walks, gradient reduction all scale with it); None
    # couples it to max_instances. The overlap cull makes the aligned
    # demand smaller than the raw rect expansion demand on deep scenes
    # and larger on sparse ones — suggest_budgets() sizes both exactly.
    max_binned: Optional[int] = None
    # instance->Gaussian gradient reduction strategy (pallas backend).
    # layout='chunked' (default): 'chain' (default via 'auto') = invert
    #   the sort permutation lazily in the backward, gather grad rows
    #   to expansion order, two-level MXU prefix sum, per-Gaussian
    #   boundary differences — gather/MXU-bound (XLA's multi-column
    #   scatter is column-serial at ~12 ms/col at 2.5M rows, making
    #   'scatter' ~2.5x slower at 1M-Gaussian scale);
    #   'scatter' = one segment-sum keyed by the kernel-transported ids.
    # layout='aligned' (legacy): 'scatter' | 'sorted' | 'cumsum' as in
    #   round 2; 'auto' picks by the measured budget crossover
    #   (see _effective_reduce).
    # Same math, all deterministic, all full-fp32 (prefix matmuls at
    # Precision.HIGHEST); the chain/cumsum paths' boundary differences
    # carry absolute noise ~ eps * running-prefix magnitude on tiny
    # per-Gaussian grads (PARITY.md deviation 3) — the same error class
    # as the reference's fp32 atomicAdd ordering.
    reduce: str = "auto"
    # exact ellipse/tile overlap cull in binning (output-exact; see
    # binning._expand_instances). False = raw rect expansion, the CUDA
    # reference's exact instance stream (debug/parity escape hatch).
    cull: bool = True
    # pallas backend instance layout:
    # 'chunked' (round 3, default) = ONE contiguous tile-sorted stream
    #   (bin_splats_chunked): no realign scatter, no separate aligned
    #   buffer (max_binned is ignored), floor-walk kernels, gradient
    #   reduction via kernel-transported keys. The budget must cover
    #   sum(max(tiles_touched, 1)) — one forced sentinel slot per
    #   zero-count Gaussian (the block-diagonal MXU expansion gather's
    #   density precondition).
    # 'aligned' (round 2) = K-aligned per-tile segments with the
    #   realign scatter and the scatter/sorted/cumsum reduce family.
    layout: str = "chunked"


def _grid(cam: Camera):
    return (cam.width + TILE - 1) // TILE, (cam.height + TILE - 1) // TILE


# measured scatter/cumsum crossover (examples/micro_reduce.py on v5e):
# the direct scatter wins at 254k instances (6.6 vs ~10 ms), the prefix
# chain wins at 2M (43 vs 204 ms)
AUTO_CUMSUM_MIN = 1 << 19


def _effective_reduce(config: RasterConfig) -> str:
    """Resolve reduce='auto' against the STATIC budgets (so the choice
    is made at trace time and both binning and the blend agree).

    Cost model: the scatter's rows scale with the aligned buffer
    (max_binned); the cumsum chain's gather + prefix run over the
    EXPANSION budget (max_instances), at a measured ~5x per-row
    advantage (examples/micro_reduce.py: 204 ms scatter vs 43 ms chain
    at 2M rows of each). With decoupled budgets (small aligned buffer,
    much larger expansion stream) the chain can lose even above the
    crossover, so require chain rows < 5x scatter rows too."""
    if config.backend == "pallas" and config.layout == "chunked":
        # chunked strategies: 'chain' (sort-permutation inversion +
        # expansion-order prefix sums — gather/MXU-bound, ~2.5x faster
        # than the scatter at 1M-Gaussian scale because XLA's
        # multi-column scatter is column-serial at ~12 ms/col) or
        # 'scatter' (kernel-transported keys, one segment-sum). Below
        # the crossover the chain's fixed stages (permutation payload,
        # inversion scatter, boundary gathers) lose to the direct
        # scatter, whose column-serial cost shrinks with the budget.
        if config.reduce in ("scatter", "chain"):
            return config.reduce
        return ("chain" if config.max_instances >= AUTO_CUMSUM_MIN
                else "scatter")
    if config.reduce != "auto":
        return config.reduce
    n_binned = (config.max_binned if config.max_binned is not None
                else config.max_instances)
    if n_binned >= AUTO_CUMSUM_MIN and \
            config.max_instances < 5 * n_binned:
        return "cumsum"
    return "scatter"


def _bin_for_backend(sp, config: RasterConfig, grid_x: int, grid_y: int):
    """bin_splats with the backend's layout (chunked stream or
    K-aligned segments + the optional sort-permutation export for the
    aligned pallas path)."""
    sp_ng = jax.tree.map(jax.lax.stop_gradient, sp)
    if config.backend == "pallas":
        from goi_tpu.raster.pallas_blend import K as PALLAS_K
        if config.layout == "chunked":
            from goi_tpu.raster.binning import bin_splats_chunked
            return bin_splats_chunked(
                sp_ng, grid_x=grid_x, grid_y=grid_y,
                max_instances=config.max_instances,
                chunk_k=PALLAS_K, cull=config.cull,
                export_perm=(_effective_reduce(config) == "chain"))
        align = PALLAS_K
    else:
        align = 0
    return bin_splats(
        sp_ng,
        grid_x=grid_x, grid_y=grid_y,
        max_instances=config.max_instances, align=align,
        export_perm=(config.backend == "pallas"
                     and _effective_reduce(config) in
                     ("sorted", "cumsum")),
        cull=config.cull,
        binned_slots=(config.max_binned if align else None))


def _blend_stage(sp, binning, cam: Camera, bg_color,
                 config: RasterConfig, grid_x: int, grid_y: int):
    """Blend pre-binned splats and assemble the render() output dict —
    shared by render() and trace() so trace never pays a second
    preprocess + binning for its embedded color render."""
    if config.backend == "pallas":
        from goi_tpu.raster.pallas_blend import blend_tiles_pallas
        tiles = blend_tiles_pallas(
            sp, binning, jnp.asarray(bg_color, jnp.float32),
            grid_x=grid_x, grid_y=grid_y,
            reduce=_effective_reduce(config))
    else:
        tiles = blend_tiles(
            sp, binning, jnp.asarray(bg_color, jnp.float32),
            grid_x=grid_x, grid_y=grid_y,
            tile_cap=config.tile_cap, chunk=config.chunk)
    return _assemble_out(tiles, sp, binning, cam, grid_x, grid_y)


def _assemble_out(tiles, sp, binning, cam: Camera, grid_x: int,
                  grid_y: int):
    color_t, sem_t, depth_t, alpha_t = tiles
    h, w = cam.height, cam.width
    return {
        "render": tiles_to_image(color_t, grid_x, grid_y, h, w),
        "semantics": tiles_to_image(sem_t, grid_x, grid_y, h, w),
        "depth": tiles_to_image(depth_t[..., None], grid_x, grid_y,
                                h, w),
        "alpha": tiles_to_image(alpha_t[..., None], grid_x, grid_y,
                                h, w),
        "radii": sp.radius,
        "visibility_filter": sp.radius > 0,
        "num_instances": binning.num_instances,
        # buffer slots demanded (incl. Pallas K-alignment padding);
        # > config.max_instances means instances were truncated
        "num_slots": binning.num_slots,
        # deepest tile segment; > config.tile_cap means the XLA-backend
        # blend truncated that tile (the Pallas backend has no per-tile
        # cap — there it is informational only)
        "max_tile_depth": jnp.max(binning.tile_end - binning.tile_start),
    }


BUDGET_QUANTUM = 4096  # multiple of pallas_blend.K; keeps re-jit churn low


def suggest_instance_budget(scene: GaussianScene, cams, *,
                            margin: float = 1.5,
                            minimum: int = 1 << 15,
                            align: int = 0,
                            layout: str = "chunked") -> int:
    """Pick max_instances just above the actual instance count (with
    headroom), rounded up to BUDGET_QUANTUM — NOT to a power of two:
    binning, packing, and the gradient reduction all scale with the
    *budget*, not the true count, so pow2 rounding costs up to 2x on
    every budget-sized stage. The CUDA reference sizes these buffers
    dynamically per frame (ref:rasterizer_impl.cu:155-230) — on TPU
    shapes are static, so re-jit when the scene outgrows the budget
    (training loops call this every few hundred steps).

    align: the Pallas backend K-aligns every tile segment, which can
    demand up to num_tiles*(align-1) extra slots beyond the raw count —
    pass align=pallas_blend.K (the render() path uses it automatically)
    so the budget covers the exact aligned demand. The aligned demand
    is counted AFTER the exact overlap cull (binning.exact_tile_counts)
    but the single budget also covers the raw rect expansion demand.
    For independently sized expansion/aligned buffers (smaller hot
    buffers on deep scenes), use suggest_budgets()."""
    mi, mb = suggest_budgets(scene, cams, margin=margin,
                             minimum=minimum, align=align,
                             layout=layout)
    return max(mi, mb)


def suggest_budgets(scene: GaussianScene, cams, *, margin: float = 1.5,
                    minimum: int = 1 << 15,
                    align: int = 0, layout: str = "chunked") -> tuple:
    """Size the two bin_splats buffers independently:
    returns (max_instances, max_binned) — the raw rect expansion demand
    and the post-cull K-aligned buffer demand, each with `margin`
    headroom and BUDGET_QUANTUM rounding. With align == 0 the second
    equals the first (the XLA backend has no separate aligned buffer).

    layout='chunked': the budget must additionally cover one forced
    sentinel slot per zero-count Gaussian (bin_splats_chunked's
    expansion-density precondition); there is no separate aligned
    buffer (the second return equals the first)."""
    if not isinstance(cams, (list, tuple)):
        cams = [cams]

    # one fused program per camera: eager per-op dispatch here is slow
    # (and can stall tunneled backends)
    @partial(jax.jit, static_argnames=("gx", "gy"))
    def raw_fn(scene, cam, *, gx, gy):
        del gx, gy
        counts = preprocess(scene, cam).tiles_touched
        if layout == "chunked":
            return jnp.sum(jnp.maximum(counts, 1))
        return jnp.sum(counts)

    @partial(jax.jit, static_argnames=("gx", "gy", "cap"))
    def aligned_fn(scene, cam, *, gx, gy, cap):
        from goi_tpu.raster.binning import exact_tile_counts
        sp = preprocess(scene, cam)
        counts = exact_tile_counts(sp, grid_x=gx, grid_y=gy,
                                   max_instances=cap)
        return jnp.sum((counts + align - 1) // align * align)

    q = BUDGET_QUANTUM
    worst_raw = worst_aligned = 0
    for cam in cams:
        gx, gy = _grid(cam)
        raw = int(raw_fn(scene, cam, gx=gx, gy=gy))
        worst_raw = max(worst_raw, raw)
        if align and layout != "chunked":
            # the exact counter needs an expansion buffer >= raw;
            # quantum-round its size to bound re-jit churn
            cap = max((raw + q - 1) // q * q, q)
            worst_aligned = max(worst_aligned, int(aligned_fn(
                scene, cam, gx=gx, gy=gy, cap=cap)))

    def fit(worst):
        want = max(int(worst * margin) + 1, minimum)
        return (want + q - 1) // q * q

    mi = fit(worst_raw)
    if layout == "chunked":
        return mi, mi
    return mi, (fit(worst_aligned) if align else mi)


def image_to_tiles(img: jax.Array, grid_x: int, grid_y: int) -> jax.Array:
    """(C, H, W) -> (T, 256, C), zero-padding to the tile grid."""
    c, h, w = img.shape
    ph, pw = grid_y * TILE - h, grid_x * TILE - w
    img = jnp.pad(img, ((0, 0), (0, ph), (0, pw)))
    img = img.reshape(c, grid_y, TILE, grid_x, TILE)
    return img.transpose(1, 3, 2, 4, 0).reshape(
        grid_y * grid_x, TILE * TILE, c)


def render(
    scene: GaussianScene,
    cam: Camera,
    bg_color,
    config: RasterConfig = RasterConfig(),
    *,
    scaling_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    mean2d_offset: Optional[jax.Array] = None,
    semantic_masks: Optional[jax.Array] = None,
    gaussian_mask: Optional[jax.Array] = None,
):
    """semantic_masks gates the semantic channel only
    (ref:scene/gaussian_model.py:108-123); gaussian_mask hides Gaussians
    entirely (the GUI renderer's subset mask,
    ref:gui/gs_renderer.py:315-321)."""
    if gaussian_mask is not None:
        scene = scene.replace(valid=scene.valid & gaussian_mask)
    if config.backend == "reference":
        from goi_tpu.raster.reference import render_reference
        return render_reference(scene, cam, bg_color,
                                scaling_modifier=scaling_modifier,
                                override_color=override_color,
                                semantic_masks=semantic_masks,
                                mean2d_offset=mean2d_offset)
    if config.backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {config.backend!r}")
    if config.reduce not in ("scatter", "sorted", "cumsum", "chain",
                             "auto"):
        raise ValueError(f"unknown reduce {config.reduce!r}")
    if config.layout not in ("chunked", "aligned"):
        raise ValueError(f"unknown layout {config.layout!r}")
    if (config.backend == "pallas" and config.layout == "chunked"
            and config.reduce not in ("auto", "scatter", "chain")):
        raise ValueError(
            f"layout='chunked' supports reduce 'chain'/'scatter'; "
            f"reduce={config.reduce!r} needs layout='aligned'")
    if config.reduce == "chain" and config.layout != "chunked":
        raise ValueError("reduce='chain' needs layout='chunked'")

    grid_x, grid_y = _grid(cam)
    sp = preprocess(scene, cam, scaling_modifier=scaling_modifier,
                    override_color=override_color,
                    semantic_masks=semantic_masks)
    if mean2d_offset is not None:
        sp = dataclasses.replace(sp, mean2d=sp.mean2d + mean2d_offset)
    binning = _bin_for_backend(sp, config, grid_x, grid_y)
    out = _blend_stage(sp, binning, cam, bg_color, config,
                       grid_x, grid_y)
    if config.debug:
        # kernel forensics (role of the reference's --debug CPU snapshot
        # dumps, ref:diff_gaussian_rasterization/__init__.py:112-119):
        # on non-finite output, dump the rasterizer inputs host-side.
        bad = ~(jnp.isfinite(out["render"]).all()
                & jnp.isfinite(out["semantics"]).all())

        def dump(bad_flag, splats):
            if bool(bad_flag):
                import pickle
                import numpy as _np
                path = "snapshot_fw.dump"
                with open(path, "wb") as f:
                    pickle.dump(jax.tree.map(_np.asarray, splats), f)
                print(f"[goi_tpu] non-finite render output; rasterizer "
                      f"inputs dumped to {path}")

        jax.debug.callback(dump, bad, sp)
    return out


def render_batch(scene: GaussianScene, cams: Camera, bg_color,
                 config: RasterConfig = RasterConfig(), **kw):
    """vmap of render() over a batched Camera pytree (stack_cameras):
    amortizes per-frame fixed costs when rendering many views (video
    paths, eval sweeps, batched training)."""
    return jax.vmap(
        lambda c: render(scene, c, bg_color, config, **kw))(cams)


def trace(
    scene: GaussianScene,
    cam: Camera,
    img_sem: jax.Array,
    bg_color,
    config: RasterConfig = RasterConfig(),
    *,
    scaling_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
):
    """2D->3D feature lifting (ref:cuda_rasterizer/forward.cu:422-583,
    gaussian_renderer/__init__.py:107-192): walks the same blend order
    and, for every *blended* instance with alpha > 0.005, accumulates the
    pixel's image feature into that Gaussian.

    img_sem: (S, H, W) per-pixel features to lift.
    Returns dict(render, gaussian_semantics (N, S), num_gsem (N,)).
    NOTE the reference increments its hit counter once per *channel*
    (num_gsem ends up hits*S, ref:forward.cu:521-526); we reproduce that
    so downstream normalization matches bit-for-bit.
    """
    if config.backend == "reference":
        # the trace walk is its own implementation; use the XLA blend
        # for the embedded color render
        config = dataclasses.replace(config, backend="xla")
    grid_x, grid_y = _grid(cam)
    num_tiles = grid_x * grid_y
    S = img_sem.shape[0]
    P = scene.xyz.shape[0]
    sp = preprocess(scene, cam, scaling_modifier=scaling_modifier,
                    override_color=override_color)
    # ONE preprocess + binning serves both the trace walk and the
    # embedded color render below
    binning = _bin_for_backend(sp, config, grid_x, grid_y)

    if config.backend == "pallas":
        # fused blend + trace kernel: the trailing ones channel (zeroed
        # outside the image by image_to_tiles's padding) is the hit
        # counter, so pixel validity needs no separate mask
        from goi_tpu.raster.pallas_blend import trace_tiles_pallas
        aug = jnp.concatenate(
            [img_sem.astype(jnp.float32),
             jnp.ones((1, cam.height, cam.width), jnp.float32)], axis=0)
        aug_tiles = image_to_tiles(aug, grid_x, grid_y)  # (T,256,S+1)
        *tiles, lifted = trace_tiles_pallas(
            sp, binning, aug_tiles, jnp.asarray(bg_color, jnp.float32),
            grid_x=grid_x, grid_y=grid_y)
        out = _assemble_out(tuple(tiles), sp, binning, cam,
                            grid_x, grid_y)
        return {
            "render": out["render"],
            "gaussian_semantics": lifted[:, :S],
            # reference counts one hit per channel (see docstring);
            # counts ride the ones channel as f32 (exact below 2^24)
            "num_gsem": lifted[:, S].astype(jnp.int32) * S,
            # informational on this path (no per-tile cap)
            "max_tile_depth": jnp.max(binning.tile_end
                                      - binning.tile_start),
            "num_slots": binning.num_slots,
        }

    sem_tiles = image_to_tiles(img_sem, grid_x, grid_y)  # (T, 256, S)
    # Pixel validity (tile padding outside the image must not contribute).
    ys = (jnp.arange(num_tiles)[:, None] // grid_x) * TILE + \
        jnp.repeat(jnp.arange(TILE), TILE)[None, :]
    xs = (jnp.arange(num_tiles)[:, None] % grid_x) * TILE + \
        jnp.tile(jnp.arange(TILE), TILE)[None, :]
    pix_ok = (xs < cam.width) & (ys < cam.height)        # (T, 256)

    from goi_tpu.raster.blend import (_tile_pixel_coords, chunk_weights,
                                      tile_slices)
    fx, fy = _tile_pixel_coords(grid_x, grid_y)
    gid_t, msk_t = tile_slices(binning, config.tile_cap, config.chunk)

    def step(carry, inp):
        # t_all multiplies every valid q so the T<1e-4 stop is sticky
        # across chunks (see raster/blend.py chunk_weights)
        t_all, gau_sem, n_hits = carry
        g, m = inp
        ck = chunk_weights(sp, g, m, fx, fy, t_all, pix_ok=pix_ok)
        alpha, active, p_incl = ck["alpha"], ck["active"], ck["p_incl"]
        hit = active & (alpha > 0.005)                      # (T, 256, K)
        # per-instance sums over the tile's pixels (HIGHEST: DEFAULT
        # would truncate the lifted features to bf16 on the MXU)
        inst_sem = jnp.einsum("tpk,tps->tks", hit.astype(jnp.float32),
                              sem_tiles,
                              precision=jax.lax.Precision.HIGHEST)
        inst_cnt = jnp.sum(hit, axis=1).astype(jnp.int32)   # (T, K)
        gau_sem = gau_sem.at[g.reshape(-1)].add(
            inst_sem.reshape(-1, S))
        n_hits = n_hits.at[g.reshape(-1)].add(inst_cnt.reshape(-1))
        return (p_incl[:, :, -1], gau_sem, n_hits), None

    t0 = jnp.ones((num_tiles, TILE * TILE), jnp.float32)
    (t_final, gau_sem, n_hits), _ = jax.lax.scan(
        step,
        (t0, jnp.zeros((P, S), jnp.float32), jnp.zeros((P,), jnp.int32)),
        (gid_t, msk_t))

    out = _blend_stage(sp, binning, cam, bg_color, config,
                       grid_x, grid_y)
    return {
        "render": out["render"],
        "gaussian_semantics": gau_sem,
        # reference counts one hit per semantic channel (see docstring)
        "num_gsem": n_hits * S,
        # deepest tile segment: > config.tile_cap means the walk above
        # truncated that tile's deepest instances (the CUDA trace cannot
        # overflow — it walks exact per-tile ranges); callers should
        # re-run with a larger tile_cap when this trips
        "max_tile_depth": jnp.max(binning.tile_end - binning.tile_start),
        "num_slots": binning.num_slots,
    }
