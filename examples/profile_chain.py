"""Micro-decomposition of the chunked-layout backward at production
scale: bwd Pallas kernel vs narrow transpose vs each chain stage
(perm-inversion scatter, expansion-order gather, block prefixes +
whole-block segment sums, boundary gathers).

Run on the real chip:  python examples/profile_chain.py [--n 1000000]
Writes CHAIN_PROFILE.json.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.raster.binning import bin_splats_chunked
    from goi_tpu.raster.pallas_blend import (
        K, _blend_core, _blocked_segment_reduce,
        _reduce_transported_chain)
    from goi_tpu.raster.preprocess import TILE, preprocess
    from goi_tpu.raster.render import suggest_budgets

    n, width, height = args.n, args.size, args.size
    rng = np.random.default_rng(0)
    scene = GaussianScene.create(
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32),
        sh_degree=3, sem_dim=10,
        scales=rng.uniform(0.005, 0.02, n).astype(np.float32))
    scene = scene.replace(
        active_sh_degree=3,
        opacity=scene.opacity
        + jnp.asarray(rng.normal(0, 1, (n, 1)).astype(np.float32)),
        semantics=jnp.asarray(
            rng.normal(0, 0.3, (n, 10)).astype(np.float32)))
    cam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                         fovx=0.9, fovy=0.9, width=width, height=height)
    budget, _ = suggest_budgets(scene, cam, align=K, margin=1.0)
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    s_dim, n_out = 10, 14
    d = 7 + 3 + s_dim
    iters = args.iters

    def timed(fn, *xs):
        def many(xs):
            def it(i, acc):
                ys = jax.tree.map(
                    lambda x: (x * (1.0 + i.astype(x.dtype) * 1e-12)
                               if jnp.issubdtype(x.dtype, jnp.floating)
                               else x), xs)
                return acc + fn(*ys)
            return jax.lax.fori_loop(0, iters, it, 0.0)

        step = jax.jit(many)
        jax.block_until_ready(step(xs))
        t0 = time.time()
        jax.block_until_ready(step(xs))
        return (time.time() - t0) / iters * 1000.0

    sp = jax.jit(lambda sc: preprocess(sc, cam))(scene)
    binning = jax.jit(lambda s: bin_splats_chunked(
        jax.tree.map(jax.lax.stop_gradient, s), grid_x=grid_x,
        grid_y=grid_y, max_instances=budget, chunk_k=K,
        export_perm=True))(sp)
    counts = jnp.maximum(sp.tiles_touched.astype(jnp.int32), 1)
    bounds = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)])
    perm = (binning.sort_slots, bounds)
    cot = jnp.ones((grid_x * grid_y, TILE * TILE, n_out + 2),
                   jnp.float32) * 1e-3

    def blend_bwd(reduce_perm, mean2d, conic, opa, color, sem, depth,
                  cot):
        _, vjp = jax.vjp(
            lambda *xs: _blend_core(grid_x, grid_y, n_out, True, *xs,
                                    binning.point_list,
                                    binning.tile_start,
                                    binning.tile_end,
                                    binning.chunk_base, reduce_perm),
            mean2d, conic, opa, color, sem, depth)
        gs = vjp(cot)
        return sum(jnp.sum(v) for v in gs if v is not None)

    from functools import partial
    ms_chain = timed(partial(blend_bwd, perm), sp.mean2d, sp.conic,
                     sp.opacity, sp.color, sp.semantics, sp.depth, cot)
    ms_scatter = timed(partial(blend_bwd, ()), sp.mean2d, sp.conic,
                       sp.opacity, sp.color, sp.semantics, sp.depth,
                       cot)

    # chain reduce alone on synthetic row-major instance grads (the
    # shape the round-4 sublane-padded transpose emits: 64-lane rows)
    from goi_tpu.raster.pallas_blend import GATHER_LANES
    n_chunks_cap = budget // K + grid_x * grid_y + 1
    rows_fake = jnp.asarray(rng.normal(
        0, 1, (n_chunks_cap * K, GATHER_LANES)).astype(np.float32))
    fm_fake = jnp.asarray(rng.normal(
        0, 1, (24, n_chunks_cap * K)).astype(np.float32))

    # stage: the pad-sublanes + transpose that feeds the chain
    def pad_transpose(fm):
        fm = jnp.pad(fm, ((0, GATHER_LANES - fm.shape[0]), (0, 0)))
        return jnp.sum(fm.T[:, 0])

    ms_padT = timed(pad_transpose, fm_fake)

    def chain_all(rows):
        outs = _reduce_transported_chain(
            rows, binning.sort_slots, bounds, binning.tile_start,
            binning.tile_end, binning.chunk_base, n, s_dim)
        return sum(jnp.sum(v) for v in outs)

    ms_chain_reduce = timed(chain_all, rows_fake)

    # stage: perm inversion scatter only
    m = budget

    def inv_only(rows):
        walk = (binning.tile_start // K) * K
        pad = binning.chunk_base * K - walk
        kept = binning.tile_end[-1]
        mark = jnp.zeros(m, jnp.int32).at[binning.tile_start].max(
            pad, mode="drop")
        pad_p = jax.lax.cummax(mark)
        row_p = jnp.arange(m, dtype=jnp.int32) + pad_p
        row_p = jnp.where(jnp.arange(m, dtype=jnp.int32) < kept, row_p,
                          jnp.int32(2 ** 30))
        _, stream_pos = jax.lax.sort([binning.sort_slots, row_p],
                                     num_keys=1)
        return jnp.sum(stream_pos.astype(jnp.float32)) + jnp.sum(
            rows[0])

    ms_inv = timed(inv_only, rows_fake)

    # stage: expansion-order gather only (64-lane rows, no relayout —
    # the round-3 pad/slice around this gather cost ~45 ms)
    idx_fake = jnp.asarray(
        rng.integers(0, n_chunks_cap * K, m).astype(np.int32))

    def gather_only(rows):
        r = rows.at[idx_fake].get(mode="promise_in_bounds")
        return jnp.sum(r)

    ms_gather = timed(gather_only, rows_fake)

    # stage: blocked segment reduce only (prefix + blocksum + boundary)
    rows_exp = jnp.asarray(rng.normal(0, 1, (m, GATHER_LANES))
                           .astype(np.float32))

    def blocked_only(rows):
        return jnp.sum(_blocked_segment_reduce(rows, bounds,
                                               GATHER_LANES))

    ms_blocked = timed(blocked_only, rows_exp)

    # sub-decomposition of the blocked reduce: tri prefixes alone,
    # boundary gather alone, searchsorted+blocksum alone
    from goi_tpu.raster.pallas_blend import CUMSUM_BLOCK
    nb = -(-m // CUMSUM_BLOCK)
    p_bounds = jnp.minimum(bounds, m)

    def tri_only(rows):
        xb = jnp.pad(rows, ((0, nb * CUMSUM_BLOCK - m), (0, 0)))             .reshape(nb, CUMSUM_BLOCK, GATHER_LANES)
        ri = jnp.arange(CUMSUM_BLOCK)
        tri = (ri[:, None] > ri[None, :]).astype(jnp.float32)
        inner = jnp.einsum("ij,bjd->bid", tri, xb,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        return jnp.sum(inner[:, -1, :])

    ms_tri = timed(tri_only, rows_exp)

    def boundary_only(rows):
        r = rows.at[p_bounds].get(mode="promise_in_bounds",
                                  indices_are_sorted=True)
        return jnp.sum(r)

    ms_boundary = timed(boundary_only, rows_exp)

    def blocksum_only(rows):
        q = p_bounds // CUMSUM_BLOCK
        gb = jnp.searchsorted(
            q, jnp.arange(nb, dtype=q.dtype), side="right"
        ).astype(jnp.int32) - 1
        tot = rows[:nb]
        acc = jax.ops.segment_sum(tot, jnp.clip(gb, 0, n),
                                  num_segments=n + 1)[:n]
        return jnp.sum(acc)

    ms_blocksum = timed(blocksum_only, rows_exp)

    table = {
        "n": n, "budget": int(budget),
        "kept_instances": int(np.asarray(binning.tile_end)[-1]),
        "blend_vjp_chain_ms": round(ms_chain, 3),
        "blend_vjp_scatter_ms": round(ms_scatter, 3),
        "chain_reduce_ms": round(ms_chain_reduce, 3),
        "bwd_kernel_est_ms": round(ms_chain - ms_chain_reduce, 3),
        "pad_transpose_ms": round(ms_padT, 3),
        "perm_inversion_ms": round(ms_inv, 3),
        "expansion_gather_ms": round(ms_gather, 3),
        "blocked_segment_reduce_ms": round(ms_blocked, 3),
        "blocked_tri_prefix_ms": round(ms_tri, 3),
        "blocked_boundary_gather_ms": round(ms_boundary, 3),
        "blocked_searchsorted_blocksum_ms": round(ms_blocksum, 3),
    }
    print(json.dumps(table, indent=1))
    with open("CHAIN_PROFILE.json", "w") as f:
        json.dump(table, f, indent=1)


if __name__ == "__main__":
    main()
