"""Micro-benchmark of binning internals: expansion vs sort vs realign.

Run: python examples/profile_binning.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.preprocess import TILE, preprocess
    from goi_tpu.raster.render import suggest_instance_budget

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
        + jnp.asarray(rng.normal(0, 1, (n, 1)).astype(np.float32)))
    cam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                         fovx=0.9, fovy=0.9, width=width, height=height)
    budget = suggest_instance_budget(scene, cam, align=K, margin=1.1)
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    num_tiles = grid_x * grid_y
    iters = args.iters

    sp = jax.jit(lambda sc: preprocess(sc, cam))(scene)
    sp = jax.tree.map(jax.lax.stop_gradient, sp)

    def timed(fn, *xs):
        # roll the (leaf) inputs by the loop index so the timed body is
        # iteration-dependent — otherwise XLA hoists the whole op out
        # of the fori_loop and the number measures ONE call / iters
        def many(xs):
            def it(i, acc):
                xi = jax.tree.map(
                    lambda x: jnp.roll(x, i, axis=0), xs)
                return acc + fn(*xi)
            return jax.lax.fori_loop(0, iters, it, 0.0)

        step = jax.jit(many)
        jax.block_until_ready(step(xs))
        t0 = time.time()
        jax.block_until_ready(step(xs))
        return (time.time() - t0) / iters * 1000.0

    n_inst = budget

    # stage 1: expansion (cumsum + mark/cummax + info gather + tile calc)
    def expand(sp):
        counts = sp.tiles_touched.astype(jnp.int32)
        offsets = jnp.cumsum(counts)
        base = offsets - counts
        total = offsets[-1]
        rect = (sp.rect_min[:, 0] << 20) | (sp.rect_min[:, 1] << 10) | \
            (jnp.maximum(sp.rect_max[:, 0] - sp.rect_min[:, 0], 1) - 1)
        depth_bits = jax.lax.bitcast_convert_type(
            sp.depth.astype(jnp.float32), jnp.int32)
        info = jnp.stack([rect, base, depth_bits], axis=1)
        slots = jnp.arange(n_inst, dtype=jnp.int32)
        g_idx = jnp.arange(counts.shape[0], dtype=jnp.int32)
        mark = jnp.zeros(n_inst, jnp.int32).at[
            jnp.where(counts > 0, base, n_inst)].set(g_idx, mode="drop")
        g_stream = jax.lax.cummax(mark)
        inst_info = info.at[g_stream].get(
            indices_are_sorted=True, mode="promise_in_bounds")
        rect_i = inst_info[:, 0]
        local = slots - inst_info[:, 1]
        w_i = (rect_i & 0x3FF) + 1
        tx = (rect_i >> 20) + local % w_i
        ty = ((rect_i >> 10) & 0x3FF) + local // w_i
        in_range = slots < total
        tile = jnp.where(in_range, ty * grid_x + tx, num_tiles)
        return (jnp.sum(tile) + jnp.sum(g_stream)
                + jnp.sum(inst_info[:, 2])).astype(jnp.float32)

    ms_expand = timed(expand, sp)

    # stage 2: the sort alone (on realistic key material)
    tile_r = jnp.asarray(
        rng.integers(0, num_tiles + 1, n_inst).astype(np.int32))
    depth_r = jnp.asarray(
        rng.integers(0, 2**30, n_inst).astype(np.int32))
    gid_r = jnp.asarray(
        rng.integers(0, n, n_inst).astype(np.int32))

    def sort2(tile, depth, gidv):
        a, b, c = jax.lax.sort((tile, depth, gidv), num_keys=2,
                               is_stable=True)
        return (jnp.sum(a) + jnp.sum(c)).astype(jnp.float32)

    def sort1(tile, gidv):
        a, c = jax.lax.sort((tile, gidv), num_keys=1, is_stable=True)
        return (jnp.sum(a) + jnp.sum(c)).astype(jnp.float32)

    def sort2_4ops(tile, depth, gidv):
        s = jnp.arange(n_inst, dtype=jnp.int32)
        a, b, c, d = jax.lax.sort((tile, depth, gidv, s), num_keys=2,
                                  is_stable=True)
        return (jnp.sum(a) + jnp.sum(c) + jnp.sum(d)).astype(jnp.float32)

    def sortN(depth, gidv):
        # gaussian-scale depth presort
        a, c = jax.lax.sort((depth[:n], gidv[:n]), num_keys=1,
                            is_stable=True)
        return (jnp.sum(a) + jnp.sum(c)).astype(jnp.float32)

    ms_sort2 = timed(sort2, tile_r, depth_r, gid_r)
    ms_sort1 = timed(sort1, tile_r, gid_r)
    ms_sort2_4 = timed(sort2_4ops, tile_r, depth_r, gid_r)
    ms_sortN = timed(sortN, depth_r, gid_r)

    # stage 3: searchsorted + realign scatter
    tile_sorted = jnp.sort(tile_r)

    def realign(tile_sorted, gidv):
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(tile_sorted, tids,
                                  side="left").astype(jnp.int32)
        ends = jnp.searchsorted(tile_sorted, tids,
                                side="right").astype(jnp.int32)
        counts_t = ends - starts
        seg = jnp.ceil(counts_t / K).astype(jnp.int32) * K
        seg_cum = jnp.cumsum(seg)
        a_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   seg_cum[:-1]]).astype(jnp.int32)
        lut = jnp.stack([a_start, starts], axis=1)
        tile_clipped = jnp.minimum(tile_sorted, num_tiles - 1)
        lrow = lut.at[tile_clipped].get(indices_are_sorted=True,
                                        mode="promise_in_bounds")
        rank = jnp.arange(n_inst, dtype=jnp.int32) - lrow[:, 1]
        pos = lrow[:, 0] + rank
        ok = tile_sorted < num_tiles
        pos = jnp.where(ok, pos, jnp.int32(2 ** 30))
        gid_aligned = jnp.full_like(gidv, -1).at[pos].set(
            gidv, mode="drop", indices_are_sorted=True)
        return (jnp.sum(gid_aligned) + seg_cum[-1]).astype(jnp.float32)

    ms_realign = timed(realign, tile_sorted, gid_r)

    print(json.dumps({
        "budget": int(budget),
        "expand_ms": round(ms_expand, 3),
        "sort_2key_3ops_ms": round(ms_sort2, 3),
        "sort_2key_4ops_ms": round(ms_sort2_4, 3),
        "sort_1key_2ops_ms": round(ms_sort1, 3),
        "sort_gauss_depth_ms": round(ms_sortN, 3),
        "realign_ms": round(ms_realign, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
