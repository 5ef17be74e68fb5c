"""Micro-benchmark: global sort vs blocked batched sort vs the gathers/
scatters a counting-style binning would need, at 1M-Gaussian scale.

Explores the design space for killing the binning sort at production
scale (the 44 ms binning stage at 2.24M instances, BENCH_STAGES r02):

  sortA  current: one 2-key stable sort (tile, depth) + 2 payloads
  sortB  1-key packed (tile<<22|depth22) + 1 payload
  blockC per-block batched sort (nb, B): 1 key + 1 payload
  gather random row gather at stream scale (re-order cost)
  scatter random scatter at stream scale (direct-placement cost)

Timing methodology: every iteration's input is DERIVED FROM the
previous iteration's output (loop-carried dependency), so XLA can
neither hoist the op out of the fori_loop nor exploit permutation
invariance of reductions. Sorting networks are data-oblivious, so
sorting an almost-sorted carried array costs the same as a random one.

Run: python examples/micro_sort.py [--m 2240512]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2_240_512)
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--tiles", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("only", nargs="*",
                    help="substring filter of benchmarks to run")
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    m, B, T = args.m, args.block, args.tiles
    m = -(-m // B) * B
    nb = m // B
    iters = args.iters
    rng = np.random.default_rng(0)
    tile0 = jnp.asarray(rng.integers(0, T + 1, m).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 2 ** 22, m).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, 1 << 20, m).astype(np.int32))
    perm = jnp.asarray(rng.permutation(m).astype(np.int32))
    rows0 = jnp.asarray(rng.normal(0, 1, (m, 8)).astype(np.float32))

    def timed(step1, init):
        """step1: carry -> carry with the timed op on the carried
        value. Returns ms/iter."""
        def many(c):
            return jax.lax.fori_loop(
                0, iters, lambda i, c: step1(c, i), c)

        f = jax.jit(many)
        out = jax.block_until_ready(f(init))
        t0 = time.time()
        jax.block_until_ready(f(out))
        return (time.time() - t0) / iters * 1000.0

    def mix(c, i):
        # cheap iteration-dependent perturbation keeping values in range
        return jnp.bitwise_xor(c, i & 1023)

    def sortA(c, i):
        a, _, g2, s2 = jax.lax.sort(
            (mix(c, i), depth, gid, jnp.arange(m, dtype=jnp.int32)),
            num_keys=2, is_stable=True)
        return a + (g2 & 1) + (s2 & 1)

    def sortB(c, i):
        key = (mix(c, i) << 22) | depth
        a, g2 = jax.lax.sort((key, gid), num_keys=1, is_stable=True)
        return (a >> 22) + (g2 & 1)

    def blockC(c, i):
        tb = mix(c, i).reshape(nb, B)
        gb = gid.reshape(nb, B)
        a, g2 = jax.lax.sort((tb, gb), dimension=1, num_keys=1,
                             is_stable=True)
        return (a + (g2 & 1)).reshape(-1)

    def blockC2(c, i):
        key = ((mix(c, i) << 22) | depth).reshape(nb, B)
        gb = gid.reshape(nb, B)
        a, g2 = jax.lax.sort((key, gb), dimension=1, num_keys=1,
                             is_stable=True)
        return ((a >> 22) + (g2 & 1)).reshape(-1)

    def gather8(c, i):
        out = c.at[perm].get(mode="promise_in_bounds")
        return out + (i & 1)

    def gather1(c, i):
        out = c.at[perm].get(mode="promise_in_bounds")
        return out + (i & 1)

    def scatter1(c, i):
        out = jnp.zeros(m, jnp.int32).at[perm].set(c, mode="drop")
        return out + (i & 1)

    def sorted_scatter(c, i):
        # strictly-increasing positions (the current realign's scatter)
        out = jnp.zeros(m, jnp.int32).at[
            jnp.arange(m, dtype=jnp.int32)].set(c, mode="drop",
                                                indices_are_sorted=True)
        return out + (i & 1)

    def lut_gather(c, i):
        lut = jnp.arange(nb * (T + 1), dtype=jnp.int32)
        b = jnp.arange(m, dtype=jnp.int32) // B
        out = lut.at[b * (T + 1) + mix(c, i) % (T + 1)].get(
            mode="promise_in_bounds")
        return out

    def searchsortedG(c, i):
        ts = jnp.sort(mix(c, i).reshape(nb, B), axis=1)
        tids = jnp.arange(T, dtype=jnp.int32)
        starts = jax.vmap(
            lambda row: jnp.searchsorted(row, tids))(ts).astype(
                jnp.int32)
        pad = jnp.zeros(m - nb * T, jnp.int32)
        return jnp.concatenate([starts.reshape(-1), pad])

    bench = {
        "sortA_2key_4ops_ms": (sortA, tile0),
        "sortB_1key_2ops_ms": (sortB, tile0),
        "blockC_1key_2ops_ms": (blockC, tile0),
        "blockC2_packed_ms": (blockC2, tile0),
        "gather_8lane_ms": (gather8, rows0),
        "gather_1lane_ms": (gather1, gid),
        "scatter_1lane_ms": (scatter1, gid),
        "sorted_scatter_ms": (sorted_scatter, gid),
        "lut_small_table_ms": (lut_gather, tile0),
        "sort_plus_searchsorted_ms": (searchsortedG, tile0),
    }
    only = args.only
    out = {"m": m, "nb": nb, "B": B}
    for name, (fn, init) in bench.items():
        if only and not any(o in name for o in only):
            continue
        out[name] = round(timed(fn, init), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
