"""Micro-benchmark: instance-scale row gather/scatter variants on TPU.

The chunked chain reduce's dominant stage is gathering ~2.4M grad rows
into expansion order (CHAIN_PROFILE.json: 75.6 ms = 32 ns/row at
GATHER_LANES=64). This sweeps the design space: lane width (32/64/128),
gather vs unique-row scatter (which would also absorb the 12 ms
perm-inversion scatter), and the sorted boundary gather.

Run: python examples/micro_gather.py
"""

import json
import time

import numpy as np


def main():
    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    m = 2_375_680
    n_gauss = 1_000_000
    rng = np.random.default_rng(0)
    perm = rng.permutation(m).astype(np.int32)
    idx = jnp.asarray(perm)
    bounds = jnp.asarray(np.sort(rng.integers(0, m, n_gauss + 1))
                         .astype(np.int32))
    iters = 20

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

    out = {}
    for lanes in (32, 64, 128):
        rows = jnp.asarray(rng.normal(0, 1, (m, lanes))
                           .astype(np.float32))

        def g(rows):
            r = rows.at[idx].get(mode="promise_in_bounds")
            return jnp.sum(r[:, 0])

        out[f"gather_{lanes}l_ms"] = round(timed(g, rows), 3)

    rows64 = jnp.asarray(rng.normal(0, 1, (m, 64)).astype(np.float32))

    def scat_unique(rows):
        z = jnp.zeros((m, 64), jnp.float32)
        r = z.at[idx].set(rows, mode="drop", unique_indices=True)
        return jnp.sum(r[:, 0])

    out["scatter_rows_64l_ms"] = round(timed(scat_unique, rows64), 3)

    def scat_add(rows):
        z = jnp.zeros((m, 64), jnp.float32)
        r = z.at[idx].add(rows, mode="drop", unique_indices=True)
        return jnp.sum(r[:, 0])

    out["scatter_add_rows_64l_ms"] = round(timed(scat_add, rows64), 3)

    # sorted boundary gather (the blocked reduce's second stage)
    def bg(rows):
        r = rows.at[jnp.minimum(bounds, m - 1)].get(
            mode="promise_in_bounds", indices_are_sorted=True)
        return jnp.sum(r[:, 0])

    out["sorted_boundary_gather_1M_64l_ms"] = round(timed(bg, rows64),
                                                    3)

    # gather with 21 real lanes (no widen-pad), for the fast-path claim
    rows21 = jnp.asarray(rng.normal(0, 1, (m, 21)).astype(np.float32))

    def g21(rows):
        r = rows.at[idx].get(mode="promise_in_bounds")
        return jnp.sum(r[:, 0])

    out["gather_21l_ms"] = round(timed(g21, rows21), 3)

    print(json.dumps(out, indent=1))
    with open("MICRO_GATHER.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
