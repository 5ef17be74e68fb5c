"""Sub-stage micro-benchmark of binning's expand + realign at 1M scale.

profile_binning shows expand ~20 ms and realign ~21 ms dominating the
binning stage (the sort is only ~8 ms). This isolates each candidate
offender with loop-carried timing (no LICM artifacts):

  expand:  mark scatter (N) | cummax (M) | 9-col sorted info gather (M)
           | int div/mod (M) | cull float math (M)
  realign: searchsorted (T into M) | (T,2) lut gather (M) |
           sorted scatter (M) | CHUNKED slice-gather alternative

Run: python examples/micro_binstage.py [--n 1000000]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=2_461_696)
    ap.add_argument("--tiles", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("only", nargs="*",
                    help="substring filter of benchmarks to run")
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    n, m, T, iters = args.n, args.m, args.tiles, args.iters
    K = 128
    rng = np.random.default_rng(0)
    info9 = jnp.asarray(rng.integers(0, 2 ** 20, (n, 9)).astype(np.int32))
    gstream0 = jnp.sort(jnp.asarray(
        rng.integers(0, n, m).astype(np.int32)))
    vals0 = jnp.asarray(rng.integers(0, 2 ** 20, m).astype(np.int32))
    w0 = jnp.asarray(rng.integers(1, 9, m).astype(np.int32))
    f0 = jnp.asarray(rng.normal(0, 1, (m,)).astype(np.float32))

    def timed(step1, init):
        def many(c):
            return jax.lax.fori_loop(
                0, iters, lambda i, c: step1(c, i), c)

        f = jax.jit(many)
        out = jax.block_until_ready(f(init))
        t0 = time.time()
        jax.block_until_ready(f(out))
        return (time.time() - t0) / iters * 1000.0

    def mix(c, i):
        return jnp.bitwise_xor(c, i & 7)

    # -- expand sub-stages --
    def mark_scatter(c, i):
        g_idx = jnp.arange(n, dtype=jnp.int32)
        base = jnp.clip(mix(c, i)[:n], 0, m - 1)
        mark = jnp.zeros(m, jnp.int32).at[base].set(g_idx, mode="drop")
        return jnp.concatenate([mark[:n], c[n:]])

    def cummax(c, i):
        return jax.lax.cummax(mix(c, i))

    def info_gather9(c, i):
        g = jnp.clip(mix(c, i), 0, n - 1)
        rows = info9.at[g].get(indices_are_sorted=True,
                               mode="promise_in_bounds")
        return g + rows[:, 0] + rows[:, 8]

    def info_gather3(c, i):
        g = jnp.clip(mix(c, i), 0, n - 1)
        rows = info9[:, :3].at[g].get(indices_are_sorted=True,
                                     mode="promise_in_bounds")
        return g + rows[:, 0] + rows[:, 2]

    def divmod_int(c, i):
        local = mix(c, i) & 0xFFFF
        tx = local % w0
        ty = local // w0
        return tx + ty + c

    def divmod_float(c, i):
        local = (mix(c, i) & 0xFFFF).astype(jnp.float32)
        wf = w0.astype(jnp.float32)
        ty = jnp.floor(local / wf)
        tx = local - ty * wf
        return tx.astype(jnp.int32) + ty.astype(jnp.int32) + c

    def cull_math(c, i):
        x = f0 * (1.0 + (i & 1).astype(jnp.float32) * 1e-6)
        lx = x + c.astype(jnp.float32) * 1e-9
        ux = lx + 15.0
        ca = jnp.abs(x) + 0.5
        cb = x * 0.1
        cc = jnp.abs(x) + 0.7

        def q_at(dx, dy):
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        dy_l = jnp.clip(-cb * lx / cc, lx, ux)
        dy_u = jnp.clip(-cb * ux / cc, lx, ux)
        min_q = jnp.minimum(q_at(lx, dy_l), q_at(ux, dy_u))
        return c + (min_q > 1.0).astype(jnp.int32)

    # -- realign sub-stages --
    tids = jnp.arange(T, dtype=jnp.int32)

    def lut_gather(c, i):
        lut = jnp.stack([tids * 3, tids * 5], axis=1)
        t = jnp.clip(mix(c, i) % T, 0, T - 1)
        rows = lut.at[t].get(mode="promise_in_bounds")
        return c + rows[:, 0] + rows[:, 1]

    def sorted_scatter(c, i):
        pos = jnp.arange(m, dtype=jnp.int32)
        out = jnp.full(m, -1, jnp.int32).at[pos].set(
            mix(c, i), mode="drop", indices_are_sorted=True)
        return out

    def chunk_slice_gather(c, i):
        # the chunked-realign alternative: n_chunks slice-gathers of K
        nc = m // K
        starts = (jnp.arange(nc, dtype=jnp.int32) * K
                  + (mix(c, i)[:nc] & 0)).reshape(nc, 1)
        out = jax.lax.gather(
            c, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,), operand_batching_dims=(),
                start_indices_batching_dims=()),
            slice_sizes=(K,), mode=jax.lax.GatherScatterMode.CLIP)
        return out.reshape(-1)

    out = {"n": n, "m": m}
    bench = {
        "mark_scatter_N_ms": (mark_scatter, vals0),
        "cummax_M_ms": (cummax, vals0),
        "info_gather9_M_ms": (info_gather9, gstream0),
        "info_gather3_M_ms": (info_gather3, gstream0),
        "divmod_int_M_ms": (divmod_int, vals0),
        "divmod_float_M_ms": (divmod_float, vals0),
        "cull_math_M_ms": (cull_math, vals0),
        "lut_gather_M_ms": (lut_gather, vals0),
        "sorted_scatter_M_ms": (sorted_scatter, vals0),
        "chunk_slice_gather_M_ms": (chunk_slice_gather, vals0),
    }
    import sys
    only = [a for a in sys.argv[1:] if not a.startswith("--")
            and not a.isdigit()]
    for name, (fn, init) in bench.items():
        if only and not any(o in name for o in only):
            continue
        out[name] = round(timed(fn, init), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
