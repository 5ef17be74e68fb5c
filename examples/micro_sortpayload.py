"""How does XLA TPU sort cost scale with payload operand count?

If the answer is 'barely' (stage-latency-bound, not bandwidth-bound),
the binning redesign can carry all ~24 per-instance feature columns
THROUGH the sort as payloads — deleting the instance-scale pack gather
(~20 ms of per-element XLA gather at 2.46M rows) entirely.

Also measures: the current _pack_impl-style random row gather (the
blend's hidden pack cost) and a Pallas block-diagonal one-hot matmul
gather for MONOTONE indices (the expand-side alternative).

Run: python examples/micro_sortpayload.py [sort4|sort12|sort28|pack|mono]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2_461_696)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("only", nargs="*")
    args = ap.parse_args()

    from goi_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    m, n, iters = args.m, args.n, args.iters
    rng = np.random.default_rng(0)
    tile0 = jnp.asarray(rng.integers(0, 1025, m).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 2 ** 22, m).astype(np.int32))
    payload_f = [jnp.asarray(rng.normal(0, 1, m).astype(np.float32))
                 for _ in range(26)]
    table = jnp.asarray(rng.normal(0, 1, (n, 24)).astype(np.float32))
    gid_rand = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    gstream = jnp.sort(jnp.asarray(
        rng.integers(0, n, m).astype(np.int32)))

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
        return jnp.bitwise_xor(c, i & 1023)

    def sort_with(n_payload):
        def fn(c, i):
            ops = (mix(c, i), depth) + tuple(payload_f[:n_payload])
            outs = jax.lax.sort(ops, num_keys=2, is_stable=True)
            acc = outs[0]
            for o in outs[2:]:
                acc = acc + o.astype(jnp.int32)
            return acc
        return fn

    # _pack_impl-style: random (tile-sorted-order) row gather of the
    # per-Gaussian feature matrix at instance scale
    def pack_gather(c, i):
        g = jnp.clip(jnp.bitwise_xor(gid_rand, i & 7), 0, n - 1)
        rows = table.at[g].get(mode="promise_in_bounds")
        return c + rows[:, 0].astype(jnp.int32)

    # Pallas block-diagonal one-hot matmul gather for MONOTONE indices
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 1024      # indices per block
    SPAN = 2048   # table rows a block may cover

    def _mono_kernel(lo_ref, idx_ref, table_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        lo = lo_ref[b]
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(lo, SPAN), :], scratch, sem)
        cp.start()
        idx = idx_ref[0]                       # (B, 1) int32
        local = idx - lo                       # 0..SPAN-1
        onehot = (local == jax.lax.broadcasted_iota(
            jnp.int32, (B, SPAN), 1)).astype(jnp.float32)
        cp.wait()
        out_ref[0] = jax.lax.dot_general(
            onehot, scratch[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    nb = m // B

    def mono_gather(idx_sorted):
        lo = jnp.minimum(idx_sorted.reshape(nb, B)[:, 0],
                         jnp.int32(n - SPAN))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, B, 1), lambda b, lo_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, B, 24),
                                   lambda b, lo_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SPAN, 24), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            _mono_kernel,
            out_shape=jax.ShapeDtypeStruct((nb, B, 24), jnp.float32),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )(lo, idx_sorted.reshape(nb, B, 1), table)
        return out.reshape(nb * B, 24)

    def mono(c, i):
        # iteration-dependence via c: shift indices by a tiny carried
        # amount (stays monotone, changes addresses; no re-sort)
        idx = jnp.minimum(gstream + (c[0] & 1), n - 1)
        rows = mono_gather(idx)
        return c + rows[:, 0].astype(jnp.int32)

    bench = {
        "sort_2key_4ops_ms": (sort_with(2), tile0),
        "sort_2key_8ops_ms": (sort_with(6), tile0),
        "sort_2key_16ops_ms": (sort_with(14), tile0),
        "sort_2key_28ops_ms": (sort_with(26), tile0),
        "pack_gather_24col_ms": (pack_gather, tile0),
        "mono_blockdiag_24col_ms": (mono, tile0),
    }
    out = {"m": m, "n": n}
    for name, (fn, init) in bench.items():
        if args.only and not any(o in name for o in args.only):
            continue
        out[name] = round(timed(fn, init), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
