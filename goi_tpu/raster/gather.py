"""Block-diagonal MXU gather for MONOTONE index streams.

XLA's general gather/scatter on TPU executes per element — measured
~5-40 ns/row at instance scale (examples/micro_binstage.py), which made
the round-2 binning's instance-scale row gathers the hottest part of
the whole render step. For the special case binning actually has —
a NON-DECREASING index stream whose covered id range is DENSE (every id
in [idx[i], idx[j]] occurs at least once, e.g. an expansion stream with
counts >= 1 per id) — the gather collapses to a block-diagonal one-hot
matmul:

  a block of B consecutive indices spans < B distinct ids, so its
  values all come from table[:, lo : lo + SPAN] with lo 128-aligned
  just below idx[block_start]; gathering is
      out_block = table_slice @ onehot(idx - lo)      (C, SPAN)@(SPAN, B)
  one MXU matmul per block, with the table slice arriving as ONE
  contiguous (lane-aligned) DMA.

Everything is FEATURE-MAJOR — table (C, N), output (C, M) — so the
matmul contracts over the span with no 128-lane padding waste, the
DMA slices are lane-aligned, and the output block offsets (multiples
of B=256) are lane-aligned too. C pads to the 8-row f32 sublane tile.

The matmul runs at Precision.HIGHEST: the one-hot side is 0/1
(bf16-exact), and HIGHEST's 3-way bf16 splitting of the table operand
covers all 24 fp32 mantissa bits, so gathered values are BIT-EXACT
copies (1*x reproduces x; HIGH's 2-way split would corrupt the bottom
8 bits — fatal for integer-valued columns like expansion offsets).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256   # indices per block (one one-hot matmul)
SPAN = 512    # table lanes per block: 128-aligned lo + <B ids + slack


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(lo_ref, idx_ref, table_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[b], 128)
    cp = pltpu.make_async_copy(
        table_ref.at[:, pl.ds(lo, SPAN)], scratch, sem)
    cp.start()
    idx = idx_ref[0]                          # (1, BLOCK) int32
    local = idx - lo                          # 0..SPAN-1
    onehot = (local == jax.lax.broadcasted_iota(
        jnp.int32, (SPAN, BLOCK), 0)).astype(jnp.float32)
    cp.wait()
    out_ref[...] = jax.lax.dot_general(
        scratch[...], onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


@jax.jit
def monotone_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table (C, N) f32 feature-major, idx (M,) int32 NON-DECREASING
    with dense coverage (see module docstring) -> (C, M) ==
    table[:, idx]. Bit-exact.

    M pads to BLOCK internally (edge-repeated indices); C pads to the
    8-row sublane tile; N must be >= SPAN + 128 (pad the table)."""
    c, n = table.shape
    m = idx.shape[0]
    assert n >= SPAN + 128, (n, SPAN)
    mp = -(-m // BLOCK) * BLOCK
    cp8 = -(-c // 8) * 8
    if mp != m:
        idx = jnp.pad(idx, (0, mp - m), mode="edge")
    if cp8 != c:
        table = jnp.pad(table, ((0, cp8 - c), (0, 0)))
    nb = mp // BLOCK
    idx2 = idx.reshape(nb, 1, BLOCK)
    lo = jnp.minimum((idx2[:, 0, 0] // 128) * 128,
                     jnp.int32(n - SPAN))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK), lambda b, lo_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((cp8, BLOCK),
                               lambda b, lo_: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cp8, SPAN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((cp8, mp), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(lo, idx2, table)
    return out[:c, :m]
