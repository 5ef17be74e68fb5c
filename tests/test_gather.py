"""monotone_gather (block-diagonal MXU gather) vs plain table[:, idx]."""

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.raster.gather import BLOCK, SPAN, monotone_gather


def _dense_monotone_idx(rng, n, m):
    """Non-decreasing idx covering every id in [idx.min(), idx.max()]
    at least once (the density contract)."""
    counts = rng.integers(1, 6, n)
    stream = np.repeat(np.arange(n, dtype=np.int32), counts)
    if len(stream) >= m:
        return stream[:m]
    return np.pad(stream, (0, m - len(stream)), mode="edge")


def _run(table, idx):
    tp = np.pad(table, ((0, 0), (0, SPAN + 128)))
    out = monotone_gather(jnp.asarray(tp), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[:, idx])


def test_monotone_gather_matches_plain_gather():
    rng = np.random.default_rng(0)
    n, m, c = 700, 3000, 12
    table = rng.normal(0, 1, (c, n)).astype(np.float32)
    _run(table, _dense_monotone_idx(rng, n, m))


def test_monotone_gather_bit_exact_on_integer_values():
    """Integer-valued f32 columns (expansion offsets up to 2^23) must
    round-trip EXACTLY through the one-hot matmul — HIGHEST precision's
    3-way bf16 split covers all 24 mantissa bits (HIGH would corrupt
    the bottom 8 bits and break int32 truncation downstream)."""
    rng = np.random.default_rng(3)
    n, m = 1500, 4000
    table = np.stack([
        rng.integers(0, 1 << 23, n).astype(np.float32),
        rng.integers(0, 1024, n).astype(np.float32),
        rng.normal(0, 1, n).astype(np.float32) * 1e-3,
    ])
    idx = _dense_monotone_idx(rng, n, m)
    tp = np.pad(table, ((0, 0), (0, SPAN + 128)))
    out = np.asarray(monotone_gather(jnp.asarray(tp),
                                     jnp.asarray(idx)))
    np.testing.assert_array_equal(out, table[:, idx])
    assert (out[0].astype(np.int32) ==
            table[0, idx].astype(np.int32)).all()


def test_monotone_gather_unaligned_sizes():
    rng = np.random.default_rng(1)
    n, m, c = 1100, BLOCK + 137, 7   # ragged m, non-8 rows
    table = rng.normal(0, 1, (c, n)).astype(np.float32)
    _run(table, _dense_monotone_idx(rng, n, m))


def test_monotone_gather_near_table_end():
    """Blocks whose lo must clamp to n - SPAN still gather exactly."""
    rng = np.random.default_rng(2)
    n, c = SPAN + 200, 5
    table = rng.normal(0, 1, (c, n)).astype(np.float32)
    idx = np.sort(rng.integers(n - 4, n, 2 * BLOCK)).astype(np.int32)
    out = monotone_gather(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[:, idx])
