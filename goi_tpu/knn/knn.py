"""Mean 3-nearest-neighbor squared distance (simple-knn equivalent).

XLA-friendly re-design of the reference CUDA op
(ref:submodules/simple-knn/simple_knn.cu:119-182, spatial.cu:15-26) used
once to set initial Gaussian scales (ref:scene/gaussian_model.py:147).

The CUDA version Morton-sorts points, then searches box-pruned
neighborhoods. Here: Morton sort + fixed +-window search in Morton order
(windowed gathers and a top-k, all dense XLA), with an exact brute-force
path for small N. Faithfully reproduces a reference quirk: the
candidate set includes the query point itself, so distance 0 occupies
one of the 3 best slots and the result is effectively
(d1^2 + d2^2) / 3 over the two nearest true neighbors
(ref:simple_knn.cu:154-182 — updateKBest is also fed points[idx]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _morton10(x: jax.Array) -> jax.Array:
    """Interleave 10 bits/axis -> 30-bit Morton code
    (ref:simple_knn.cu coord2Morton/prepMorton)."""
    def expand_bits(v):
        v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
        v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
        v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
        v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
        return v

    mn = jnp.min(x, axis=0, keepdims=True)
    mx = jnp.max(x, axis=0, keepdims=True)
    q = (x - mn) / jnp.maximum(mx - mn, 1e-12)
    q = jnp.clip(q * 1023.0, 0, 1023).astype(jnp.uint32)
    ex = expand_bits(q[:, 0])
    ey = expand_bits(q[:, 1])
    ez = expand_bits(q[:, 2])
    return ex * 4 + ey * 2 + ez


@partial(jax.jit, static_argnames=("k", "window", "chunk"))
def mean_knn_dist2(points: jax.Array, *, k: int = 3, window: int = 128,
                   chunk: int = 2048) -> jax.Array:
    """(N, 3) -> (N,) mean of the k smallest squared distances within a
    Morton-window candidate set (self included, matching the CUDA op)."""
    n = points.shape[0]
    if n <= 4096:
        d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, -1)
        small = -jax.lax.top_k(-d2, min(k, n))[0]
        return jnp.mean(small, axis=-1)

    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)
    n_chunks = (n + chunk - 1) // chunk
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def one_pass(pts_perm):
        """Candidates = +-window in Morton order of the (axis-permuted)
        coordinates. Each pass over-estimates (candidate subset), so the
        min over passes is a monotone improvement."""
        code = _morton10(pts_perm)
        order = jnp.argsort(code)
        ps = points[order]

        def do_chunk(c0):
            rows = c0 + jnp.arange(chunk, dtype=jnp.int32)
            rows = jnp.minimum(rows, n - 1)
            raw = rows[:, None] + offs[None, :]
            idx = jnp.clip(raw, 0, n - 1)
            nb = ps[idx]                   # (chunk, 2W+1, 3)
            q = ps[rows][:, None, :]
            d2 = jnp.sum((nb - q) ** 2, axis=-1)
            # clipped (duplicate) candidates at array ends would inject
            # spurious zero self-distances
            d2 = jnp.where((raw >= 0) & (raw < n), d2, jnp.inf)
            small = -jax.lax.top_k(-d2, k)[0]
            return jnp.mean(small, axis=-1)

        out_sorted = jax.lax.map(do_chunk, starts).reshape(-1)[:n]
        return jnp.zeros(n, points.dtype).at[order].set(out_sorted)

    best = one_pass(points)
    for perm in ((1, 2, 0), (2, 0, 1)):
        best = jnp.minimum(best, one_pass(points[:, perm]))
    return best


def init_scales_from_points(points: np.ndarray) -> np.ndarray:
    """sqrt(clamp(mean 3-NN dist^2, 1e-7)) — the per-point isotropic
    scale init (ref:scene/gaussian_model.py:147-148)."""
    d2 = mean_knn_dist2(jnp.asarray(np.asarray(points, np.float32)))
    return np.sqrt(np.maximum(np.asarray(d2), 1e-7))
