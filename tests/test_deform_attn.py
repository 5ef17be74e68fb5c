"""Multi-scale deformable attention vs an independent torch oracle.

The oracle composes torch.nn.functional.grid_sample (the library op the
Deformable-DETR paper defines the kernel in terms of) — not any code
from the reference repo — so parity here is against the op's published
semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from goi_tpu.query.deform_attn import (bilinear_sample, deform_attn,
                                       init_deform_attn,
                                       ms_deform_attn_core)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _oracle_core(value, shapes, loc, aw):
    """numpy/torch reference: per level grid_sample + weighted sum."""
    b, _, nh, d = value.shape
    q, nl, p = loc.shape[1], loc.shape[3], loc.shape[4]
    out = np.zeros((b, q, nh, d), np.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(shapes):
        v = value[:, start:start + hh * ww]
        start += hh * ww
        v = torch.from_numpy(
            v.transpose(0, 2, 3, 1).reshape(b * nh, d, hh, ww).copy())
        g = torch.from_numpy(
            (2 * loc[:, :, :, lvl] - 1).transpose(0, 2, 1, 3, 4)
            .reshape(b * nh, q, p, 2).copy())
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False).numpy()  # (b*nh, d, q, p)
        w_ = aw[:, :, :, lvl].transpose(0, 2, 1, 3) \
            .reshape(b * nh, 1, q, p)
        out += (s * w_).sum(-1).reshape(b, nh, d, q) \
            .transpose(0, 3, 1, 2)
    return out.reshape(b, q, nh * d)


def test_core_matches_grid_sample_oracle():
    rng = np.random.default_rng(0)
    shapes = ((8, 12), (4, 6), (2, 3))
    nv = sum(h * w for h, w in shapes)
    b, q, nh, d, p = 2, 7, 4, 8, 3
    value = rng.normal(size=(b, nv, nh, d)).astype(np.float32)
    # locations straddling borders and outside [0,1] to hit zero padding
    loc = rng.uniform(-0.2, 1.2,
                      (b, q, nh, len(shapes), p, 2)).astype(np.float32)
    aw = rng.uniform(0, 1, (b, q, nh, len(shapes), p)).astype(np.float32)
    aw /= aw.reshape(b, q, nh, -1).sum(-1).reshape(b, q, nh, 1, 1)

    got = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)))
    want = _oracle_core(value, shapes, loc, aw)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bilinear_sample_zero_padding_and_centers():
    v = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    # exact pixel centers return the pixel value
    loc = jnp.asarray([[[[ (1 + 0.5) / 4, (2 + 0.5) / 3]]]])
    got = bilinear_sample(v, loc)
    assert np.isclose(float(got[0, 0, 0, 0]), 9.0)
    # far outside -> 0
    loc = jnp.asarray([[[[-1.0, 0.5]]]])
    assert float(bilinear_sample(v, loc)[0, 0, 0, 0]) == 0.0


def test_full_module_shapes_grad_and_reference_init():
    rng = np.random.default_rng(1)
    shapes = ((6, 8), (3, 4))
    nv = sum(h * w for h, w in shapes)
    b, q, e = 2, 5, 32
    params = init_deform_attn(jax.random.key(0), embed_dim=e, n_heads=4,
                              n_levels=2, n_points=4)
    # reference init: zero offset/weight matrices, compass-rose bias
    assert float(jnp.abs(params["sampling_offsets"]["w"]).max()) == 0.0
    bias = np.asarray(params["sampling_offsets"]["b"]).reshape(4, 2, 4, 2)
    np.testing.assert_allclose(np.abs(bias).max(-1),
                               np.tile(np.arange(1, 5), (4, 2, 1)),
                               atol=1e-5)

    query = jnp.asarray(rng.normal(size=(b, q, e)).astype(np.float32))
    value = jnp.asarray(rng.normal(size=(b, nv, e)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, 2, 2))
                      .astype(np.float32))

    out = deform_attn(params, query, value, ref, shapes, n_heads=4,
                      n_points=4)
    assert out.shape == (b, q, e)
    assert np.isfinite(np.asarray(out)).all()

    # box-form reference points + padding mask + grads all finite
    ref4 = jnp.concatenate([ref, jnp.full((b, q, 2, 2), 0.3)], -1)
    mask = jnp.zeros((b, nv), bool).at[:, :10].set(True)

    def loss(p_):
        return jnp.sum(deform_attn(p_, query, value, ref4, shapes,
                                   n_heads=4, n_points=4,
                                   key_padding_mask=mask) ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # value_proj must receive gradient through the sampling
    assert float(jnp.abs(g["value_proj"]["w"]).sum()) > 0
