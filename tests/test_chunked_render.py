"""Chunked-layout render/trace vs the aligned layout and the oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.raster import RasterConfig, render, trace
from tests.conftest import make_random_scene, make_test_camera

CHUNKED = RasterConfig(max_instances=1 << 14, backend="pallas")
ALIGNED = RasterConfig(max_instances=1 << 14, backend="pallas",
                       layout="aligned", reduce="scatter")


def test_chunked_forward_matches_aligned():
    """Same sort order, same math — the chunked forward matches the
    aligned one to ~1 ulp (the floor-walk slices a tile's instance
    stream into different CHUNK groupings, so the per-chunk log-space
    cumprod associates the transmittance product differently at chunk
    boundaries; masked boundary lanes contribute exactly nothing)."""
    scene = make_random_scene(n=600, seed=11)
    cam = make_test_camera(width=80, height=48, angle=0.3)
    bg = jnp.array([0.2, 0.0, 1.0])
    oc = render(scene, cam, bg, CHUNKED)
    oa = render(scene, cam, bg, ALIGNED)
    for k in ("render", "semantics", "depth", "alpha"):
        np.testing.assert_allclose(np.asarray(oc[k]),
                                   np.asarray(oa[k]),
                                   rtol=3e-6, atol=3e-6, err_msg=k)


def test_chunked_gradients_match_aligned():
    scene = make_random_scene(n=400, seed=12)
    cam = make_test_camera(width=64, height=48)
    bg = jnp.zeros(3)

    def grads(cfg):
        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return (jnp.sum(out["render"] ** 2)
                    + jnp.sum(out["semantics"] ** 2)
                    + jnp.sum(out["depth"]) + jnp.sum(out["alpha"]))

        return jax.grad(loss)(scene.params())

    gc = grads(CHUNKED)
    ga = grads(ALIGNED)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(ga)):
        # the layouts group the SAME instances into different chunks
        # (~1 ulp transmittance association noise), and the chunked
        # default reduce is the prefix-difference chain whose tiny
        # per-Gaussian sums carry absolute noise ~ eps * prefix
        # magnitude (same tolerance as the aligned cumsum tests;
        # oracle-level agreement is pinned separately by
        # test_pallas_gradients_match_oracle on the chunked default)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_chunked_trace_matches_aligned():
    scene = make_random_scene(n=500, seed=13)
    cam = make_test_camera(width=64, height=48)
    feat = jax.random.normal(jax.random.PRNGKey(0),
                             (scene.sem_dim, 48, 64))
    tc = trace(scene, cam, feat, jnp.zeros(3), CHUNKED)
    ta = trace(scene, cam, feat, jnp.zeros(3), ALIGNED)
    np.testing.assert_array_equal(np.asarray(tc["num_gsem"]),
                                  np.asarray(ta["num_gsem"]))
    np.testing.assert_allclose(
        np.asarray(tc["gaussian_semantics"]),
        np.asarray(ta["gaussian_semantics"]), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(tc["render"]),
                               np.asarray(ta["render"]),
                               rtol=3e-6, atol=3e-6)


def test_chunked_overflow_detection_and_rebudget():
    """Undersized budget: num_slots reports the true (forced-slot
    inclusive) demand; a regrown budget renders identically to a
    roomy one."""
    scene = make_random_scene(n=500, seed=14, spread=0.3)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3)
    small = RasterConfig(max_instances=1 << 9, backend="pallas")
    out_small = render(scene, cam, bg, small)
    demand = int(out_small["num_slots"])
    assert demand > 1 << 9
    import dataclasses
    regrown = dataclasses.replace(small, max_instances=-(-demand
                                                         // 128) * 128)
    roomy = dataclasses.replace(small, max_instances=1 << 15)
    o1 = render(scene, cam, bg, regrown)
    o2 = render(scene, cam, bg, roomy)
    np.testing.assert_allclose(np.asarray(o1["render"]),
                               np.asarray(o2["render"]),
                               rtol=3e-6, atol=3e-6)


def test_chunked_chain_matches_scatter_reduce():
    """reduce='chain' (sort-permutation inversion + expansion-order
    prefix sums) must produce the same gradients as the chunked
    transported-key scatter (to fp32 prefix rounding)."""
    import dataclasses
    scene = make_random_scene(n=400, seed=15)
    cam = make_test_camera(width=64, height=48)
    bg = jnp.zeros(3)

    def grads(reduce):
        cfg = dataclasses.replace(CHUNKED, reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return (jnp.sum(out["render"] ** 2)
                    + jnp.sum(out["semantics"] ** 2)
                    + jnp.sum(out["depth"]) + jnp.sum(out["alpha"]))

        return jax.grad(loss)(scene.params())

    gs = grads("scatter")
    gc = grads("chain")
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(gc))


def test_chunked_chain_overflow_masks_dropped_instances():
    """Budget overflow: clamped bounds + sentinel stream positions must
    keep the chain's sums equal to the scatter's on the same truncated
    binning."""
    import dataclasses
    scene = make_random_scene(n=300, seed=16, spread=0.3)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3)

    def grads(reduce):
        cfg = RasterConfig(max_instances=1 << 10, backend="pallas",
                           reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["alpha"])

        return jax.grad(loss)(scene.params())

    gs = grads("scatter")
    gc = grads("chain")
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
