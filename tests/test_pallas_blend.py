"""Pallas blend kernels (interpret mode on CPU) vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goi_tpu.raster import RasterConfig, render
from goi_tpu.raster.reference import render_reference
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 14, tile_cap=512, chunk=64,
                   backend="pallas")


@pytest.mark.parametrize("seed,n,wh", [
    (0, 300, (64, 48)),
    (2, 50, (40, 40)),
])
def test_pallas_forward_matches_oracle(seed, n, wh):
    scene = make_random_scene(n=n, seed=seed)
    cam = make_test_camera(width=wh[0], height=wh[1], angle=0.2 * seed)
    bg = jnp.array([1.0, 1.0, 1.0]) if seed % 2 else jnp.zeros(3)

    ref = render_reference(scene, cam, bg)
    out = render(scene, cam, bg, CFG)
    for key in ("render", "semantics", "depth", "alpha"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]),
            rtol=5e-5, atol=5e-5, err_msg=key)


def test_pallas_gradients_match_oracle():
    scene = make_random_scene(n=120, seed=3)
    cam = make_test_camera(width=32, height=32)
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(0)
    tgt_c = jax.random.normal(key, (3, 32, 32))
    tgt_s = jax.random.normal(key, (10, 32, 32))

    def loss_fn(render_fn):
        def f(xyz, sem, opa, scaling, rot, fdc):
            s = scene.replace(xyz=xyz, semantics=sem, opacity=opa,
                              scaling=scaling, rotation=rot,
                              features_dc=fdc)
            out = render_fn(s)
            return (jnp.sum(out["render"] * tgt_c)
                    + jnp.sum(out["semantics"] * tgt_s)
                    + jnp.sum(out["depth"]) * 0.1
                    + jnp.sum(out["alpha"]) * 0.1)
        return f

    args = (scene.xyz, scene.semantics, scene.opacity, scene.scaling,
            scene.rotation, scene.features_dc)
    g_fast = jax.grad(loss_fn(lambda s: render(s, cam, bg, CFG)),
                      argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_fn(lambda s: render_reference(s, cam, bg)),
                     argnums=tuple(range(6)))(*args)
    names = ["xyz", "semantics", "opacity", "scaling", "rotation", "f_dc"]
    for name, a, b in zip(names, g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_sorted_reduce_matches_scatter_reduce():
    """RasterConfig(reduce='sorted') must produce the same gradients as
    the default scatter reduction — same sums, different hardware path
    (gather + sorted segment-sum vs random scatter-add)."""
    import jax

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=400, seed=21)
    cam = make_test_camera(width=64, height=48)
    bg = jnp.zeros(3)

    def grads(reduce):
        cfg = RasterConfig(max_instances=1 << 14, backend="pallas",
                           layout="aligned", reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return (jnp.sum(out["render"] ** 2)
                    + jnp.sum(out["semantics"] ** 2)
                    + jnp.sum(out["depth"]) + jnp.sum(out["alpha"]))

        return jax.grad(loss)(scene.params())

    ga = grads("scatter")
    gb = grads("sorted")
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # and both are finite
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(gb))


def test_sorted_reduce_overflow_masks_dropped_instances():
    """With a too-small budget (clamp drops instances mid-stream) the
    sorted reduce must still mask dropped rows and keep keys sorted:
    grads must match the scatter reduce exactly on the same truncated
    binning."""
    import jax

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=300, seed=22, spread=0.3)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3)

    def grads(reduce):
        # deliberately small: forces aligned-overflow truncation
        cfg = RasterConfig(max_instances=1 << 10, backend="pallas",
                           layout="aligned", reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["alpha"])

        return jax.grad(loss)(scene.params())

    ga = grads("scatter")
    gb = grads("sorted")
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_cumsum_reduce_matches_scatter_reduce():
    """RasterConfig(reduce='cumsum') — expansion-order gather +
    two-level MXU prefix sum + boundary difference — must produce the
    same gradients as the default scatter reduction (to fp32 rounding:
    the summation order differs)."""
    import jax

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=400, seed=23)
    cam = make_test_camera(width=64, height=48)
    bg = jnp.zeros(3)

    def grads(reduce):
        cfg = RasterConfig(max_instances=1 << 14, backend="pallas",
                           layout="aligned", reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return (jnp.sum(out["render"] ** 2)
                    + jnp.sum(out["semantics"] ** 2)
                    + jnp.sum(out["depth"]) + jnp.sum(out["alpha"]))

        return jax.grad(loss)(scene.params())

    ga = grads("scatter")
    gb = grads("cumsum")
    # fp32 prefix-difference cancellation: the chain subtracts two
    # large running prefixes, so tiny per-Gaussian sums carry absolute
    # noise ~ eps * prefix magnitude (same error class as the CUDA
    # reference's fp32 atomicAdd accumulation)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(gb))


def test_cumsum_reduce_overflow_masks_dropped_instances():
    """Budget overflow (truncated expansion + clamp-dropped aligned
    slots) must not leak uninitialized rows into the prefix chain: the
    clamped boundaries make truncated tails fall out of every segment
    and sentinel stream_pos rows are zeroed."""
    import jax

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=300, seed=24, spread=0.3)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3)

    def grads(reduce):
        cfg = RasterConfig(max_instances=1 << 10, backend="pallas",
                           layout="aligned", reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["alpha"])

        return jax.grad(loss)(scene.params())

    ga = grads("scatter")
    gb = grads("cumsum")
    # fp32 prefix-difference cancellation: the chain subtracts two
    # large running prefixes, so tiny per-Gaussian sums carry absolute
    # noise ~ eps * prefix magnitude (same error class as the CUDA
    # reference's fp32 atomicAdd accumulation)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_auto_reduce_resolves_by_budget():
    """reduce='auto' picks scatter below the measured crossover and
    cumsum above it, keyed on the ALIGNED budget when decoupled."""
    from goi_tpu.raster.render import (AUTO_CUMSUM_MIN, RasterConfig,
                                       _effective_reduce)

    small = RasterConfig(max_instances=1 << 14, backend="pallas",
                         layout="aligned")
    assert _effective_reduce(small) == "scatter"
    big = RasterConfig(max_instances=AUTO_CUMSUM_MIN, backend="pallas",
                       layout="aligned")
    assert _effective_reduce(big) == "cumsum"
    decoupled = RasterConfig(max_instances=AUTO_CUMSUM_MIN * 4,
                             max_binned=1 << 14, backend="pallas",
                             layout="aligned")
    assert _effective_reduce(decoupled) == "scatter"
    explicit = RasterConfig(max_instances=1 << 24, reduce="sorted",
                            layout="aligned")
    assert _effective_reduce(explicit) == "sorted"
    # chunked layout defaults to the permutation chain; explicit
    # scatter stays selectable
    chunked = RasterConfig(max_instances=1 << 24, backend="pallas")
    assert _effective_reduce(chunked) == "chain"
    import dataclasses
    ch_sc = dataclasses.replace(chunked, reduce="scatter")
    assert _effective_reduce(ch_sc) == "scatter"
