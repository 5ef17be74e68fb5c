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


import pytest


@pytest.mark.parametrize("seed", [15, 21, 22, 23, 24])
def test_chunked_chain_matches_scatter_reduce(seed):
    """reduce='chain' (sort-permutation inversion + expansion-order
    block-local prefix sums) must produce the same gradients as the
    chunked transported-key scatter. Round 4: the reduce's rounding now
    scales with block/segment magnitude (_blocked_segment_reduce), not
    the global prefix — the round-3 version failed this bar at seed 15
    (5.2e-4 abs vs 5e-4). Multi-seed to pin it beyond one draw; a
    20-seed sweep is recorded in BASELINE.md."""
    import dataclasses
    scene = make_random_scene(n=400, seed=seed)
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


def test_chunked_chain_wide_semantics():
    """sem_dim > 54 pushes the grad-row width d = 10 + sem_dim past
    GATHER_LANES=64: round 3's unconditional jnp.pad(…, GATHER_LANES-d)
    raised at trace time on this supported config (ADVICE r3); the
    reduce must now skip the widen-pad and still match scatter."""
    import dataclasses
    scene = make_random_scene(n=200, seed=25, sem_dim=60)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3)

    def grads(reduce):
        cfg = dataclasses.replace(CHUNKED, reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return (jnp.sum(out["render"] ** 2)
                    + jnp.sum(out["semantics"] ** 2)
                    + jnp.sum(out["alpha"]))

        return jax.grad(loss)(scene.params())

    gs = grads("scatter")
    gc = grads("chain")
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_blocked_segment_reduce_million_rows_vs_fp64():
    """The chain/cumsum reduce's numerical core at PRODUCTION instance
    counts (VERDICT r3 item 2): 1.2M expansion rows -> 500k Gaussians,
    adversarial magnitude spread (1e-3..1e3 row scales, so tiny
    segments sit next to dominating ones), against an exact float64
    segment-sum oracle. Bounds include empty and block-spanning
    segments. The round-3 global-prefix reduce shows ~1e-2 absolute
    error here (eps * global prefix ~ 2^-24 * 1e5+); block-local
    scaling keeps it ~1e-5."""
    from goi_tpu.raster.pallas_blend import _blocked_segment_reduce

    m, n_gauss, d = 1_200_000, 500_000, 21
    rng = np.random.default_rng(77)
    scale = 10.0 ** rng.uniform(-3, 3, size=(m, 1)).astype(np.float32)
    rows = (rng.standard_normal((m, d), np.float32) * scale)
    # segment sizes: mostly 1-4 (typical tiles/Gaussian), a heavy tail
    sizes = rng.geometric(0.45, size=n_gauss)
    sizes[rng.integers(0, n_gauss, 200)] += rng.integers(
        512, 4096, 200)  # block-spanning segments
    sizes[rng.integers(0, n_gauss, 1000)] = 0  # empty segments
    bounds = np.zeros(n_gauss + 1, np.int64)
    np.cumsum(sizes, out=bounds[1:])
    bounds = np.minimum(bounds, m).astype(np.int32)

    acc = np.asarray(_blocked_segment_reduce(
        jnp.asarray(rows), jnp.asarray(bounds), d))

    ref = np.add.reduceat(
        np.vstack([rows.astype(np.float64), np.zeros((1, d))]),
        bounds, axis=0)[:n_gauss]
    ref[bounds[:-1] == bounds[1:]] = 0.0  # reduceat quirk: empty segs
    err = np.abs(acc - ref)
    # error budget: eps * block content magnitude (512 rows at scale up
    # to 1e3). Measured: new reduce max_abs 0.017 / max_rel(|ref|>1)
    # 1.9e-3 / p99.9_abs 8.5e-4; the round-3 global-prefix version
    # fails ALL three bounds below (0.094 / 0.059 / 0.029).
    assert np.max(err) < 0.05, np.max(err)
    assert np.quantile(err, 0.999) < 5e-3, np.quantile(err, 0.999)
    big = np.abs(ref) > 1.0
    assert np.max(err[big] / np.abs(ref[big])) < 5e-3


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


def _chain_vs_scatter_grads(n, width, height, seed=31, sem_dim=10):
    """Full blend_vjp (perm inversion + expansion gather + blocked
    reduce) chain-vs-scatter agreement on one shared binning."""
    import dataclasses
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.render import suggest_budgets
    scene = make_random_scene(n=n, seed=seed, sem_dim=sem_dim,
                              spread=1.0)
    cam = make_test_camera(width=width, height=height)
    bg = jnp.zeros(3)
    mi, mb = suggest_budgets(scene, cam, margin=1.2)
    tgt = jax.random.normal(jax.random.PRNGKey(0),
                            (3, height, width))

    def grads(reduce):
        cfg = RasterConfig(max_instances=mi, max_binned=mb,
                           backend="pallas", reduce=reduce)

        def loss(params):
            out = render(scene.with_params(params), cam, bg, cfg)
            return (jnp.mean(jnp.abs(out["render"] - tgt))
                    + jnp.mean(jnp.abs(out["semantics"])))

        return jax.jit(jax.grad(loss))(scene.params())

    gs = grads("scatter")
    gc = grads("chain")
    for k in gs:
        a, b = np.asarray(gs[k]), np.asarray(gc[k])
        # same sums, different association (blocked prefix vs direct
        # scatter): fp32 rounding-level agreement, magnitude-relative
        scale = np.maximum(np.abs(a), np.quantile(np.abs(a), 0.99))
        np.testing.assert_array_less(
            np.abs(a - b), 5e-3 * scale + 5e-5,
            err_msg=f"{k}: chain vs scatter diverge")


def test_chain_vs_scatter_full_vjp_reduced():
    """CI-sized end-to-end chain pin (VERDICT r4 item 8): the fp64
    oracle covers _blocked_segment_reduce alone; this runs the FULL
    chain (perm inversion + gather + reduce) against the scatter
    reduce through blend_vjp."""
    _chain_vs_scatter_grads(n=1200, width=64, height=48)


import os as _os
import pytest as _pytest


@_pytest.mark.skipif(
    not _os.environ.get("GOI_SCALE_TEST"),
    reason="set GOI_SCALE_TEST=1 on a TPU host (full 1M-scale chain "
           "agreement; conftest then leaves the platform alone)")
def test_chain_vs_scatter_full_vjp_1m():
    """Production-count end-to-end chain agreement on the chip: the
    same full blend_vjp pin at the 1M-Gaussian headline scale (~2M
    instances through perm inversion, the 64-lane expansion gather,
    and the blocked segment reduce)."""
    _chain_vs_scatter_grads(n=1_000_000, width=512, height=512,
                            sem_dim=10)


def test_dense_boundary_reduce_million_rows_vs_fp64():
    """fp64 oracle for the round-5 FUSED dense-bounds reduce
    (_dense_boundary_reduce: in-kernel boundary compaction instead of
    the inner-prefix round trip + sorted gather). Same adversarial
    magnitude spread as the general-path oracle, dense segments
    (sizes >= 1, the chain's counts' = max(counts, 1) invariant),
    block-spanning segments, an ok-mask, and a clamped overflow tail."""
    from goi_tpu.raster.pallas_blend import _dense_boundary_reduce

    m, n_gauss, d = 1_048_576, 500_000, 64   # m % 512 == 0
    rng = np.random.default_rng(99)
    scale = 10.0 ** rng.uniform(-3, 3, size=(m, 1)).astype(np.float32)
    rows = (rng.standard_normal((m, d), np.float32) * scale)
    ok = (rng.uniform(size=m) > 0.05)
    sizes = rng.geometric(0.45, size=n_gauss).astype(np.int64)
    sizes[rng.integers(0, n_gauss, 100)] += rng.integers(512, 4096, 100)
    bounds_raw = np.zeros(n_gauss + 1, np.int64)
    np.cumsum(sizes, out=bounds_raw[1:])
    # overflow-style clamp: demand may exceed m -> duplicates at m only
    p = np.minimum(bounds_raw, m).astype(np.int32)
    ind = np.zeros(m, np.float32)
    ind[p[p < m]] = 1.0

    acc = np.asarray(_dense_boundary_reduce(
        jnp.asarray(rows), jnp.asarray(p), jnp.asarray(ind)[:, None],
        d, okf=jnp.asarray(ok.astype(np.float32))[:, None]))

    rows64 = rows.astype(np.float64) * ok[:, None]
    ref = np.add.reduceat(
        np.vstack([rows64, np.zeros((1, d))]), p, axis=0)[:n_gauss]
    ref[p[:-1] == p[1:]] = 0.0
    err = np.abs(acc - ref)
    assert np.max(err) < 0.05, np.max(err)
    assert np.quantile(err, 0.999) < 5e-3, np.quantile(err, 0.999)
    big = np.abs(ref) > 1.0
    assert np.max(err[big] / np.abs(ref[big])) < 5e-3
