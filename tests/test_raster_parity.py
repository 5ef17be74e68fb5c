"""Golden parity: fast tiled rasterizer vs the exact per-pixel oracle.

The oracle (goi_tpu/raster/reference.py) encodes the CUDA blend semantics
(ref:cuda_rasterizer/forward.cu:261-386) in closed form; the tiled path
must match it to float tolerance, including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goi_tpu.raster import RasterConfig, render
from goi_tpu.raster.reference import render_reference
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 14, tile_cap=512, chunk=64)


@pytest.mark.parametrize("seed,n,wh", [
    (0, 300, (64, 48)),
    (1, 1000, (96, 64)),
    (2, 50, (40, 40)),      # W,H not multiples of 16
])
def test_forward_matches_oracle(seed, n, wh):
    scene = make_random_scene(n=n, seed=seed)
    cam = make_test_camera(width=wh[0], height=wh[1], angle=0.2 * seed)
    bg = jnp.array([1.0, 1.0, 1.0]) if seed % 2 else jnp.zeros(3)

    ref = render_reference(scene, cam, bg)
    out = render(scene, cam, bg, CFG)

    for key in ("render", "semantics", "depth", "alpha"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]),
            rtol=2e-5, atol=2e-5, err_msg=key)
    np.testing.assert_array_equal(np.asarray(out["radii"]),
                                  np.asarray(ref["radii"]))


def test_gradients_match_oracle():
    scene = make_random_scene(n=120, seed=3)
    cam = make_test_camera(width=32, height=32)
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(0)
    # random cotangents on all outputs -> scalar loss
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
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_gradients_numeric():
    """Coarse finite-difference sanity check of the fast path.

    The blend has genuine kinks (alpha clamp at 0.99, the 1/255 skip and
    the 1e-4 termination, ref:cuda_rasterizer/forward.cu:349-357), so
    fp32 central differences can land on them; the *precise* gradient
    gate is test_gradients_match_oracle. Here we only require the right
    sign and magnitude."""
    scene = make_random_scene(n=40, seed=5)
    cam = make_test_camera(width=32, height=32)
    bg = jnp.array([0.2, 0.3, 0.4])
    cfg = RasterConfig(max_instances=1 << 12, tile_cap=256, chunk=16)

    def f(opa):
        out = render(scene.replace(opacity=opa), cam, bg, cfg)
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["semantics"] ** 2)

    g = jax.jit(jax.grad(f))(scene.opacity)
    fj = jax.jit(f)
    rng = np.random.default_rng(0)
    ok = 0
    probes = 6
    for _ in range(probes):
        i = int(rng.integers(0, 40))
        eps = 1e-2
        e = jnp.zeros_like(scene.opacity).at[i, 0].set(eps)
        fd = float((fj(scene.opacity + e) - fj(scene.opacity - e))
                   / (2 * eps))
        gi = float(g[i, 0])
        if abs(fd) < 1e-3 and abs(gi) < 1e-3:
            ok += 1
        elif np.sign(fd) == np.sign(gi) and 0.4 < abs(gi / fd) < 2.5:
            ok += 1
    assert ok >= probes - 1, (ok, probes)


def test_early_termination_and_opaque():
    """Near-opaque front Gaussian: background contribution ~0, alpha ~1."""
    scene = make_random_scene(n=100, seed=7)
    # crank opacities to ~0.97 -> T collapses in ~3 splats -> early
    # termination. (Logit 8.0 would clamp alpha to exactly 0.99 and park
    # T*(1-a) precisely on the 1e-4 cutoff, where fp32 associativity
    # differences between the tiled and oracle paths flip inclusion.)
    scene = scene.replace(opacity=jnp.full_like(scene.opacity, 3.5),
                          scaling=scene.scaling + 1.5)
    cam = make_test_camera(width=48, height=48)
    ref = render_reference(scene, cam, jnp.ones(3))
    out = render(scene, cam, jnp.ones(3), CFG)
    # Pixels whose transmittance lands within fp32 noise of the 1e-4
    # cutoff may include one splat more/less than the oracle (chunked vs
    # sequential product association); each flip moves the pixel by at
    # most alpha*T ~ 1e-4*a/(1-a) <= 5e-3. Bound both the magnitude and
    # how many pixels are affected.
    a = np.asarray(out["render"])
    b = np.asarray(ref["render"])
    np.testing.assert_allclose(a, b, atol=5e-3)
    assert np.mean(np.abs(a - b) > 2e-5) < 0.05
    assert float(jnp.max(out["alpha"])) > 0.999


def test_background_applied_to_color_not_semantics():
    scene = make_random_scene(n=5, seed=9, spread=0.1)
    cam = make_test_camera(width=32, height=32, dist=50.0)  # scene far away
    out = render(scene, cam, jnp.array([0.25, 0.5, 0.75]), CFG)
    # most pixels are pure background
    corner = np.asarray(out["render"][:, 0, 0])
    np.testing.assert_allclose(corner, [0.25, 0.5, 0.75], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["semantics"][:, 0, 0]),
                               0.0, atol=1e-5)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_overlap_cull_is_output_exact(backend):
    """The exact ellipse/tile overlap cull drops only instances the
    blend can never use (alpha < 1/255 over the whole tile,
    ref:cuda_rasterizer/forward.cu:336-344): forward outputs AND
    gradients with cull on/off must be bit-identical, while the cull
    must actually remove instances on an anisotropic scene."""
    import dataclasses as _dc

    from goi_tpu.raster.binning import bin_splats
    from goi_tpu.raster.preprocess import preprocess

    scene = make_random_scene(n=400, seed=7, anisotropic=True)
    cam = make_test_camera(width=96, height=80, angle=0.3)
    bg = jnp.zeros(3)
    # tile_cap must cover the UNCULLED per-tile depth: otherwise the
    # xla backend truncates the cull=False control differently and the
    # comparison tests the truncation, not the cull. reduce='scatter':
    # the chunked default ('chain') is a prefix-DIFFERENCE whose noise
    # scales with the running-prefix magnitude, and cull on/off changes
    # the stream length (hence the prefixes) — the comparison would
    # measure that documented noise, not the cull's exactness.
    cfg = _dc.replace(CFG, backend=backend, tile_cap=2048,
                      reduce="scatter")

    sp = preprocess(scene, cam)
    b_cull = bin_splats(sp, grid_x=6, grid_y=5,
                        max_instances=CFG.max_instances)
    b_raw = bin_splats(sp, grid_x=6, grid_y=5,
                       max_instances=CFG.max_instances, cull=False)
    kept = int(jnp.sum(b_cull.tile_end - b_cull.tile_start))
    raw = int(jnp.sum(b_raw.tile_end - b_raw.tile_start))
    assert kept < raw, "cull removed nothing on an anisotropic scene"

    def run(cull):
        c = _dc.replace(cfg, cull=cull)

        def f(xyz):
            out = render(scene.replace(xyz=xyz), cam, bg, c)
            return (jnp.sum(out["render"]) + jnp.sum(out["alpha"])
                    + jnp.sum(out["semantics"]))

        val, grad = jax.value_and_grad(f)(scene.xyz)
        return render(scene, cam, bg, c), val, grad

    out_c, val_c, grad_c = run(True)
    out_r, val_r, grad_r = run(False)
    # culling shifts chunk boundaries, so per-pixel partial sums
    # re-associate: identical terms, fp32 rounding only (and the
    # documented measure-zero T-cutoff flips, PARITY.md deviation 3)
    for key in ("render", "semantics", "depth", "alpha"):
        np.testing.assert_allclose(
            np.asarray(out_c[key]), np.asarray(out_r[key]),
            rtol=2e-5, atol=2e-5, err_msg=key)
    # the backward's suffix-from-total recompute amplifies the chunk
    # re-association noise; a few elements land near 1e-3 relative
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_r),
                               rtol=3e-3, atol=2e-4)
