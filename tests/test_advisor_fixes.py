"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test targets one fixed defect and is constructed to fail against
the pre-fix behavior:
  1. early termination must be STICKY across scan/DMA chunk boundaries
     (ref:cuda_rasterizer/forward.cu:349-357 done flag),
  2. K-aligned binning overflow must be detectable via num_slots,
  3. densify must not prune split parents whose children were dropped
     by capacity overflow,
  4. grow_capacity must extend scene/optimizer/stats consistently,
  5. COLMAP images.txt with empty points2D lines must parse.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goi_tpu.core.scene import GaussianScene
from goi_tpu.raster import RasterConfig, render
from goi_tpu.raster.reference import render_reference
from tests.conftest import make_test_camera


def _wall_scene():
    """A front 'wall' of medium-opacity Gaussians that drives T below
    1e-4 inside the first chunk, followed by hundreds of low-alpha
    Gaussians behind it spanning several chunk boundaries. A non-sticky
    termination resumes blending the back splats whenever the
    blended-only T is still >= 1e-4 at a chunk boundary."""
    rng = np.random.default_rng(11)
    n_wall, n_back = 60, 520
    n = n_wall + n_back
    xy = rng.uniform(-0.45, 0.45, (n, 2))
    z = np.concatenate([np.full(n_wall, -0.5), np.full(n_back, 0.5)])
    # small per-splat jitter keeps the depth sort unambiguous
    z += rng.uniform(0, 1e-3, n)
    xyz = np.concatenate([xy, z[:, None]], axis=1).astype(np.float32)
    colors = np.concatenate([
        np.zeros((n_wall, 3)), np.ones((n_back, 3))]).astype(np.float32)
    scene = GaussianScene.create(
        xyz, colors, sh_degree=0, sem_dim=10,
        scales=np.full(n, 0.3, np.float32))
    opa = np.concatenate([
        np.full(n_wall, 0.7), np.full(n_back, -3.18)]).astype(np.float32)
    sems = rng.normal(0, 1, (n, 10)).astype(np.float32)
    return scene.replace(opacity=jnp.asarray(opa[:, None]),
                         semantics=jnp.asarray(sems))


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sticky_early_termination_across_chunks(backend):
    scene = _wall_scene()
    cam = make_test_camera(width=96, height=96, dist=4.0, angle=0.0)
    bg = jnp.array([0.3, 0.6, 0.9])
    cfg = RasterConfig(max_instances=1 << 16, tile_cap=1024, chunk=64,
                       backend=backend)
    ref = render_reference(scene, cam, bg)
    out = render(scene, cam, bg, cfg)
    for key in ("render", "alpha", "semantics"):
        d = np.abs(np.asarray(out[key]) - np.asarray(ref[key]))
        # a resumed pixel deviates by ~1e-4 across most of the wall;
        # association noise is ~1e-7, isolated cutoff flips are rare
        assert d.mean() < 1e-6, (key, d.mean())
        assert d.max() < 5e-3, (key, d.max())


def test_binning_aligned_overflow_detectable():
    """Sparse scene, many tiles x few instances: alignment padding
    overflows a budget the raw count fits into — num_slots must report
    the aligned demand (ADVICE #3)."""
    from goi_tpu.raster.binning import bin_splats, exact_tile_counts
    from goi_tpu.raster.pallas_blend import K
    from goi_tpu.raster.preprocess import preprocess
    from goi_tpu.raster.render import suggest_instance_budget

    rng = np.random.default_rng(3)
    n = 256
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    scene = GaussianScene.create(
        xyz, None, sh_degree=0, sem_dim=10,
        scales=np.full(n, 0.01, np.float32))  # tiny: ~1 tile each
    cam = make_test_camera(width=256, height=256)
    sp = preprocess(scene, cam)
    grid_x, grid_y = 16, 16
    raw = int(jnp.sum(sp.tiles_touched))
    budget = 1 << max(raw - 1, 1).bit_length()

    b = bin_splats(sp, grid_x=grid_x, grid_y=grid_y,
                   max_instances=budget, align=K)
    n_slots = int(b.num_slots)
    counts = np.asarray(exact_tile_counts(
        sp, grid_x=grid_x, grid_y=grid_y, max_instances=budget))
    binned = int(counts.sum())
    want = max(int((np.ceil(counts / K) * K).sum()), raw)
    assert n_slots == want
    assert n_slots > budget  # alignment padding overflows the raw budget
    assert int(b.num_instances) == raw

    # suggest_instance_budget(align=K, layout='aligned') must cover the
    # aligned demand (the default layout is 'chunked', which has no
    # alignment padding to size)
    good = suggest_instance_budget(scene, cam, align=K, margin=1.0,
                                   layout="aligned")
    assert good >= n_slots
    b2 = bin_splats(sp, grid_x=grid_x, grid_y=grid_y,
                    max_instances=good, align=K)
    # with a sufficient budget no tile range is clamped; the binned
    # total is the post-cull count (<= raw rect expansion)
    assert int(jnp.sum(b2.tile_end - b2.tile_start)) == binned
    assert binned <= raw


def test_densify_overflow_keeps_split_parents():
    """At zero free capacity a split's children are dropped; the parent
    must survive the prune (ADVICE #4)."""
    from goi_tpu.train.densify import DensifyStats, densify_and_prune

    rng = np.random.default_rng(5)
    n = 64
    xyz = rng.normal(0, 1, (n, 3)).astype(np.float32)
    scene = GaussianScene.create(
        xyz, None, sh_degree=0, sem_dim=4,
        scales=np.full(n, 0.5, np.float32))  # large -> all split
    stats = DensifyStats(
        xyz_grad_accum=jnp.full((n,), 10.0),
        denom=jnp.ones((n,)),
        max_radii=jnp.zeros((n,), jnp.int32))
    opt_state = {"mu": jnp.ones((n, 3))}
    new_scene, _, _, info = densify_and_prune(
        scene, opt_state, stats, jax.random.PRNGKey(0),
        grad_threshold=1e-4, min_opacity=0.005, extent=1.0,
        percent_dense=0.01)
    assert int(info["overflow"]) > 0
    assert int(info["n_split"]) == n
    # every parent survives: nothing was written, nothing pruned
    assert int(new_scene.num_valid) == n


def test_grow_capacity_then_densify():
    from goi_tpu.train.densify import (DensifyStats, densify_and_prune,
                                       grow_capacity)

    rng = np.random.default_rng(6)
    n = 32
    xyz = rng.normal(0, 1, (n, 3)).astype(np.float32)
    scene = GaussianScene.create(
        xyz, None, sh_degree=0, sem_dim=4,
        scales=np.full(n, 0.5, np.float32))
    stats = DensifyStats(
        xyz_grad_accum=jnp.full((n,), 10.0), denom=jnp.ones((n,)),
        max_radii=jnp.zeros((n,), jnp.int32))
    opt_state = {"mu": jnp.ones((n, 3)), "scalar": jnp.float32(1.0)}

    scene2, opt2, stats2 = grow_capacity(scene, opt_state, stats, 128)
    assert scene2.capacity == 128
    assert int(scene2.num_valid) == n
    assert opt2["mu"].shape == (128, 3)
    assert float(opt2["scalar"]) == 1.0
    np.testing.assert_array_equal(np.asarray(opt2["mu"][n:]), 0.0)

    new_scene, _, _, info = densify_and_prune(
        scene2, opt2, stats2, jax.random.PRNGKey(0),
        grad_threshold=1e-4, min_opacity=0.005, extent=1.0,
        percent_dense=0.01)
    assert int(info["overflow"]) == 0
    # all 32 split into 64 children, parents pruned
    assert int(new_scene.num_valid) == 2 * n


def test_colmap_images_text_empty_points2d(tmp_path):
    """COLMAP writes an EMPTY points2D line for images with no 2D
    points; the pairing must not desynchronize (ADVICE #5)."""
    from goi_tpu.data.colmap import read_images_text

    txt = (
        "# images.txt\n"
        "# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n"
        "1 1 0 0 0 0.5 0.1 2.0 1 a.png\n"
        "\n"  # zero 2D points
        "2 0.9 0.1 0 0 1.0 0.0 3.0 1 b.png\n"
        "10.5 20.5 7 30.0 40.0 -1\n"
        "3 1 0 0 0 0 0 1 1 c.png\n"
        "\n"
    )
    p = os.path.join(tmp_path, "images.txt")
    with open(p, "w") as f:
        f.write(txt)
    imgs = read_images_text(p)
    assert sorted(imgs) == [1, 2, 3]
    assert imgs[1].xys.shape == (0, 2)
    assert imgs[2].name == "b.png"
    assert imgs[2].xys.shape == (2, 2)
    np.testing.assert_allclose(imgs[2].xys[0], [10.5, 20.5])
    np.testing.assert_array_equal(imgs[2].point3D_ids, [7, -1])
    assert imgs[3].xys.shape == (0, 2)


def test_inpaint_sds_masked_latents_normalize_first():
    """Masked-image latents must be encode((2*img-1)*(1-mask)): masked
    pixels are 0 in normalized space, not -1 (ADVICE #1,
    ref:guidance/sd_inpainting_utils.py:398-408)."""
    from goi_tpu.guidance.sds import InpaintSDS

    captured = []

    class SpyBackend:
        num_train_timesteps = 10
        alphas = jnp.linspace(0.99, 0.1, 10)

        def encode_images(self, imgs):
            captured.append(imgs)
            d = imgs[:, :, ::8, ::8]
            return jnp.concatenate([d, d[:, :1]], axis=1)  # 4 "latent" ch

        def unet_eps(self, latent_in, t, cond):
            return jnp.zeros_like(latent_in[:, :4])

    sds = InpaintSDS(SpyBackend(), jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    img = jnp.full((1, 3, 512, 512), 0.25)  # normalized value -0.5
    mask = jnp.ones((1, 1, 512, 512))       # fully editable
    sds.train_step(jax.random.PRNGKey(0), img, mask)
    assert len(captured) == 2
    # second encode call is the masked image: all-zero, NOT all -0.5
    np.testing.assert_allclose(np.asarray(captured[1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(captured[0]), -0.5, atol=1e-6)


def test_tile_depth_overflow_detectable():
    """A tile deeper than tile_cap must be detectable via
    max_tile_depth in both render() and trace() outputs (the XLA blend
    and the trace walk truncate past the cap — VERDICT weak #4)."""
    import jax.numpy as jnp

    from goi_tpu.raster import RasterConfig, render, trace
    from tests.conftest import make_random_scene, make_test_camera

    # pile many Gaussians onto the same spot -> one very deep tile
    scene = make_random_scene(n=300, seed=5, spread=0.01)
    cam = make_test_camera(width=32, height=32)
    cfg = RasterConfig(max_instances=1 << 13, tile_cap=16, chunk=8,
                       backend="xla")
    out = render(scene, cam, jnp.zeros(3), cfg)
    depth = int(out["max_tile_depth"])
    assert depth > cfg.tile_cap  # the scene overflows...

    tr = trace(scene, cam, jnp.zeros((10, 32, 32)), jnp.zeros(3), cfg)
    assert int(tr["max_tile_depth"]) == depth  # ...and trace agrees

    # a roomy cap reports the same depth but no longer overflows
    cfg_ok = RasterConfig(max_instances=1 << 13, tile_cap=512, chunk=8,
                          backend="xla")
    out_ok = render(scene, cam, jnp.zeros(3), cfg_ok)
    assert int(out_ok["max_tile_depth"]) == depth <= 512


def test_tile_cap_not_chunk_multiple():
    """tile_cap that is not a chunk multiple must pad, not crash, and
    match the rounded-up configuration exactly."""
    import jax.numpy as jnp
    import numpy as np

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=150, seed=9)
    cam = make_test_camera(width=32, height=32)
    a = render(scene, cam, jnp.zeros(3),
               RasterConfig(max_instances=1 << 13, tile_cap=100,
                            chunk=32, backend="xla"))
    b = render(scene, cam, jnp.zeros(3),
               RasterConfig(max_instances=1 << 13, tile_cap=128,
                            chunk=32, backend="xla"))
    assert int(a["max_tile_depth"]) <= 100  # same effective coverage
    np.testing.assert_allclose(np.asarray(a["render"]),
                               np.asarray(b["render"]), atol=1e-6)


def test_reference_backend_honors_masks_and_offset():
    """backend='reference' must apply semantic_masks and mean2d_offset
    like the other backends (it used to silently drop both)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=80, seed=10)
    cam = make_test_camera(width=32, height=32)
    cfg = RasterConfig(backend="reference")

    masks = jnp.zeros(scene.capacity)
    out = render(scene, cam, jnp.zeros(3), cfg, semantic_masks=masks)
    assert float(jnp.abs(out["semantics"]).max()) == 0.0

    def loss(off):
        o = render(scene, cam, jnp.zeros(3), cfg, mean2d_offset=off)
        return jnp.sum(o["render"] ** 2)

    g = jax.grad(loss)(jnp.zeros((scene.capacity, 2)))
    assert float(jnp.abs(g).max()) > 0.0


def test_bad_backend_or_reduce_raises():
    import jax.numpy as jnp
    import pytest

    from goi_tpu.raster import RasterConfig, render
    from tests.conftest import make_random_scene, make_test_camera

    scene = make_random_scene(n=20, seed=1)
    cam = make_test_camera(width=16, height=16)
    with pytest.raises(ValueError, match="backend"):
        render(scene, cam, jnp.zeros(3), RasterConfig(backend="cuda"))
    with pytest.raises(ValueError, match="reduce"):
        render(scene, cam, jnp.zeros(3),
               RasterConfig(backend="pallas", reduce="Sorted"))
