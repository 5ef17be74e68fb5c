"""Exports, profiling utils, text/RES providers, plain SDS."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import make_random_scene


def test_density_grid_peaks_at_gaussians():
    from goi_tpu.export.mesh import density_grid

    scene = make_random_scene(n=20, seed=0, spread=0.5)
    scene = scene.replace(opacity=jnp.full_like(scene.opacity, 4.0))
    grid, origin, voxel = density_grid(scene, resolution=32, chunk=16,
                                       bounds=(-1.5, 1.5))
    assert grid.shape == (32, 32, 32)
    assert grid.max() > 0.5
    # density near a gaussian center exceeds the corner density
    mu = np.asarray(scene.xyz)[0]
    ijk = np.clip(((mu - origin) / voxel).astype(int), 0, 31)
    assert grid[tuple(ijk)] > grid[0, 0, 0]


def test_point_cloud_and_obj_export(tmp_path):
    from goi_tpu.core.ply import read_ply
    from goi_tpu.export.mesh import (export_colored_point_cloud,
                                     export_ellipsoids_obj)

    scene = make_random_scene(n=50, seed=1)
    scene = scene.replace(opacity=jnp.full_like(scene.opacity, 2.0))
    p = str(tmp_path / "pc.ply")
    n = export_colored_point_cloud(p, scene, min_opacity=0.5)
    assert n == 50
    back = read_ply(p)
    assert len(back["x"]) == 50 and "red" in back

    o = str(tmp_path / "ell.obj")
    m = export_ellipsoids_obj(o, scene, min_opacity=0.5)
    assert m == 50
    text = open(o).read()
    assert text.count("\nv ") + text.startswith("v ") == 50 * 6
    assert text.count("\nf ") == 50 * 8


def test_step_timer():
    import time

    from goi_tpu.utils.profiling import StepTimer

    t = StepTimer(ema=0.5)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert 5 < t.ms < 100
    assert t.fps > 0
    assert "ms" in str(t)


def test_text_and_res_providers(tmp_path):
    from goi_tpu.query.align import VisionLanguageAlign
    from goi_tpu.query.res import FileRESProvider
    from goi_tpu.query.text_encoder import (PrecomputedTextEncoder,
                                            encode_and_align)

    store = str(tmp_path / "prompts.npz")
    np.savez(store, sofa=np.random.default_rng(0).normal(
        size=1024).astype(np.float32))
    enc = PrecomputedTextEncoder(store)
    assert enc.available() == ["sofa"]
    align = VisionLanguageAlign.create()
    tokens, bias = encode_and_align(enc, align, "sofa")
    assert tokens.shape == (256,)

    # file RES provider
    from PIL import Image
    os.makedirs(str(tmp_path / "res" / "sofa"))
    Image.fromarray((np.eye(16) * 255).astype(np.uint8)).save(
        str(tmp_path / "res" / "sofa" / "view0.png"))
    prov = FileRESProvider(str(tmp_path / "res"))
    img = np.zeros((32, 32, 3), np.float32)
    m = prov.predict_mask(img, "sofa", "view0")
    assert m is not None and m.shape == (32, 32)
    assert prov.predict_mask(img, "chair", "view0") is None


def test_plain_sds():
    from goi_tpu.guidance.sds import PlainSDS
    from tests.test_app_edit import _ToyBackend

    backend = _ToyBackend(target=0.9)
    sds = PlainSDS(backend, jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    img = jnp.full((1, 3, 64, 64), 0.2)
    g = jax.grad(lambda im: sds.train_step(
        jax.random.PRNGKey(0), im, step_ratio=0.5,
        guidance_scale=1.0))(img)
    assert float(np.asarray(g).mean()) < 0  # descend -> brighten


def test_nyu40_colorize():
    from goi_tpu.utils.image import nyu40_colorize

    lab = np.array([[0, 1], [40, 99]])
    c = nyu40_colorize(lab)
    assert c.shape == (2, 2, 3) and c.dtype == np.uint8
    assert (c[0, 0] == 0).all()
    assert (c[1, 0] == c[1, 1]).all()  # clipped


def test_render_batch_matches_loop():
    import jax

    from goi_tpu.dist.shard import stack_cameras
    from goi_tpu.raster import RasterConfig, render
    from goi_tpu.raster.render import render_batch
    from tests.conftest import make_random_scene, make_test_camera

    cfg = RasterConfig(max_instances=1 << 12, tile_cap=256, chunk=32)
    scene = make_random_scene(n=60, seed=3)
    cams = [make_test_camera(width=32, height=32, angle=a)
            for a in (0.0, 0.3)]
    batched = stack_cameras(cams)
    out = render_batch(scene, batched, jnp.zeros(3), cfg)
    for i, c in enumerate(cams):
        single = render(scene, c, jnp.zeros(3), cfg)
        np.testing.assert_allclose(np.asarray(out["render"][i]),
                                   np.asarray(single["render"]),
                                   atol=1e-6)


def test_vsd_and_cds():
    from goi_tpu.guidance.sds import CDS, VSD
    from tests.test_app_edit import _ToyBackend

    backend = _ToyBackend(target=0.9)

    # lora eps: simple parametrized predictor (params = bias toward a
    # learnable x0)
    def lora_eps(params, noisy, t, cond):
        a = backend.alphas[t][:, None, None, None]
        tgt = jnp.full_like(noisy, params["x0"])
        return (noisy - jnp.sqrt(a) * tgt) / jnp.sqrt(1 - a)

    vsd = VSD(backend, lora_eps, jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    img = jnp.full((1, 3, 64, 64), 0.2)
    params = {"x0": jnp.asarray(0.2 * 2 - 1)}  # particle score at render
    key = jax.random.PRNGKey(0)
    g = jax.grad(lambda im: vsd.train_step(
        key, params, im, step_ratio=0.5, guidance_scale=1.0))(img)
    # pretrained pulls to 0.9, particle sits at the render -> ascend
    assert float(np.asarray(g).mean()) < 0

    # lora training reduces its own diffusion loss w.r.t. params
    gl = jax.grad(lambda p: vsd.lora_loss(key, p, img))(params)
    assert np.isfinite(float(gl["x0"]))

    cds = CDS(backend, jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    loss = cds.train_step(key, img, step_ratio=0.5, guidance_scale=1.0)
    assert np.isfinite(float(loss))
    gc = jax.grad(lambda im: cds.train_step(
        key, im, step_ratio=0.5, guidance_scale=1.0))(img)
    assert np.isfinite(np.asarray(gc)).all()
