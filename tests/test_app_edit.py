"""Headless app session, orbit camera, and SDS edit loop tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.app.orbit import OrbitCamera
from goi_tpu.app.session import QuerySession
from goi_tpu.guidance.sds import InpaintSDS, dilate_mask
from goi_tpu.raster import RasterConfig, render
from goi_tpu.semantic.codebook import SemanticDecoder
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 13, tile_cap=256, chunk=32)


def _make_session(seed=0):
    """Scene whose first half carries semantic code 0, second half code
    1, with a decoder/LUT wired so text ~ lut row 0 selects the first
    half."""
    scene = make_random_scene(n=200, seed=seed)
    sems = np.zeros((scene.capacity, 10), np.float32)
    sems[:100, 0] = 3.0
    sems[100:, 1] = 3.0
    scene = scene.replace(semantics=jnp.asarray(sems))
    key = jax.random.PRNGKey(1)
    # decoder = near-identity: code k from channel k
    dec = SemanticDecoder(
        weights=[jnp.eye(10) * 4.0], biases=[jnp.zeros(10)])
    lut = jax.random.normal(key, (10, 64))
    sess = QuerySession(scene, dec, lut, CFG, sim_thresh=0.86)
    text = lut[0] / jnp.linalg.norm(lut[0])
    sess.set_text(text * 10.0)  # strong positive dot for code 0
    return sess


def test_similarity_selects_target_gaussians():
    sess = _make_session()
    idx = sess.retrieve()
    assert idx[:100].mean() > 0.9
    assert idx[100:200].mean() < 0.1


def test_render_view_with_overlay_and_modes():
    sess = _make_session()
    cam = make_test_camera(width=48, height=32)
    img = sess.render_view(cam, overlay=True)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    d = sess.render_view(cam, mode="depth")
    a = sess.render_view(cam, mode="alpha")
    assert d.shape == a.shape == (32, 48, 3)


def test_segment_delete_move_reset():
    sess = _make_session()
    cam = make_test_camera(width=48, height=32)
    sess.retrieve()
    base = sess.render_view(cam, overlay=False)

    sess.segment()  # only target visible
    seg = sess.render_view(cam, overlay=False)
    sess.delete_view()  # target hidden
    dele = sess.render_view(cam, overlay=False)
    assert not np.allclose(seg, dele)

    sess.gs_index = None
    sess.move([0.5, 0.0, 0.0])
    moved = sess.render_view(cam, overlay=False)
    assert not np.allclose(base, moved)
    sess.reset_motion()
    back = sess.render_view(cam, overlay=False)
    np.testing.assert_allclose(back, base, atol=1e-5)

    n_before = int(sess.scene.num_valid)
    sess.delete_permanently()
    assert int(sess.scene.num_valid) <= n_before - 90


def test_group_points_dbscan():
    sess = _make_session()
    # move the two halves apart so DBSCAN separates them
    xyz = np.asarray(sess.scene.xyz).copy()
    xyz[:50] += np.array([5.0, 0, 0])
    sess.scene = sess.scene.replace(xyz=jnp.asarray(xyz))
    sess.retrieve()
    cam = make_test_camera(width=48, height=32)
    out = render(sess.scene, cam, jnp.ones(3), CFG)
    sim = sess.compute_similarity(
        out["semantics"].reshape(10, -1).T)
    res_mask = np.asarray(sim > 0).reshape(32, 48)
    kept = sess.group_points(cam, res_mask, eps=1.0, min_samples=10)
    # the far-away cluster is off-screen -> filtered out
    assert kept.sum() < sess.rel_gs_index.sum() + 1


def test_orbit_camera():
    orb = OrbitCamera(64, 48, r=3.0, fovy=50)
    c0 = orb.pose.copy()
    orb.orbit(30, 10)
    assert not np.allclose(orb.pose, c0)
    orb.scale(1.0)
    assert orb.radius < 3.0
    orb.pan(10, 5)
    cam = orb.to_camera()
    assert cam.width == 64 and cam.height == 48
    # renderable
    scene = make_random_scene(n=50, seed=2)
    out = render(scene, cam, jnp.zeros(3), CFG)
    assert np.isfinite(np.asarray(out["render"])).all()


def test_dilate_mask():
    m = jnp.zeros((16, 16), bool).at[8, 8].set(True)
    d = dilate_mask(m, kernel=3, iterations=2)
    assert bool(d[8, 8]) and bool(d[6, 8]) and bool(d[8, 10])
    assert not bool(d[5, 8])
    assert int(d.sum()) == 25  # 5x5 square


class _ToyBackend:
    """Analytic diffusion backend: identity 'vae' (avg-pool to 64x64,
    4ch), eps prediction pulls latents toward a constant target color."""

    num_train_timesteps = 1000

    def __init__(self, target=0.8):
        t = jnp.linspace(1e-4, 2e-2, 1000)
        self.alphas = jnp.cumprod(1 - t)
        self.target = target

    def encode_images(self, imgs):
        b = imgs.shape[0]
        lat = jax.image.resize(imgs[:, :3], (b, 3, 64, 64), "bilinear")
        return jnp.concatenate(
            [lat, jnp.zeros((b, 1, 64, 64))], axis=1)

    def unet_eps(self, latent_in, t, cond):
        # latent_in: (B, 4+1+4, 64, 64); noisy latents are ch 0..3
        noisy = latent_in[:, :4]
        a = self.alphas[t][:, None, None, None]
        # eps estimate assuming x0 = target
        tgt = jnp.full_like(noisy, self.target * 2 - 1)
        tgt = tgt.at[:, 3].set(0.0)
        return (noisy - jnp.sqrt(a) * tgt) / jnp.sqrt(1 - a)


def test_sds_pulls_image_toward_target():
    """SDS gradient with the analytic backend must push image pixels
    toward the backend's target color inside the mask only."""
    backend = _ToyBackend(target=0.9)
    sds = InpaintSDS(backend, pos_embedding=jnp.zeros((1, 8)),
                     neg_embedding=jnp.zeros((1, 8)))
    key = jax.random.PRNGKey(0)
    img = jnp.full((1, 3, 64, 64), 0.2)
    mask = jnp.zeros((1, 1, 64, 64)).at[:, :, :, :32].set(1.0)

    def loss_fn(im):
        return sds.train_step(key, im, mask, step_ratio=0.5,
                              guidance_scale=1.0)

    g = jax.grad(loss_fn)(img)
    g = np.asarray(g)
    # gradient descent direction = -g: should increase masked pixels
    assert g[0, :, :, :32].mean() < -1e-6
    # outside the mask: no gradient
    assert abs(g[0, :, :, 40:]).max() < 1e-6


def test_edit_session_end_to_end():
    from goi_tpu.app.edit import EditSession

    sess = _make_session()
    backend = _ToyBackend(target=0.9)
    sds = InpaintSDS(backend, pos_embedding=jnp.zeros((1, 8)),
                     neg_embedding=jnp.zeros((1, 8)))
    edit = EditSession(sess.scene, sds, CFG, batch_size=1,
                       guidance_scale=1.0, lambda_sd=1.0)
    cams = [make_test_camera(width=32, height=32, angle=a)
            for a in (0.0, 0.4)]
    n = edit.precompute(cams, sess.compute_similarity)
    assert n >= 1
    before = np.asarray(edit.scene.features_dc).copy()
    edit.train(epochs=2, log_every=100)
    after = np.asarray(edit.scene.features_dc)
    # only target gaussians changed
    changed = np.abs(after - before).sum(axis=(1, 2)) > 1e-7
    gm = np.asarray(edit.grad_mask) > 0
    assert changed[gm].any()
    assert not changed[~gm].any()
