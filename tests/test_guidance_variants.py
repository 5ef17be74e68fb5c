"""LODS / Zero123 / DDIM-sampler guidance variants against analytic
backends (same pattern as tests/test_app_edit.py's _ToyBackend):
the eps prediction is exact for a known constant-color x0 target, so
SDS gradients must pull renders toward the target and the DDIM sampler
must reconstruct it."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from goi_tpu.guidance import (LODSInpaintSDS, SDXLInpaint, Zero123SDS,
                              inpaint_sample)
from goi_tpu.guidance.samplers import (add_noise, ddim_step,
                                       ddim_timesteps)


class _ToyInpaintBackend:
    """Identity 'vae' (resize, 4ch latents), eps assuming x0 = target
    color; decode inverts encode."""

    num_train_timesteps = 1000
    scaling_factor = 1.0

    def __init__(self, target=0.8, latent=8):
        t = jnp.linspace(1e-4, 2e-2, 1000)
        self.alphas = jnp.cumprod(1 - t)
        self.target = target
        self.ls = latent

    def encode_images(self, imgs):
        b = imgs.shape[0]
        return jnp.concatenate(
            [jax.image.resize(imgs[:, :3], (b, 3, self.ls, self.ls),
                              "bilinear"),
             jnp.zeros((b, 1, self.ls, self.ls))], axis=1)

    def decode_latents(self, latents):
        b = latents.shape[0]
        img = jax.image.resize(latents[:, :3],
                               (b, 3, 8 * self.ls, 8 * self.ls),
                               "bilinear")
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    def unet_eps(self, latent_in, t, cond):
        noisy = latent_in[:, :4]
        a = self.alphas[t][:, None, None, None]
        tgt = jnp.full_like(noisy, self.target * 2 - 1)
        tgt = tgt.at[:, 3].set(0.0)
        # condition shifts the implied x0 by its mean so CFG matters
        shift = jnp.mean(cond, axis=(1, 2))[:, None, None, None]
        return (noisy - jnp.sqrt(a) * (tgt + 0.0 * shift)) \
            / jnp.sqrt(1 - a) + 0.01 * shift


def test_ddim_step_reconstructs_x0():
    be = _ToyInpaintBackend()
    x0 = jnp.full((1, 4, 8, 8), 0.3)
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = 600
    xt = add_noise(be.alphas, x0, noise, t)
    # exact eps -> one giant DDIM step straight to t_prev=-1 recovers x0
    x_rec = ddim_step(be.alphas, noise, t, -1, xt)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0),
                               atol=1e-5)


def test_ddim_timesteps_leading_spacing():
    ts = ddim_timesteps(1000, 50)
    assert len(ts) == 50 and ts[0] == 981 and ts[-1] == 1
    assert all(np.diff(ts) == -20)


def test_inpaint_sample_reaches_target():
    be = _ToyInpaintBackend(target=0.7)
    img = jnp.full((1, 3, 64, 64), 0.2)
    mask = jnp.ones((1, 1, 64, 64))
    pos = jnp.zeros((4, 16))
    out = inpaint_sample(be, pos, pos, img, mask,
                         key=jax.random.PRNGKey(0), num_steps=25,
                         guidance_scale=1.0, img_size=64)
    assert out.shape == (1, 3, 64, 64)
    # exact-eps denoising must land on the analytic x0 target color
    assert abs(float(out.mean()) - 0.7) < 0.05


def test_sdxl_inpaint_wrapper():
    be = _ToyInpaintBackend(target=0.6, latent=8)
    sdxl = SDXLInpaint(be, jnp.zeros((4, 16)), jnp.zeros((4, 16)),
                       img_size=64)
    out = sdxl.inpaint(jax.random.PRNGKey(1),
                       jnp.full((1, 3, 32, 32), 0.1),
                       jnp.ones((1, 1, 32, 32)),
                       num_inference_steps=20, strength=0.99,
                       guidance_scale=1.0)
    assert out.shape == (1, 3, 64, 64)
    assert abs(float(out.mean()) - 0.6) < 0.08


def test_lods_sds_and_embedding_losses():
    be = _ToyInpaintBackend(target=0.9)
    pos = jnp.zeros((4, 16))
    neg = jnp.full((4, 16), 0.1)
    lods = LODSInpaintSDS(be, pos, neg, latent_size=8, img_size=64)
    unc = lods.init_uncond()
    np.testing.assert_allclose(np.asarray(unc), np.asarray(neg))

    img = jnp.full((2, 3, 32, 32), 0.2)
    mask = jnp.ones((2, 1, 32, 32))

    def sds(im):
        return lods.sds_loss(jax.random.PRNGKey(0), unc, im, mask,
                             step_ratio=0.5, guidance_scale=7.5)

    g = jax.grad(lambda v: sds(jnp.full((2, 3, 32, 32), v)))(0.2)
    assert np.isfinite(g) and g < 0  # pull brightness UP toward 0.9

    # embedding loss is finite and differentiates w.r.t. the embedding
    ge = jax.grad(lambda u: lods.embedding_loss(
        jax.random.PRNGKey(1), u, img, mask))(unc)
    assert np.all(np.isfinite(np.asarray(ge)))
    # one Adam step decreases it (smoke: optimizer wiring works)
    opt = optax.adam(1e-2)
    st = opt.init(unc)
    up, st = opt.update(ge, st)
    unc2 = optax.apply_updates(unc, up)
    assert unc2.shape == unc.shape


class _ToyZero123Backend(_ToyInpaintBackend):
    """8-channel UNet input (latents + image-cond latents); camera
    projection is a fixed linear map; eps as in the parent but the
    implied target darkens with |azimuth| through the cond mean."""

    def image_embed(self, imgs):
        b = imgs.shape[0]
        return jnp.mean(imgs, axis=(2, 3))[:, None, :].repeat(4, 1) \
            .reshape(b, 1, -1)[:, :, :12]

    def cam_project(self, cc):
        return cc[..., :16] if cc.shape[-1] >= 16 else jnp.pad(
            cc, ((0, 0), (0, 0), (0, 16 - cc.shape[-1])))

    def unet_eps(self, latent_in, t, cond):
        noisy = latent_in[:, :4]
        a = self.alphas[t][:, None, None, None]
        tgt = jnp.full_like(noisy, self.target * 2 - 1)
        return (noisy - jnp.sqrt(a) * tgt) / jnp.sqrt(1 - a) \
            + 0.01 * jnp.mean(cond, axis=(1, 2))[:, None, None, None]


def test_zero123_train_step_and_refine():
    be = _ToyZero123Backend(target=0.5)
    z = Zero123SDS(be, latent_size=8, img_size=64)
    ref_img = jnp.full((1, 3, 64, 64), 0.5)
    z.set_image(ref_img)
    assert z.embeddings is not None

    # SDS gradient pulls a dark render toward the 0.5 target
    def loss(v):
        im = jnp.full((1, 3, 64, 64), v)
        return z.train_step(jax.random.PRNGKey(0), im, [10.0], [30.0],
                            [0.0], step_ratio=0.5, guidance_scale=5.0)

    g = jax.grad(loss)(0.1)
    assert np.isfinite(g) and g < 0

    out = z.refine(jax.random.PRNGKey(1), ref_img, [0.0], [45.0],
                   [0.0], steps=10, strength=0.5)
    assert out.shape == (1, 3, 64, 64)
    assert abs(float(out.mean()) - 0.5) < 0.1

    # stable-zero123 camera embedding variant (ref::67-68)
    zs = Zero123SDS(be, latent_size=8, img_size=64, stable=True)
    zs.set_image(ref_img)
    T = zs._cam_T([10.0], [30.0], [0.5], default_elevation=0.0)
    np.testing.assert_allclose(float(T[0, 0, 3]), np.deg2rad(90.0),
                               atol=1e-6)


def test_lods_anneal_schedule():
    """t = sr*(min-max)+max: sr=0 -> max_step, sr=1 -> min_step
    (ref:sd_inpainting_lods_utils.py:211)."""
    be = _ToyInpaintBackend()
    lods = LODSInpaintSDS(be, jnp.zeros((4, 16)), jnp.zeros((4, 16)),
                          latent_size=8, img_size=64)
    s = lods._s
    for sr, expect in [(0.0, s.max_step), (1.0, s.min_step)]:
        t = round(sr * (s.min_step - s.max_step) + s.max_step)
        assert t == expect
