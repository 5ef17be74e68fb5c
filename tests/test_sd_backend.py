"""JAX Stable-Diffusion backend: structure, gradients, SDS integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.guidance.sd_jax import (JaxDiffusionBackend, SDConfig,
                                     alphas_cumprod, init_sd_params,
                                     unet_forward, vae_decode,
                                     vae_encode)
from goi_tpu.guidance.sds import InpaintSDS

TINY = SDConfig(
    in_channels=9, out_channels=4, block_out_channels=(32, 64),
    layers_per_block=1, attention_head_dim=2, cross_attention_dim=24,
    norm_groups=8, vae_block_out_channels=(16, 32),
    vae_layers_per_block=1, latent_channels=4, num_train_timesteps=50)


class _Recorder(dict):
    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


def test_unet_vae_shapes_and_full_param_use():
    params = init_sd_params(jax.random.PRNGKey(0), TINY)
    rec = _Recorder(params)
    img = jnp.zeros((2, 3, 64, 64))
    lat = vae_encode(rec, TINY, img)
    assert lat.shape == (2, 4, 32, 32)   # one downsample in (16, 32)
    sample = jnp.concatenate(
        [lat, jnp.zeros((2, 1, 32, 32)), lat], axis=1)
    eps = unet_forward(rec, TINY, sample, jnp.array([3, 40]),
                       jnp.zeros((2, 7, 24)))
    assert eps.shape == (2, 4, 32, 32)
    assert np.isfinite(np.asarray(eps)).all()
    dec = vae_decode(rec, TINY, lat)
    assert dec.shape == (2, 3, 64, 64)   # decoder inverts the stride
    assert np.isfinite(np.asarray(dec)).all()
    unused = set(params) - rec.used
    assert not unused, f"params never read: {sorted(unused)[:8]}"


def test_unet_conditioning_matters():
    params = init_sd_params(jax.random.PRNGKey(1), TINY)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 16, 16))
    t = jnp.array([10])
    c1 = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 24))
    e1 = unet_forward(params, TINY, x, t, c1)
    e2 = unet_forward(params, TINY, x, t, c1 + 1.0)
    e3 = unet_forward(params, TINY, x, jnp.array([40]), c1)
    assert np.abs(np.asarray(e1 - e2)).max() > 1e-6   # text cond used
    assert np.abs(np.asarray(e1 - e3)).max() > 1e-6   # timestep used


def test_alphas_schedule():
    a = np.asarray(alphas_cumprod(SDConfig()))
    assert a.shape == (1000,)
    assert a[0] > 0.999 and a[-1] < 0.01
    assert (np.diff(a) < 0).all()


def test_inpaint_sds_with_jax_backend():
    """EditSession-style loop step: SDS loss through the real (tiny)
    UNet+VAE produces finite nonzero image gradients restricted to the
    mask (ref:guidance/sd_inpainting_utils.py:124-308 semantics)."""
    params = init_sd_params(jax.random.PRNGKey(4), TINY)
    backend = JaxDiffusionBackend(params, TINY)
    pos = jnp.ones((7, 24)) * 0.1
    neg = jnp.zeros((7, 24))
    sds = InpaintSDS(backend, pos, neg, latent_size=16, img_size=32)

    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 32, 32))
    mask = jnp.zeros((1, 1, 32, 32)).at[:, :, 8:24, 8:24].set(1.0)

    def loss_fn(im):
        return sds.train_step(jax.random.PRNGKey(6), im, mask,
                              guidance_scale=4.0)

    val, g = jax.value_and_grad(loss_fn)(img)
    g = np.asarray(g)
    assert np.isfinite(float(val)) and float(val) >= 0
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_backend_npz_roundtrip(tmp_path):
    import os
    params = init_sd_params(jax.random.PRNGKey(7), TINY)
    path = os.path.join(tmp_path, "sd.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    be = JaxDiffusionBackend.from_npz(path, TINY)
    img = jnp.full((1, 3, 32, 32), 0.25)
    l1 = be.encode_images(img)
    l2 = vae_encode(params, TINY, img)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=1e-6)
