"""DDIM sampling on top of the DiffusionBackend protocol.

The reference runs full denoising loops in three places: the SD-inpaint
`produce_latents` (ref:guidance/sd_inpainting_lods_utils.py:330-403),
the SDXL 1024px inpaint pipeline (ref:guidance/sdxl_utils.py:74-125)
and Zero123 `refine` (ref:guidance/zero123_utils.py:75-118), all via
diffusers' DDIMScheduler with eta=0. This module re-hosts the scheduler
math in JAX: leading-spaced timesteps with the SD steps_offset of 1,
`add_noise`, and the deterministic DDIM update.

The python loop over the (static) step list stays on the host; each
UNet call is one jitted dispatch, which is the right granularity on
TPU — the loop trip count is tiny (20-50) and every body is a large
fused XLA program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def ddim_timesteps(num_train_timesteps: int, num_steps: int,
                   steps_offset: int = 1) -> np.ndarray:
    """Descending timestep list, diffusers 'leading' spacing
    (DDIMScheduler.set_timesteps with steps_offset=1, the SD config)."""
    ratio = num_train_timesteps // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
    return np.clip(ts + steps_offset, 0, num_train_timesteps - 1)


def add_noise(alphas: jax.Array, x0: jax.Array, noise: jax.Array,
              t) -> jax.Array:
    a = alphas[t]
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_step(alphas: jax.Array, eps: jax.Array, t: int, t_prev: int,
              x: jax.Array) -> jax.Array:
    """Deterministic (eta=0) DDIM update x_t -> x_{t_prev}
    (DDIMScheduler.step): reconstruct x0 from the eps prediction and
    re-noise at the previous level."""
    a_t = alphas[t]
    a_prev = alphas[t_prev] if t_prev >= 0 else jnp.asarray(1.0)
    x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


def inpaint_sample(backend, pos: jax.Array, neg: jax.Array,
                   images: jax.Array, masks: jax.Array, *,
                   key: jax.Array, num_steps: int = 50,
                   guidance_scale: float = 7.5,
                   strength: float = 1.0,
                   img_size: int = 512,
                   latents: Optional[jax.Array] = None) -> jax.Array:
    """Full inpainting denoise: the role of `produce_latents` + decode
    (ref:guidance/sd_inpainting_lods_utils.py:330-409) and, at
    img_size=1024, of the SDXL inpaint pipeline call
    (ref:guidance/sdxl_utils.py:94-103).

    images (B,3,H,W) in [0,1]; masks (B,1,H,W), 1 = repaint. strength
    < 1 starts from the noised input image instead of pure noise
    (partial denoise, diffusers img2img convention: the first
    num_steps*(1-strength) steps are skipped). Returns (B,3,s,s) in
    [0,1]."""
    b = images.shape[0]
    r = img_size
    ls = r // 8
    imgs = jax.image.resize(images, (b, 3, r, r), "bilinear")
    m = (jax.image.resize(masks.astype(jnp.float32), (b, 1, r, r),
                          "bilinear") >= 0.5).astype(imgs.dtype)
    # normalize-then-mask (masked pixels 0 in [-1,1] space,
    # ref:guidance/sd_inpainting_utils.py:398-408)
    masked_latents = backend.encode_images((imgs * 2.0 - 1.0) * (1 - m))
    m_lat = jax.image.resize(m, (b, 1, ls, ls), "nearest")

    alphas = backend.alphas
    ts = ddim_timesteps(backend.num_train_timesteps, num_steps)
    key, kn = jax.random.split(key)
    if latents is None:
        if strength >= 1.0:
            latents = jax.random.normal(
                kn, (b, masked_latents.shape[1], ls, ls),
                masked_latents.dtype)
            start = 0
        else:
            init = min(int(num_steps * strength), num_steps)
            start = max(num_steps - init, 0)
            lat0 = backend.encode_images(imgs * 2.0 - 1.0)
            latents = add_noise(
                alphas, lat0,
                jax.random.normal(kn, lat0.shape, lat0.dtype),
                int(ts[start]))
    else:
        start = 0

    pos_b = jnp.broadcast_to(pos[None], (b,) + pos.shape)
    neg_b = jnp.broadcast_to(neg[None], (b,) + neg.shape)
    ratio = backend.num_train_timesteps // num_steps
    for t in ts[start:]:
        t_in = jnp.full((b,), int(t), jnp.int32)
        lat_in = jnp.concatenate([latents, m_lat, masked_latents],
                                 axis=1)
        e_pos = backend.unet_eps(lat_in, t_in, pos_b)
        e_neg = backend.unet_eps(lat_in, t_in, neg_b)
        eps = e_neg + guidance_scale * (e_pos - e_neg)
        latents = ddim_step(alphas, eps, int(t), int(t) - ratio,
                            latents)
    return backend.decode_latents(latents)


class SDXLInpaint:
    """The reference's SDXL inpainting wrapper
    (ref:guidance/sdxl_utils.py:22-125): a whole-image 1024px inpaint
    used to rewrite dataset views during editing. The SDXL-specific
    micro-conditioning (pooled text embeds + time ids) is the
    backend's concern — its `unet_eps` closure carries them — so this
    class is just the 1024/128 sampler with the reference's defaults
    (strength 0.99, 20 steps)."""

    def __init__(self, backend, pos_embedding: jax.Array,
                 neg_embedding: jax.Array, img_size: int = 1024):
        self.backend = backend
        self.pos = pos_embedding
        self.neg = neg_embedding
        self.img_size = img_size

    def inpaint(self, key, images: jax.Array, masks: jax.Array, *,
                num_inference_steps: int = 20, strength: float = 0.99,
                guidance_scale: float = 100.0) -> jax.Array:
        return inpaint_sample(
            self.backend, self.pos, self.neg, images, masks, key=key,
            num_steps=num_inference_steps,
            guidance_scale=guidance_scale, strength=strength,
            img_size=self.img_size)
