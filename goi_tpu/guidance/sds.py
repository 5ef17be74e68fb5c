"""Score-distillation guidance (SDS) for scene editing.

JAX re-design of the reference's guidance family (ref:guidance/
sd_inpainting_utils.py:124-308 plus the sd/sdxl/vsd/cds variants). The
score network itself is a large frozen diffusion model whose weights are
external artifacts (the reference downloads them from HF; this
environment has no egress), so the SDS machinery is factored against a
`DiffusionBackend` protocol:

  encode_images(imgs)    (B,3,img,img) -> latents (B,4,img/8,img/8)
  unet_eps(latent_in, t, cond)  noise prediction
  alphas                 cumulative alpha schedule (T,)

Any backend works: a JAX port of SD-inpaint weights, a torch-CPU
wrapper, or the analytic test backend in tests. The SDS math here is
exact to the reference: masked-image latents for the inpaint UNet's
9-channel input, dreamtime-style timestep annealing, classifier-free
guidance, loss = 0.5*MSE(latents, stopgrad(latents - w(t)(eps_hat-eps)))
restricted to the edit mask (ref:sd_inpainting_utils.py:165-308).
"""

from __future__ import annotations

from typing import Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionBackend(Protocol):
    alphas: jax.Array            # (num_train_timesteps,) cumprod alphas
    num_train_timesteps: int

    def encode_images(self, imgs: jax.Array) -> jax.Array: ...

    def unet_eps(self, latent_in: jax.Array, t: jax.Array,
                 cond: jax.Array) -> jax.Array: ...


class InpaintSDS:
    """SDS guidance against an inpainting diffusion backend."""

    def __init__(self, backend: DiffusionBackend,
                 pos_embedding: jax.Array, neg_embedding: jax.Array,
                 t_range=(0.02, 0.98), latent_size: int = 64,
                 img_size: int = 512):
        self.backend = backend
        self.img_size = img_size
        self.pos = pos_embedding
        self.neg = neg_embedding
        T = backend.num_train_timesteps
        self.min_step = int(T * t_range[0])
        self.max_step = int(T * t_range[1])
        self.latent_size = latent_size

    def _pick_t(self, key, batch, step_ratio):
        T = self.backend.num_train_timesteps
        if step_ratio is not None:
            # dreamtime-like annealing (ref:sd_inpainting_utils.py:164-167);
            # step_ratio may be a traced value
            t = jnp.clip(jnp.round((1.0 - step_ratio) * T),
                         self.min_step, self.max_step).astype(jnp.int32)
            return jnp.full((batch,), t)
        return jax.random.randint(key, (batch,), self.min_step,
                                  self.max_step + 1)

    def train_step(self, key, images: jax.Array, masks: jax.Array,
                   *, step_ratio: Optional[float] = None,
                   guidance_scale: float = 7.5) -> jax.Array:
        """images (B,3,H,W) in [0,1] WITH gradient flow; masks (B,1,H,W)
        binary (1 = editable). Returns the scalar SDS loss
        (ref:sd_inpainting_utils.py:124-308)."""
        b = images.shape[0]
        r = self.img_size
        imgs512 = jax.image.resize(images, (b, 3, r, r), "bilinear")
        m512 = (jax.image.resize(masks, (b, 1, r, r), "bilinear")
                >= 0.5).astype(images.dtype)

        latents = self.backend.encode_images(imgs512 * 2.0 - 1.0)
        # normalize FIRST, then mask, so masked pixels are 0 in the
        # normalized space (ref:guidance/sd_inpainting_utils.py:398-408;
        # the reference comment warns against mask-then-normalize, which
        # would feed -1 "black" into the 9-channel inpaint UNet)
        masked_latents = jax.lax.stop_gradient(
            self.backend.encode_images((imgs512 * 2.0 - 1.0) * (1 - m512)))
        ls = self.latent_size
        m_lat = (jax.image.resize(m512, (b, 1, ls, ls), "nearest"))

        key, kt, kn = jax.random.split(key, 3)
        t = self._pick_t(kt, b, step_ratio)
        alphas = self.backend.alphas
        a_t = alphas[t][:, None, None, None]
        w = (1.0 - a_t)

        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        lat0 = jax.lax.stop_gradient(latents)
        noisy = jnp.sqrt(a_t) * lat0 + jnp.sqrt(1 - a_t) * noise

        def eps(cond):
            latent_in = jnp.concatenate(
                [noisy, m_lat, masked_latents], axis=1)
            return self.backend.unet_eps(latent_in, t, cond)

        eps_pos = eps(jnp.broadcast_to(self.pos[None],
                                       (b,) + self.pos.shape))
        eps_neg = eps(jnp.broadcast_to(self.neg[None],
                                       (b,) + self.neg.shape))
        eps_hat = eps_neg + guidance_scale * (eps_pos - eps_neg)

        grad = w * (eps_hat - noise)
        grad = jnp.nan_to_num(grad)
        target = jax.lax.stop_gradient(latents - grad)
        mse = 0.5 * (latents - target) ** 2 / b
        mask_lat = jnp.broadcast_to(m_lat, mse.shape)
        return jnp.sum(mse * mask_lat)


class PlainSDS:
    """Non-inpainting SDS against a 4-channel UNet (the role of
    ref:guidance/sd_utils.py train_step): same annealing/CFG/weighting,
    latent input is just the noisy latents."""

    def __init__(self, backend: DiffusionBackend,
                 pos_embedding: jax.Array, neg_embedding: jax.Array,
                 t_range=(0.02, 0.98), latent_size: int = 64,
                 img_size: int = 512):
        self._inner = InpaintSDS(backend, pos_embedding, neg_embedding,
                                 t_range, latent_size, img_size)

    def train_step(self, key, images: jax.Array, *,
                   step_ratio: Optional[float] = None,
                   guidance_scale: float = 7.5) -> jax.Array:
        b = images.shape[0]
        s = self._inner
        r = s.img_size
        imgs512 = jax.image.resize(images, (b, 3, r, r), "bilinear")
        latents = s.backend.encode_images(imgs512 * 2.0 - 1.0)
        key, kt, kn = jax.random.split(key, 3)
        t = s._pick_t(kt, b, step_ratio)
        a_t = s.backend.alphas[t][:, None, None, None]
        w = 1.0 - a_t
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        lat0 = jax.lax.stop_gradient(latents)
        noisy = jnp.sqrt(a_t) * lat0 + jnp.sqrt(1 - a_t) * noise

        def eps(cond):
            return s.backend.unet_eps(noisy, t, cond)

        e_pos = eps(jnp.broadcast_to(s.pos[None], (b,) + s.pos.shape))
        e_neg = eps(jnp.broadcast_to(s.neg[None], (b,) + s.neg.shape))
        eps_hat = e_neg + guidance_scale * (e_pos - e_neg)
        grad = jnp.nan_to_num(w * (eps_hat - noise))
        target = jax.lax.stop_gradient(latents - grad)
        return jnp.sum(0.5 * (latents - target) ** 2 / b)


class VSD:
    """Variational score distillation (ProlificDreamer; the role of
    ref:guidance/vsd_utils.py). The pretrained score comes from the
    backend; the particle score is any trainable eps-net
    `lora_eps(params, noisy, t, cond)` (the reference uses a LoRA'd UNet
    copy, ref:vsd_utils.py:109-162). Alternate:
      train_step      -> loss for the renderer parameters,
      lora_loss       -> diffusion loss training the particle score."""

    def __init__(self, backend: DiffusionBackend, lora_eps,
                 pos_embedding: jax.Array, neg_embedding: jax.Array,
                 t_range=(0.02, 0.98)):
        self._s = InpaintSDS(backend, pos_embedding, neg_embedding,
                             t_range)
        self.backend = backend
        self.lora_eps = lora_eps

    def _latents(self, images):
        b = images.shape[0]
        r = self._s.img_size
        imgs512 = jax.image.resize(images, (b, 3, r, r), "bilinear")
        return self.backend.encode_images(imgs512 * 2.0 - 1.0)

    def train_step(self, key, lora_params, images, *,
                   step_ratio=None, guidance_scale: float = 7.5):
        s = self._s
        latents = self._latents(images)
        b = latents.shape[0]
        key, kt, kn = jax.random.split(key, 3)
        t = s._pick_t(kt, b, step_ratio)
        a_t = self.backend.alphas[t][:, None, None, None]
        w = 1.0 - a_t
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        lat0 = jax.lax.stop_gradient(latents)
        noisy = jnp.sqrt(a_t) * lat0 + jnp.sqrt(1 - a_t) * noise

        def pre_eps(cond):
            return self.backend.unet_eps(noisy, t, cond)

        e_pos = pre_eps(jnp.broadcast_to(s.pos[None],
                                         (b,) + s.pos.shape))
        e_neg = pre_eps(jnp.broadcast_to(s.neg[None],
                                         (b,) + s.neg.shape))
        eps_pre = e_neg + guidance_scale * (e_pos - e_neg)
        eps_particle = self.lora_eps(
            jax.lax.stop_gradient(lora_params), noisy, t,
            jnp.broadcast_to(s.pos[None], (b,) + s.pos.shape))
        grad = jnp.nan_to_num(w * (eps_pre - eps_particle))
        target = jax.lax.stop_gradient(latents - grad)
        return jnp.sum(0.5 * (latents - target) ** 2 / b)

    def lora_loss(self, key, lora_params, images):
        """Standard diffusion loss fitting the particle score to the
        current render distribution (ref:vsd_utils.py train_lora)."""
        latents = jax.lax.stop_gradient(self._latents(images))
        b = latents.shape[0]
        key, kt, kn = jax.random.split(key, 3)
        t = self._s._pick_t(kt, b, None)
        a_t = self.backend.alphas[t][:, None, None, None]
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        noisy = jnp.sqrt(a_t) * latents + jnp.sqrt(1 - a_t) * noise
        pred = self.lora_eps(
            lora_params, noisy, t,
            jnp.broadcast_to(self._s.pos[None],
                             (b,) + self._s.pos.shape))
        return jnp.mean((pred - noise) ** 2)


class CDS:
    """The reference's two-timestep contrastive/SDI scheme
    (ref:guidance/sd_cds_utils.py:178-318): VE noise sigma=sqrt(2t),
    annealed t2 with t1 ~ U(t2+0.1, t2+0.2), an ODE step from t1 to t2,
    and loss = w(t2) * MSE(x0_pred re-noised at t1, sg(eps_hat_t2))."""

    def __init__(self, backend: DiffusionBackend,
                 pos_embedding: jax.Array, neg_embedding: jax.Array,
                 t_range=(0.02, 0.98)):
        self._s = InpaintSDS(backend, pos_embedding, neg_embedding,
                             t_range)
        self.backend = backend
        self.min_t, self.max_t = t_range

    def train_step(self, key, images, *, step_ratio: float,
                   guidance_scale: float = 100.0):
        s = self._s
        b = images.shape[0]
        r = s.img_size
        imgs512 = jax.image.resize(images, (b, 3, r, r), "bilinear")
        latents = self.backend.encode_images(imgs512 * 2.0 - 1.0)
        T = self.backend.num_train_timesteps

        key, ku, kn = jax.random.split(key, 3)
        t2 = self.max_t - (self.max_t - self.min_t) * jnp.sqrt(
            jnp.asarray(step_ratio))
        t1 = t2 + jax.random.uniform(ku, (), minval=0.1, maxval=0.2)
        t1s = jnp.full((b,), (t1 * T).astype(jnp.int32))
        t2s = jnp.full((b,), (t2 * T).astype(jnp.int32))
        sig1 = jnp.sqrt(2.0 * t1)
        sig2 = jnp.sqrt(2.0 * t2)

        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        lat0 = jax.lax.stop_gradient(latents)
        noisy1 = lat0 + sig1 * noise

        def cfg_eps(noisy, t):
            e_pos = self.backend.unet_eps(
                noisy, t, jnp.broadcast_to(s.pos[None],
                                           (b,) + s.pos.shape))
            e_neg = self.backend.unet_eps(
                noisy, t, jnp.broadcast_to(s.neg[None],
                                           (b,) + s.neg.shape))
            return e_neg + guidance_scale * (e_pos - e_neg)

        eps1 = cfg_eps(noisy1, t1s)
        di = (noisy1 - eps1) / sig1
        noisy2 = noisy1 + (sig2 - sig1) * di
        x0_sub = jax.lax.stop_gradient(noise - di)
        eps2 = jax.lax.stop_gradient(cfg_eps(noisy2, t1s))
        w2 = (1.0 - self.backend.alphas[t2s])[:, None, None, None]

        x0_pred = latents + sig1 * x0_sub
        return jnp.sum(w2 * (x0_pred - eps2) ** 2)


class LODSInpaintSDS:
    """LODS: inpainting SDS with a LEARNED unconditional embedding
    (ref:guidance/sd_inpainting_lods_utils.py:117-123,134-326). Two
    losses per step, functional JAX style — the caller owns the
    trainable `uncond_emb` (init = a copy of the negative prompt
    embedding, ref::118) and optimizes it with its own Adam:

      sds_loss(key, uncond_emb, images, masks, ...)  gradient for the
        renderer; noise-pred combination and grad clip follow ref::253
        (eps_c + (1-gs)/gs * eps_u - noise/gs, clamp +-grad_clip).
      embedding_loss(key, uncond_emb, images, masks)  standard
        diffusion MSE training the uncond embedding to explain the
        current renders (ref::137-165 train_embedding, t ~ U(0, T)).
    """

    def __init__(self, backend: DiffusionBackend,
                 pos_embedding: jax.Array, neg_embedding: jax.Array,
                 t_range=(0.02, 0.98), latent_size: int = 64,
                 img_size: int = 512, grad_clip: float = 10.0):
        self._s = InpaintSDS(backend, pos_embedding, neg_embedding,
                             t_range, latent_size, img_size)
        self.backend = backend
        self.grad_clip = grad_clip

    def init_uncond(self) -> jax.Array:
        """Initial learnable embedding = the negative prompt's
        (ref:sd_inpainting_lods_utils.py:118)."""
        return jnp.array(self._s.neg)

    def _prep(self, images, masks):
        s = self._s
        b = images.shape[0]
        r = s.img_size
        imgs512 = jax.image.resize(images, (b, 3, r, r), "bilinear")
        m512 = (jax.image.resize(masks, (b, 1, r, r), "bilinear")
                >= 0.5).astype(images.dtype)
        latents = self.backend.encode_images(imgs512 * 2.0 - 1.0)
        masked = jax.lax.stop_gradient(self.backend.encode_images(
            (imgs512 * 2.0 - 1.0) * (1 - m512)))
        ls = s.latent_size
        m_lat = jax.image.resize(m512, (b, 1, ls, ls), "nearest")
        return latents, masked, m_lat

    def sds_loss(self, key, uncond_emb: jax.Array, images: jax.Array,
                 masks: jax.Array, *, step_ratio=None,
                 guidance_scale: float = 7.5) -> jax.Array:
        s = self._s
        b = images.shape[0]
        latents, masked, m_lat = self._prep(images, masks)
        key, kt, kn = jax.random.split(key, 3)
        if step_ratio is not None:
            # LODS anneal: t = sr*(min-max)+max (ref::211)
            t = jnp.round(step_ratio * (s.min_step - s.max_step)
                          + s.max_step).astype(jnp.int32)
            t = jnp.full((b,), t)
        else:
            t = jax.random.randint(kt, (b,), s.min_step,
                                   s.max_step + 1)
        a_t = self.backend.alphas[t][:, None, None, None]
        w = 1.0 - a_t
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        lat0 = jax.lax.stop_gradient(latents)
        noisy = jnp.sqrt(a_t) * lat0 + jnp.sqrt(1 - a_t) * noise

        def eps(cond):
            cond_b = jnp.broadcast_to(cond[None], (b,) + cond.shape) \
                if cond.ndim == 2 else cond
            lat_in = jnp.concatenate([noisy, m_lat, masked], axis=1)
            return self.backend.unet_eps(lat_in, t, cond_b)

        e_cond = eps(s.pos)
        e_unc = eps(jax.lax.stop_gradient(uncond_emb))
        gs = guidance_scale
        # diffusers-aligned guidance definition (ref::253)
        pred = e_cond + (1.0 - gs) / gs * e_unc - noise / gs
        grad = jnp.clip(jnp.nan_to_num(w * pred),
                        -self.grad_clip, self.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        mse = 0.5 * (latents - target) ** 2 / b
        return jnp.sum(mse * jnp.broadcast_to(m_lat, mse.shape))

    def embedding_loss(self, key, uncond_emb: jax.Array,
                       images: jax.Array, masks: jax.Array) -> jax.Array:
        latents, masked, m_lat = self._prep(
            jax.lax.stop_gradient(images), masks)
        latents = jax.lax.stop_gradient(latents)
        b = latents.shape[0]
        key, kt, kn = jax.random.split(key, 3)
        T = self.backend.num_train_timesteps
        t = jax.random.randint(kt, (b,), 0, T)
        a_t = self.backend.alphas[t][:, None, None, None]
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        noisy = jnp.sqrt(a_t) * latents + jnp.sqrt(1 - a_t) * noise
        lat_in = jnp.concatenate([noisy, m_lat, masked], axis=1)
        cond = jnp.broadcast_to(uncond_emb[None],
                                (b,) + uncond_emb.shape)
        pred = self.backend.unet_eps(lat_in, t, cond)
        return jnp.mean((pred - jax.lax.stop_gradient(noise)) ** 2)


class Zero123Backend(Protocol):
    """DiffusionBackend plus the Zero123 towers (ref:guidance/
    zero123_utils.py:28-44): a CLIP image encoder, the
    clip_camera_projection MLP, and the latent-channel image
    conditioning (8-channel UNet input)."""
    alphas: jax.Array
    num_train_timesteps: int
    scaling_factor: float

    def encode_images(self, imgs: jax.Array) -> jax.Array: ...

    def decode_latents(self, latents: jax.Array) -> jax.Array: ...

    def image_embed(self, imgs: jax.Array) -> jax.Array: ...

    def cam_project(self, cc: jax.Array) -> jax.Array: ...

    def unet_eps(self, latent_in: jax.Array, t: jax.Array,
                 cond: jax.Array) -> jax.Array: ...


class Zero123SDS:
    """Novel-view SDS (ref:guidance/zero123_utils.py:15-171): the
    condition is a reference image plus the camera delta, not text.
    cc_emb = proj([clip_img_embed, T]) with
    T = [rad(elev), sin(rad(az)), cos(rad(az)), radius] (stable
    variant: last term rad(90+default_elev), ref::66-73); the latent
    input concatenates the reference image's (unscaled) VAE latents in
    channels; the unconditional branch zeroes both."""

    def __init__(self, backend: Zero123Backend,
                 t_range=(0.02, 0.98), latent_size: int = 32,
                 img_size: int = 256, stable: bool = False):
        self.backend = backend
        T = backend.num_train_timesteps
        self.min_step = int(T * t_range[0])
        self.max_step = int(T * t_range[1])
        self.latent_size = latent_size
        self.img_size = img_size
        self.stable = stable
        self.embeddings = None

    def set_image(self, image: jax.Array) -> None:
        """Reference view (B,3,H,W) in [0,1] -> cached [clip embed,
        unscaled vae latents] (ref::56-64 get_img_embeds)."""
        b = image.shape[0]
        r = self.img_size
        x = jax.image.resize(image, (b, 3, r, r), "bilinear")
        c = self.backend.image_embed(x)
        v = self.backend.encode_images(x * 2.0 - 1.0) \
            / self.backend.scaling_factor
        self.embeddings = (c, v)

    def _cam_T(self, elevation, azimuth, radius,
               default_elevation: float = 0.0) -> jax.Array:
        el = jnp.deg2rad(jnp.asarray(elevation, jnp.float32))
        az = jnp.deg2rad(jnp.asarray(azimuth, jnp.float32))
        if self.stable:
            last = jnp.full_like(
                el, float(np.deg2rad(90.0 + default_elevation)))
        else:
            last = jnp.asarray(radius, jnp.float32)
        return jnp.stack([el, jnp.sin(az), jnp.cos(az), last],
                         axis=-1)[:, None, :]      # (B, 1, 4)

    def _cond(self, batch):
        c, v = self.embeddings
        if batch % c.shape[0]:
            raise ValueError(
                f"render batch {batch} must be a multiple of the "
                f"set_image() reference batch {c.shape[0]}")
        reps = batch // c.shape[0]
        return (jnp.tile(c, (reps, 1, 1)),
                jnp.tile(v, (reps, 1, 1, 1)))

    def train_step(self, key, images: jax.Array, elevation, azimuth,
                   radius, *, step_ratio=None,
                   guidance_scale: float = 5.0,
                   default_elevation: float = 0.0) -> jax.Array:
        assert self.embeddings is not None, "call set_image() first"
        b = images.shape[0]
        r = self.img_size
        imgs = jax.image.resize(images, (b, 3, r, r), "bilinear")
        latents = self.backend.encode_images(imgs * 2.0 - 1.0)

        key, kt, kn = jax.random.split(key, 3)
        T = self.backend.num_train_timesteps
        if step_ratio is not None:
            t = jnp.clip(jnp.round((1.0 - step_ratio) * T),
                         self.min_step, self.max_step).astype(jnp.int32)
            t = jnp.full((b,), t)
        else:
            t = jax.random.randint(kt, (b,), self.min_step,
                                   self.max_step + 1)
        a_t = self.backend.alphas[t][:, None, None, None]
        w = 1.0 - a_t
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        lat0 = jax.lax.stop_gradient(latents)
        noisy = jnp.sqrt(a_t) * lat0 + jnp.sqrt(1 - a_t) * noise

        c, v = self._cond(b)
        cam = self._cam_T(elevation, azimuth, radius,
                          default_elevation)
        cc = self.backend.cam_project(
            jnp.concatenate([c, cam], axis=-1))
        e_cond = self.backend.unet_eps(
            jnp.concatenate([noisy, v], axis=1), t, cc)
        e_unc = self.backend.unet_eps(
            jnp.concatenate([noisy, jnp.zeros_like(v)], axis=1), t,
            jnp.zeros_like(cc))
        eps_hat = e_unc + guidance_scale * (e_cond - e_unc)
        grad = jnp.nan_to_num(w * (eps_hat - noise))
        target = jax.lax.stop_gradient(latents - grad)
        return jnp.sum(0.5 * (latents - target) ** 2)

    def refine(self, key, images: jax.Array, elevation, azimuth,
               radius, *, guidance_scale: float = 5.0,
               steps: int = 50, strength: float = 0.8,
               default_elevation: float = 0.0) -> jax.Array:
        """Full DDIM novel-view synthesis (ref::75-118). Keeps the
        reference's strength convention: start at timestep index
        int(steps*strength) of the descending list (i.e. strength
        close to 1 -> only the low-noise tail)."""
        from goi_tpu.guidance.samplers import (add_noise, ddim_step,
                                               ddim_timesteps)
        assert self.embeddings is not None, "call set_image() first"
        b = images.shape[0]
        r = self.img_size
        alphas = self.backend.alphas
        ts = ddim_timesteps(self.backend.num_train_timesteps, steps)
        key, kn = jax.random.split(key)
        if strength == 0:
            init = 0
            latents = jax.random.normal(
                kn, (b, 4, self.latent_size, self.latent_size))
        else:
            init = int(steps * strength)
            imgs = jax.image.resize(images, (b, 3, r, r), "bilinear")
            lat0 = self.backend.encode_images(imgs * 2.0 - 1.0)
            latents = add_noise(
                alphas, lat0,
                jax.random.normal(kn, lat0.shape, lat0.dtype),
                int(ts[init]))

        c, v = self._cond(b)
        cam = self._cam_T(elevation, azimuth, radius,
                          default_elevation)
        cc = self.backend.cam_project(
            jnp.concatenate([c, cam], axis=-1))
        ratio = self.backend.num_train_timesteps // steps
        for t in ts[init:]:
            t_in = jnp.full((b,), int(t), jnp.int32)
            e_cond = self.backend.unet_eps(
                jnp.concatenate([latents, v], axis=1), t_in, cc)
            e_unc = self.backend.unet_eps(
                jnp.concatenate([latents, jnp.zeros_like(v)], axis=1),
                t_in, jnp.zeros_like(cc))
            eps = e_unc + guidance_scale * (e_cond - e_unc)
            latents = ddim_step(alphas, eps, int(t), int(t) - ratio,
                                latents)
        return self.backend.decode_latents(latents)


def dilate_mask(mask: jax.Array, kernel: int = 3,
                iterations: int = 5) -> jax.Array:
    """Binary max-pool dilation, the role of cv2.dilate(k=3, iters=5) in
    the edit precompute (ref:gui/main_edit.py:320-395). mask (H, W)."""
    m = mask.astype(jnp.float32)[None, None]
    pad = kernel // 2
    for _ in range(iterations):
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, 1, kernel, kernel),
            (1, 1, 1, 1), [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    return (m[0, 0] > 0.5)
