"""Runnable Stable-Diffusion backend in pure JAX (UNet + VAE encoder).

The reference drives its SDS editing loops with diffusers'
StableDiffusionInpaintPipeline (ref:guidance/sd_inpainting_utils.py:
60-123: vae.encode, unet(latent_in, t, text_emb), DDIM alphas). This
module re-implements that backend TPU-natively so `EditSession` /
`InpaintSDS.train_step` actually RUN in this framework:

  - `JaxDiffusionBackend` satisfies goi_tpu/guidance/sds.py's
    DiffusionBackend protocol: `alphas` (cumprod schedule),
    `encode_images`, `unet_eps`.
  - The architecture is the SD-1.x UNet2DConditionModel / AutoencoderKL
    encoder, parameterized by `SDConfig` so tests run a tiny variant.
  - Weights are PLUGGABLE (no egress here): convert a local diffusers
    checkpoint once with `convert_diffusers_state` (torch-CPU) and load
    the .npz; parameter names mirror diffusers keys exactly.

Everything is functional: params are a flat {diffusers_key: array}
dict, the forward is jit-able and fp32/bf16-polymorphic.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SDConfig:
    """SD-1.x shapes. Defaults match runwayml/stable-diffusion-
    inpainting (9-ch UNet input) at full size; tests shrink widths."""

    in_channels: int = 9            # 4 latent + 1 mask + 4 masked-latent
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8     # heads; head size = ch // heads
    cross_attention_dim: int = 768
    norm_groups: int = 32
    # VAE encoder
    vae_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    vae_layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    # schedule (scaled_linear, ref diffusers PNDM/DDIM defaults)
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012


def alphas_cumprod(cfg: SDConfig) -> jnp.ndarray:
    betas = jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                         cfg.num_train_timesteps) ** 2
    return jnp.cumprod(1.0 - betas)


# ---------------------------------------------------------------------------
# primitive layers (params are flat dicts keyed by diffusers names)
# ---------------------------------------------------------------------------

def _conv(p, k, x, stride=1, pad=1):
    w, b = p[k + ".weight"], p[k + ".bias"]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


from goi_tpu.query._nn import linear as _linear


def _group_norm(p, k, x, groups, eps=1e-5):
    from goi_tpu.query._nn import group_norm
    return group_norm(p, k, x, groups=groups, eps=eps)


def _layer_norm(p, k, x, eps=1e-5):
    from goi_tpu.query._nn import layer_norm
    return layer_norm(p, k, x, eps=eps)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _resnet(p, k, x, temb, groups):
    h = _group_norm(p, k + ".norm1", x, groups)
    h = _conv(p, k + ".conv1", _silu(h))
    if temb is not None and (k + ".time_emb_proj.weight") in p:
        h = h + _linear(p, k + ".time_emb_proj",
                        _silu(temb))[:, :, None, None]
    h = _group_norm(p, k + ".norm2", h, groups)
    h = _conv(p, k + ".conv2", _silu(h))
    if (k + ".conv_shortcut.weight") in p:
        w = p[k + ".conv_shortcut.weight"]
        if w.ndim == 4:
            x = _conv(p, k + ".conv_shortcut", x, pad=(w.shape[-1] // 2))
        else:
            x = jnp.einsum("nchw,oc->nohw", x, w) \
                + p[k + ".conv_shortcut.bias"][None, :, None, None]
    return x + h


def _attention(p, k, x, ctx, heads):
    """diffusers Attention (to_q/to_k/to_v/to_out.0)."""
    q = _linear(p, k + ".to_q", x) if (k + ".to_q.bias") in p \
        else x @ p[k + ".to_q.weight"].T
    kk = ctx @ p[k + ".to_k.weight"].T if (k + ".to_k.bias") not in p \
        else _linear(p, k + ".to_k", ctx)
    v = ctx @ p[k + ".to_v.weight"].T if (k + ".to_v.bias") not in p \
        else _linear(p, k + ".to_v", ctx)
    b, tq, c = q.shape
    tk = kk.shape[1]
    hd = c // heads
    q = q.reshape(b, tq, heads, hd).transpose(0, 2, 1, 3)
    kk = kk.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax((q @ kk.transpose(0, 1, 3, 2)) * hd ** -0.5, -1)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(b, tq, c)
    return _linear(p, k + ".to_out.0", o)


def _geglu_ff(p, k, x):
    h = _linear(p, k + ".net.0.proj", x)
    a, g = jnp.split(h, 2, axis=-1)
    return _linear(p, k + ".net.2", a * jax.nn.gelu(g, approximate=False))


def _transformer_block(p, k, x, ctx, heads):
    h = _layer_norm(p, k + ".norm1", x)
    x = x + _attention(p, k + ".attn1", h, h, heads)     # self
    x = x + _attention(p, k + ".attn2",
                       _layer_norm(p, k + ".norm2", x), ctx, heads)
    x = x + _geglu_ff(p, k + ".ff", _layer_norm(p, k + ".norm3", x))
    return x


def _spatial_transformer(p, k, x, ctx, heads):
    """Transformer2DModel: GN -> proj_in -> blocks -> proj_out + skip."""
    b, c, h, w = x.shape
    res = x
    x = _group_norm(p, k + ".norm", x, 32)
    linear_proj = p[k + ".proj_in.weight"].ndim == 2
    if linear_proj:
        x = x.transpose(0, 2, 3, 1).reshape(b, h * w, c)
        x = _linear(p, k + ".proj_in", x)
    else:
        x = _conv(p, k + ".proj_in", x, pad=0)
        x = x.transpose(0, 2, 3, 1).reshape(b, h * w, c)
    i = 0
    while (k + f".transformer_blocks.{i}.norm1.weight") in p:
        x = _transformer_block(p, k + f".transformer_blocks.{i}", x,
                               ctx, heads)
        i += 1
    if linear_proj:
        x = _linear(p, k + ".proj_out", x)
        x = x.reshape(b, h, w, c).transpose(0, 3, 1, 2)
    else:
        x = x.reshape(b, h, w, c).transpose(0, 3, 1, 2)
        x = _conv(p, k + ".proj_out", x, pad=0)
    return x + res


def _vae_attn(p, k, x, groups):
    """AutoencoderKL mid-block single-head attention."""
    b, c, h, w = x.shape
    res = x
    x = _group_norm(p, k + ".group_norm", x, groups)
    x = x.transpose(0, 2, 3, 1).reshape(b, h * w, c)
    x = _attention(p, k, x, x, heads=1)
    return res + x.reshape(b, h, w, c).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# UNet forward
# ---------------------------------------------------------------------------

def timestep_embedding(t, dim, max_period=10000.0):
    """Sinusoidal embedding, diffusers Timesteps(flip_sin_to_cos=True,
    downscale_freq_shift=0) convention: [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def unet_forward(p: dict, cfg: SDConfig, sample: jax.Array,
                 t: jax.Array, context: jax.Array) -> jax.Array:
    """sample (B, in_ch, H, W), t (B,) int, context (B, 77, cross_dim)
    -> eps (B, out_ch, H, W). Mirrors UNet2DConditionModel.forward for
    the SD-1.x layout (CrossAttnDownBlock2D x3 + DownBlock2D / mid /
    UpBlock2D + CrossAttnUpBlock2D x3)."""
    ch = cfg.block_out_channels
    heads = cfg.attention_head_dim
    g = cfg.norm_groups
    n_blocks = len(ch)
    lpb = cfg.layers_per_block

    temb = timestep_embedding(t, ch[0])
    temb = _linear(p, "time_embedding.linear_1", temb)
    temb = _linear(p, "time_embedding.linear_2", _silu(temb))

    x = _conv(p, "conv_in", sample)
    skips = [x]
    for i in range(n_blocks):
        blk = f"down_blocks.{i}"
        cross = i < n_blocks - 1
        for j in range(lpb):
            x = _resnet(p, f"{blk}.resnets.{j}", x, temb, g)
            if cross:
                x = _spatial_transformer(p, f"{blk}.attentions.{j}", x,
                                         context, heads)
            skips.append(x)
        if i < n_blocks - 1:
            x = _conv(p, f"{blk}.downsamplers.0.conv", x, stride=2)
            skips.append(x)

    x = _resnet(p, "mid_block.resnets.0", x, temb, g)
    x = _spatial_transformer(p, "mid_block.attentions.0", x, context,
                             heads)
    x = _resnet(p, "mid_block.resnets.1", x, temb, g)

    for i in range(n_blocks):
        blk = f"up_blocks.{i}"
        cross = i > 0
        for j in range(lpb + 1):
            x = jnp.concatenate([x, skips.pop()], axis=1)
            x = _resnet(p, f"{blk}.resnets.{j}", x, temb, g)
            if cross:
                x = _spatial_transformer(p, f"{blk}.attentions.{j}", x,
                                         context, heads)
        if i < n_blocks - 1:
            b_, c_, h_, w_ = x.shape
            x = jax.image.resize(x, (b_, c_, h_ * 2, w_ * 2), "nearest")
            x = _conv(p, f"{blk}.upsamplers.0.conv", x)

    x = _group_norm(p, "conv_norm_out", x, g)
    return _conv(p, "conv_out", _silu(x))


# ---------------------------------------------------------------------------
# VAE encoder forward
# ---------------------------------------------------------------------------

def vae_encode(p: dict, cfg: SDConfig, img: jax.Array,
               sample_key: Optional[jax.Array] = None) -> jax.Array:
    """img (B, 3, H, W) in [-1, 1] -> scaled latents
    (B, latent_ch, H/8, W/8). Deterministic (mode) unless sample_key is
    given (the reference samples the posterior,
    ref:guidance/sd_inpainting_utils.py:113-116)."""
    ch = cfg.vae_block_out_channels
    g = cfg.norm_groups
    x = _conv(p, "encoder.conv_in", img)
    for i in range(len(ch)):
        blk = f"encoder.down_blocks.{i}"
        for j in range(cfg.vae_layers_per_block):
            x = _resnet(p, f"{blk}.resnets.{j}", x, None, g)
        if i < len(ch) - 1:
            # diffusers pads asymmetrically ((0,1),(0,1)) for stride 2
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
            w = p[f"{blk}.downsamplers.0.conv.weight"]
            x = jax.lax.conv_general_dilated(
                x, w, (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW")) \
                + p[f"{blk}.downsamplers.0.conv.bias"][None, :, None,
                                                       None]
    x = _resnet(p, "encoder.mid_block.resnets.0", x, None, g)
    x = _vae_attn(p, "encoder.mid_block.attentions.0", x, g)
    x = _resnet(p, "encoder.mid_block.resnets.1", x, None, g)
    x = _group_norm(p, "encoder.conv_norm_out", x, g)
    x = _conv(p, "encoder.conv_out", _silu(x))
    x = _conv(p, "quant_conv", x, pad=0)
    mean, logvar = jnp.split(x, 2, axis=1)
    if sample_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(sample_key, mean.shape)
    return mean * cfg.scaling_factor


def vae_decode(p: dict, cfg: SDConfig, latents: jax.Array) -> jax.Array:
    """Scaled latents (B, latent_ch, h, w) -> image (B, 3, 8h, 8w) in
    [-1, 1]. Mirrors diffusers AutoencoderKL.decode (post_quant_conv +
    Decoder: conv_in / mid / 4 up blocks of layers_per_block+1 resnets
    with nearest-2x upsample). The reference calls this for inpaint
    sampling and guidance previews (ref:guidance/
    sd_inpainting_lods_utils.py:403-409, zero123_utils.py:174-180)."""
    ch = cfg.vae_block_out_channels
    g = cfg.norm_groups
    x = latents / cfg.scaling_factor
    x = _conv(p, "post_quant_conv", x, pad=0)
    x = _conv(p, "decoder.conv_in", x)
    x = _resnet(p, "decoder.mid_block.resnets.0", x, None, g)
    x = _vae_attn(p, "decoder.mid_block.attentions.0", x, g)
    x = _resnet(p, "decoder.mid_block.resnets.1", x, None, g)
    rev = list(reversed(ch))
    for i in range(len(rev)):
        blk = f"decoder.up_blocks.{i}"
        for j in range(cfg.vae_layers_per_block + 1):
            x = _resnet(p, f"{blk}.resnets.{j}", x, None, g)
        if i < len(rev) - 1:
            b_, c_, h_, w_ = x.shape
            x = jax.image.resize(x, (b_, c_, h_ * 2, w_ * 2), "nearest")
            x = _conv(p, f"{blk}.upsamplers.0.conv", x)
    x = _group_norm(p, "decoder.conv_norm_out", x, g)
    return _conv(p, "decoder.conv_out", _silu(x))


# ---------------------------------------------------------------------------
# init (tests / from-scratch) + diffusers conversion
# ---------------------------------------------------------------------------

def _init_params(key, shapes: dict, scale=0.1) -> dict:
    ks = jax.random.split(key, len(shapes))
    out = {}
    for (k, shape), kk in zip(sorted(shapes.items()), ks):
        if k.endswith(".bias") or "norm" in k.split(".")[-2]:
            out[k] = jnp.zeros(shape) if k.endswith(".bias") \
                else jnp.ones(shape)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else 1
            out[k] = jax.random.normal(kk, shape) * (scale / math.sqrt(
                max(fan_in, 1)))
    return out


def _unet_shapes(cfg: SDConfig) -> dict:
    ch = cfg.block_out_channels
    n = len(ch)
    lpb = cfg.layers_per_block
    cd = cfg.cross_attention_dim
    s = {}

    def conv(k, o, i, ks=3):
        s[k + ".weight"] = (o, i, ks, ks)
        s[k + ".bias"] = (o,)

    def lin(k, o, i):
        s[k + ".weight"] = (o, i)
        s[k + ".bias"] = (o,)

    def norm(k, c):
        s[k + ".weight"] = (c,)
        s[k + ".bias"] = (c,)

    def resnet(k, ci, co, temb=True):
        norm(k + ".norm1", ci)
        conv(k + ".conv1", co, ci)
        if temb:
            lin(k + ".time_emb_proj", co, ch[0] * 4)
        norm(k + ".norm2", co)
        conv(k + ".conv2", co, co)
        if ci != co:
            conv(k + ".conv_shortcut", co, ci, ks=1)

    def attn(k, c, kv=None, bias_qkv=False):
        for nm in ("to_q", "to_k", "to_v"):
            i = c if nm == "to_q" or kv is None else kv
            s[k + f".{nm}.weight"] = (c, i)
            if bias_qkv:
                s[k + f".{nm}.bias"] = (c,)
        lin(k + ".to_out.0", c, c)

    def xformer(k, c):
        norm(k + ".norm", c)
        lin(k + ".proj_in", c, c)
        b = k + ".transformer_blocks.0"
        for nn in ("norm1", "norm2", "norm3"):
            norm(f"{b}.{nn}", c)
        attn(b + ".attn1", c)
        attn(b + ".attn2", c, kv=cd)
        lin(b + ".ff.net.0.proj", c * 8, c)
        lin(b + ".ff.net.2", c, c * 4)
        lin(k + ".proj_out", c, c)

    lin("time_embedding.linear_1", ch[0] * 4, ch[0])
    lin("time_embedding.linear_2", ch[0] * 4, ch[0] * 4)
    conv("conv_in", ch[0], cfg.in_channels)
    outs = [ch[0]]
    ci = ch[0]
    for i in range(n):
        for j in range(lpb):
            resnet(f"down_blocks.{i}.resnets.{j}", ci, ch[i])
            ci = ch[i]
            if i < n - 1:
                xformer(f"down_blocks.{i}.attentions.{j}", ci)
            outs.append(ci)
        if i < n - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", ci, ci)
            outs.append(ci)
    resnet("mid_block.resnets.0", ci, ci)
    xformer("mid_block.attentions.0", ci)
    resnet("mid_block.resnets.1", ci, ci)
    rev = list(reversed(ch))
    for i in range(n):
        co = rev[i]
        for j in range(lpb + 1):
            skip = outs.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", ci + skip, co)
            ci = co
            if i > 0:
                xformer(f"up_blocks.{i}.attentions.{j}", ci)
        if i < n - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", ci, ci)
    norm("conv_norm_out", ci)
    conv("conv_out", cfg.out_channels, ci)
    return s


def _vae_shapes(cfg: SDConfig) -> dict:
    ch = cfg.vae_block_out_channels
    s = {}

    def conv(k, o, i, ks=3):
        s[k + ".weight"] = (o, i, ks, ks)
        s[k + ".bias"] = (o,)

    def norm(k, c):
        s[k + ".weight"] = (c,)
        s[k + ".bias"] = (c,)

    def resnet(k, ci, co):
        norm(k + ".norm1", ci)
        conv(k + ".conv1", co, ci)
        norm(k + ".norm2", co)
        conv(k + ".conv2", co, co)
        if ci != co:
            conv(k + ".conv_shortcut", co, ci, ks=1)

    conv("encoder.conv_in", ch[0], 3)
    ci = ch[0]
    for i, co in enumerate(ch):
        for j in range(cfg.vae_layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ci, co)
            ci = co
        if i < len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ci, ci)
    resnet("encoder.mid_block.resnets.0", ci, ci)
    k = "encoder.mid_block.attentions.0"
    norm(k + ".group_norm", ci)
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        s[k + f".{nm}.weight"] = (ci, ci)
        s[k + f".{nm}.bias"] = (ci,)
    resnet("encoder.mid_block.resnets.1", ci, ci)
    norm("encoder.conv_norm_out", ci)
    conv("encoder.conv_out", 2 * cfg.latent_channels, ci)
    conv("quant_conv", 2 * cfg.latent_channels,
         2 * cfg.latent_channels, ks=1)

    # decoder (mirror of the encoder; diffusers Decoder layout)
    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels,
         ks=1)
    rev = list(reversed(ch))
    conv("decoder.conv_in", rev[0], cfg.latent_channels)
    resnet("decoder.mid_block.resnets.0", rev[0], rev[0])
    k = "decoder.mid_block.attentions.0"
    norm(k + ".group_norm", rev[0])
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        s[k + f".{nm}.weight"] = (rev[0], rev[0])
        s[k + f".{nm}.bias"] = (rev[0],)
    resnet("decoder.mid_block.resnets.1", rev[0], rev[0])
    ci = rev[0]
    for i, co in enumerate(rev):
        for j in range(cfg.vae_layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ci, co)
            ci = co
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ci, ci)
    norm("decoder.conv_norm_out", ci)
    conv("decoder.conv_out", 3, ci)
    return s


def init_sd_params(key, cfg: SDConfig) -> dict:
    k1, k2 = jax.random.split(key)
    p = _init_params(k1, _unet_shapes(cfg))
    p.update(_init_params(k2, _vae_shapes(cfg)))
    return p


def convert_diffusers_state(unet_sd=None, vae_sd=None) -> dict:
    """diffusers UNet2DConditionModel / AutoencoderKL state_dicts ->
    this module's flat numpy params (run offline, np.savez the
    result). Names pass through; conv 1x1 'proj_in/out' stay as-is
    (both layouts are handled in the forward)."""
    out = {}
    for sd in (unet_sd or {},):
        for k, v in sd.items():
            out[k] = np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                np.float32)
    for sd in (vae_sd or {},):
        for k, v in sd.items():
            out[k] = np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                np.float32)
    return out


class JaxDiffusionBackend:
    """DiffusionBackend-protocol provider running the SD UNet + VAE
    encoder fully in JAX."""

    def __init__(self, params: dict, cfg: SDConfig):
        self.cfg = cfg
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.alphas = alphas_cumprod(cfg)
        self.num_train_timesteps = cfg.num_train_timesteps
        self.scaling_factor = cfg.scaling_factor
        self._enc = jax.jit(lambda p, x: vae_encode(p, cfg, x))
        self._dec = jax.jit(lambda p, z: vae_decode(p, cfg, z))
        self._unet = jax.jit(
            lambda p, x, t, c: unet_forward(p, cfg, x, t, c))

    @staticmethod
    def from_npz(path: str, cfg: SDConfig) -> "JaxDiffusionBackend":
        return JaxDiffusionBackend(dict(np.load(path)), cfg)

    def encode_images(self, imgs: jax.Array) -> jax.Array:
        return self._enc(self.params, imgs)

    def unet_eps(self, latent_in: jax.Array, t: jax.Array,
                 cond: jax.Array) -> jax.Array:
        return self._unet(self.params, latent_in, t, cond)

    def decode_latents(self, latents: jax.Array) -> jax.Array:
        """Scaled latents -> images in [0, 1]
        (ref:guidance/sd_inpainting_utils.py decode_latents)."""
        return jnp.clip(self._dec(self.params, latents) / 2 + 0.5,
                        0.0, 1.0)
