"""Derive independent golden vectors for the Stable-Diffusion backend.

A from-scratch float64 TORCH transcription of the SD-1.x inpaint
UNet2DConditionModel + AutoencoderKL architecture the reference drives
through diffusers (ref:guidance/sd_inpainting_utils.py:60-123: vae
.encode -> unet(latent_in, t, text_emb) -> DDIM alphas). It is built as
a real torch nn.Module tree whose state-dict names ARE the diffusers
names — so it doubles as an independently-derived checkpoint manifest —
and it shares NO code with goi_tpu/guidance/sd_jax.py (the
derive_golden.py oracle-independence discipline: a misreading in
sd_jax.py cannot hide here).

Params are filled from a seeded numpy RNG in sorted-key order (the test
regenerates the identical values — nothing binary is committed), the
forward runs in float64, and the golden outputs + the name->shape
manifest (tiny config AND the full-size runwayml/stable-diffusion-
inpainting geometry) land in sd_golden.json.

Usage: PYTHONPATH=/root/repo python tests/golden/derive_sd_golden.py
"""

import json
import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.set_default_dtype(torch.float64)

# ---------------------------------------------------------------------------
# diffusers-named module tree (independent transcription)
# ---------------------------------------------------------------------------


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout, groups, temb_dim=None):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class CrossAttention(nn.Module):
    def __init__(self, dim, kv_dim, heads, bias=False):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=bias)
        self.to_k = nn.Linear(kv_dim, dim, bias=bias)
        self.to_v = nn.Linear(kv_dim, dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx):
        b, tq, c = x.shape
        hd = c // self.heads
        q = self.to_q(x).view(b, tq, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, tq, c)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = nn.Linear(din, dout * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, kv_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, kv_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x), self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Transformer2D(nn.Module):
    """Conv-projection variant (the runwayml SD-1.x inpaint checkpoint
    stores proj_in/proj_out as 1x1 Conv2d — use_linear_projection is
    False for SD-1.x)."""

    def __init__(self, dim, kv_dim, heads):
        super().__init__()
        self.norm = nn.GroupNorm(32, dim)
        self.proj_in = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, kv_dim, heads)])
        self.proj_out = nn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class Downsample(nn.Module):
    def __init__(self, c, asym_pad=False):
        super().__init__()
        self.asym = asym_pad
        self.conv = nn.Conv2d(c, c, 3, stride=2,
                              padding=0 if asym_pad else 1)

    def forward(self, x):
        if self.asym:  # VAE downsampler pads (0,1),(0,1)
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2,
                                       mode="nearest"))


class DownBlock(nn.Module):
    def __init__(self, cin, cout, lpb, groups, temb, kv, heads, cross,
                 last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout, groups, temb)
             for j in range(lpb)])
        if cross:
            self.attentions = nn.ModuleList(
                [Transformer2D(cout, kv, heads) for _ in range(lpb)])
        if not last:
            self.downsamplers = nn.ModuleList([Downsample(cout)])

    def forward(self, x, temb, ctx, skips):
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if hasattr(self, "attentions"):
                x = self.attentions[j](x, ctx)
            skips.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
            skips.append(x)
        return x


class UpBlock(nn.Module):
    def __init__(self, cin, cout, skip_chs, groups, temb, kv, heads,
                 cross, last):
        super().__init__()
        self.resnets = nn.ModuleList()
        ci = cin
        for sk in skip_chs:
            self.resnets.append(ResnetBlock(ci + sk, cout, groups, temb))
            ci = cout
        if cross:
            self.attentions = nn.ModuleList(
                [Transformer2D(cout, kv, heads)
                 for _ in range(len(skip_chs))])
        if not last:
            self.upsamplers = nn.ModuleList([Upsample(cout)])

    def forward(self, x, temb, ctx, skips):
        for j, res in enumerate(self.resnets):
            x = res(torch.cat([x, skips.pop()], dim=1), temb)
            if hasattr(self, "attentions"):
                x = self.attentions[j](x, ctx)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class MidBlock(nn.Module):
    def __init__(self, c, groups, temb, kv, heads, with_attn=True,
                 vae=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(c, c, groups, temb),
             ResnetBlock(c, c, groups, temb)])
        if with_attn:
            self.attentions = nn.ModuleList(
                [VaeAttention(c, groups) if vae
                 else Transformer2D(c, kv, heads)])

    def forward(self, x, temb=None, ctx=None):
        x = self.resnets[0](x, temb)
        if hasattr(self, "attentions"):
            a = self.attentions[0]
            x = a(x) if isinstance(a, VaeAttention) else a(x, ctx)
        return self.resnets[1](x, temb)


class TimeEmbedding(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.linear_1 = nn.Linear(cin, cout)
        self.linear_2 = nn.Linear(cout, cout)

    def forward(self, t_emb):
        return self.linear_2(F.silu(self.linear_1(t_emb)))


def sinusoidal(t, dim):
    """diffusers Timesteps(flip_sin_to_cos=True,
    downscale_freq_shift=0): [cos | sin]."""
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0)
                      * torch.arange(half, dtype=torch.float64) / half)
    ang = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


class UNet(nn.Module):
    def __init__(self, in_ch, out_ch, chans, lpb, heads, kv, groups):
        super().__init__()
        n = len(chans)
        temb = chans[0] * 4
        self.chans = chans
        self.time_embedding = TimeEmbedding(chans[0], temb)
        self.conv_in = nn.Conv2d(in_ch, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        skip_stack = [chans[0]]
        ci = chans[0]
        for i in range(n):
            self.down_blocks.append(DownBlock(
                ci, chans[i], lpb, groups, temb, kv, heads,
                cross=i < n - 1, last=i == n - 1))
            ci = chans[i]
            skip_stack += [ci] * lpb
            if i < n - 1:
                skip_stack.append(ci)
        self.mid_block = MidBlock(ci, groups, temb, kv, heads)
        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList()
        for i in range(n):
            sk = [skip_stack.pop() for _ in range(lpb + 1)]
            self.up_blocks.append(UpBlock(
                ci, rev[i], sk, groups, temb, kv, heads,
                cross=i > 0, last=i == n - 1))
            ci = rev[i]
        self.conv_norm_out = nn.GroupNorm(groups, ci)
        self.conv_out = nn.Conv2d(ci, out_ch, 3, padding=1)

    def forward(self, sample, t, ctx):
        temb = self.time_embedding(sinusoidal(t, self.chans[0]))
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            x = blk(x, temb, ctx, skips)
        x = self.mid_block(x, temb, ctx)
        for blk in self.up_blocks:
            x = blk(x, temb, ctx, skips)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class VaeAttention(nn.Module):
    """AutoencoderKL mid-block single-head attention (to_* WITH
    bias)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
        y = self.to_out[0](a @ v)
        return res + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class VaeDownBlock(nn.Module):
    def __init__(self, cin, cout, lpb, groups, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout, groups)
             for j in range(lpb)])
        if not last:
            self.downsamplers = nn.ModuleList(
                [Downsample(cout, asym_pad=True)])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class VaeUpBlock(nn.Module):
    def __init__(self, cin, cout, lpb, groups, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout, groups)
             for j in range(lpb + 1)])
        if not last:
            self.upsamplers = nn.ModuleList([Upsample(cout)])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class VaeEncoder(nn.Module):
    def __init__(self, chans, lpb, groups, latent):
        super().__init__()
        self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ci = chans[0]
        for i, co in enumerate(chans):
            self.down_blocks.append(
                VaeDownBlock(ci, co, lpb, groups, last=i == len(chans) - 1))
            ci = co
        self.mid_block = MidBlock(ci, groups, None, None, None,
                                  vae=True)
        self.conv_norm_out = nn.GroupNorm(groups, ci)
        self.conv_out = nn.Conv2d(ci, 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class VaeDecoder(nn.Module):
    def __init__(self, chans, lpb, groups, latent):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = MidBlock(rev[0], groups, None, None, None,
                                  vae=True)
        self.up_blocks = nn.ModuleList()
        ci = rev[0]
        for i, co in enumerate(rev):
            self.up_blocks.append(
                VaeUpBlock(ci, co, lpb, groups, last=i == len(rev) - 1))
            ci = co
        self.conv_norm_out = nn.GroupNorm(groups, ci)
        self.conv_out = nn.Conv2d(ci, 3, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class VAE(nn.Module):
    def __init__(self, chans, lpb, groups, latent):
        super().__init__()
        self.encoder = VaeEncoder(chans, lpb, groups, latent)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)
        self.decoder = VaeDecoder(chans, lpb, groups, latent)


# ---------------------------------------------------------------------------
# golden derivation
# ---------------------------------------------------------------------------

# tiny config == tests/test_sd_backend.py TINY (with the conv proj_in
# variant of the spatial transformer — the real-checkpoint layout)
TINY = dict(in_ch=9, out_ch=4, chans=(32, 64), lpb=1, heads=2, kv=24,
            groups=8, vae_chans=(16, 32), vae_lpb=1, latent=4)
# full-size runwayml/stable-diffusion-inpainting geometry
FULL = dict(in_ch=9, out_ch=4, chans=(320, 640, 1280, 1280), lpb=2,
            heads=8, kv=768, groups=32,
            vae_chans=(128, 256, 512, 512), vae_lpb=2, latent=4)


def fill_params(module, seed):
    """Deterministic fp32 values from a seeded numpy RNG in sorted
    state-dict-key order (the parity test regenerates these exactly)."""
    rng = np.random.default_rng(seed)
    sd = module.state_dict()
    for k in sorted(sd):
        shape = tuple(sd[k].shape)
        v = make_param(rng, k, shape)
        sd[k] = torch.tensor(v, dtype=torch.float64)
    module.load_state_dict(sd)


def make_param(rng, key, shape):
    """Shared value recipe (fp32): norms ~ 1 + 0.1 N, biases 0.05 N,
    weights 0.3/sqrt(fan_in) N."""
    leaf = key.split(".")[-1]
    parent = key.split(".")[-2] if "." in key else ""
    if leaf == "weight" and ("norm" in parent or parent == "group_norm"):
        v = 1.0 + 0.1 * rng.standard_normal(shape)
    elif leaf == "bias":
        v = 0.05 * rng.standard_normal(shape)
    else:
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        v = rng.standard_normal(shape) * (0.3 / np.sqrt(max(fan_in, 1)))
    return v.astype(np.float32)


def build(cfgd, meta=False):
    ctx = torch.device("meta") if meta else torch.device("cpu")
    with ctx:
        unet = UNet(cfgd["in_ch"], cfgd["out_ch"], cfgd["chans"],
                    cfgd["lpb"], cfgd["heads"], cfgd["kv"],
                    cfgd["groups"])
        vae = VAE(cfgd["vae_chans"], cfgd["vae_lpb"], cfgd["groups"],
                  cfgd["latent"])
    return unet, vae


def main():
    torch.manual_seed(0)
    unet, vae = build(TINY)
    fill_params(unet, 100)
    fill_params(vae, 200)
    unet.eval()
    vae.eval()

    rng = np.random.default_rng(7)
    sample = rng.standard_normal((2, 9, 8, 8)).astype(np.float32)
    t = np.array([3, 40], np.int64)
    ctx = rng.standard_normal((2, 7, 24)).astype(np.float32)
    img = rng.uniform(-1, 1, (1, 3, 16, 16)).astype(np.float32)
    lat = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)

    with torch.no_grad():
        eps = unet(torch.tensor(sample, dtype=torch.float64),
                   torch.tensor(t), torch.tensor(ctx, dtype=torch.float64))
        moments = vae.quant_conv(vae.encoder(
            torch.tensor(img, dtype=torch.float64)))
        mean = moments[:, :4]
        dec = vae.decoder(vae.post_quant_conv(
            torch.tensor(lat, dtype=torch.float64)))

    unet_f, vae_f = build(FULL, meta=True)
    blob = {
        "inputs": {
            "sample": sample.tolist(), "t": t.tolist(),
            "context": ctx.tolist(), "img": img.tolist(),
            "latents": lat.tolist(),
        },
        "outputs": {
            "unet_eps": eps.numpy().tolist(),
            "vae_mean": mean.numpy().tolist(),
            "vae_decode": dec.numpy().tolist(),
        },
        "manifest_tiny": {
            **{"unet." + k: list(v.shape)
               for k, v in unet.state_dict().items()},
            **{"vae." + k: list(v.shape)
               for k, v in vae.state_dict().items()},
        },
        "manifest_full": {
            **{"unet." + k: list(v.shape)
               for k, v in unet_f.state_dict().items()},
            **{"vae." + k: list(v.shape)
               for k, v in vae_f.state_dict().items()},
        },
    }
    out = os.path.join(os.path.dirname(__file__), "sd_golden.json")
    with open(out, "w") as f:
        json.dump(blob, f)
    print(f"wrote {out}: manifest tiny {len(blob['manifest_tiny'])} / "
          f"full {len(blob['manifest_full'])} entries")


if __name__ == "__main__":
    main()
