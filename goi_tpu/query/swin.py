"""Swin Transformer backbone in pure JAX (detection variant).

TPU re-host of GroundingDINO's vendored Swin
(ref:ext/GroundingDINO/groundingdino/models/GroundingDINO/backbone/
swin_transformer.py) — the image tower of the RES detector. Weights are
pluggable, SAM-style: params is a FLAT dict keyed by the official
checkpoint state_dict names under the ``backbone.0.`` prefix
(``backbone.0.layers.0.blocks.0.attn.qkv.weight`` ...), so loading the
released groundingdino_swint_ogc.pth needs zero renaming.
``relative_position_index`` and the shifted-window attention masks are
shape-only buffers — recomputed here in numpy at trace time (static
image sizes), never loaded.

TPU notes: the window partition is a static reshape/transpose chain, so
every stage is one batched (num_windows*B, 49, C) MXU attention; shift
is a static jnp.roll; all padding amounts are python ints. Run at a
fixed square input size for one compilation.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    out_indices: Tuple[int, ...] = (1, 2, 3)
    mlp_ratio: float = 4.0

    @property
    def num_features(self) -> Tuple[int, ...]:
        return tuple(int(self.embed_dim * 2 ** i)
                     for i in range(len(self.depths)))


# checkpoint configs (ref:swin_transformer.py:771-787)
SWIN_T = SwinConfig()
SWIN_B = SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                    num_heads=(4, 8, 16, 32))
SWIN_TINY_TEST = SwinConfig(embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                            window=4, out_indices=(0, 1))


from goi_tpu.query._nn import gelu as _gelu, linear as _linear
from goi_tpu.query._nn import layer_norm as _layer_norm


def _ln(p, name, x, eps=1e-5):   # torch nn.LayerNorm default
    return _layer_norm(p, name, x, eps=eps)


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) int index into the (2ws-1)^2 bias table
    (ref:swin_transformer.py:114-124)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # 2, n, n
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws*ws, ws*ws) additive mask (0 / -100) for the
    shifted windows (ref:swin_transformer.py:370-392)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws) \
        .transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_attn(p, name, x, num_heads: int, ws: int,
                 mask: np.ndarray | None):
    """x: (B*nW, ws*ws, C) (ref:swin_transformer.py:133-166)."""
    bn, n, c = x.shape
    hd = c // num_heads
    qkv = _linear(p, f"{name}.qkv", x) \
        .reshape(bn, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(0, 1, 3, 2)      # (bn, h, n, n)
    bias = p[f"{name}.relative_position_bias_table"][
        _rel_pos_index(ws).reshape(-1)].reshape(n, n, num_heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bn // nw, nw, num_heads, n, n) \
            + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(bn, num_heads, n, n)
    attn = jax.nn.softmax(attn, -1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(bn, n, c)
    return _linear(p, f"{name}.proj", out)


def _block(p, name, x, hw: Tuple[int, int], num_heads: int, ws: int,
           shift: int):
    """One SwinTransformerBlock on (B, H*W, C)
    (ref:swin_transformer.py:225-291)."""
    h, w = hw
    b, _, c = x.shape
    shortcut = x
    x = _ln(p, f"{name}.norm1", x).reshape(b, h, w, c)
    ph, pw = (-h) % ws, (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    use_shift = shift
    if use_shift:
        x = jnp.roll(x, (-use_shift, -use_shift), axis=(1, 2))
        mask = _shift_attn_mask(hp, wp, ws, use_shift)
    else:
        mask = None
    win = x.reshape(b, hp // ws, ws, wp // ws, ws, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    win = _window_attn(p, f"{name}.attn", win, num_heads, ws, mask)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if use_shift:
        x = jnp.roll(x, (use_shift, use_shift), axis=(1, 2))
    x = x[:, :h, :w].reshape(b, h * w, c)
    x = shortcut + x
    y = _ln(p, f"{name}.norm2", x)
    y = _linear(p, f"{name}.mlp.fc2", _gelu(_linear(p, f"{name}.mlp.fc1",
                                                    y)))
    return x + y


def _patch_merging(p, name, x, hw: Tuple[int, int]):
    """(B, H*W, C) -> (B, ceil(H/2)*ceil(W/2), 2C)
    (ref:swin_transformer.py:300-338)."""
    h, w = hw
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], -1).reshape(b, -1, 4 * c)
    x = _ln(p, f"{name}.norm", x)
    return _linear(p, f"{name}.reduction", x)


def swin_forward(p: dict, cfg: SwinConfig, x: jax.Array,
                 prefix: str = "backbone.0") -> List[jax.Array]:
    """(B, 3, H, W) image -> [(B, C_i, H_i, W_i) for out_indices]
    (ref:swin_transformer.py:711-746)."""
    b = x.shape[0]
    ph, pw = (-x.shape[2]) % 4, (-x.shape[3]) % 4
    x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)))
    w_ = p[f"{prefix}.patch_embed.proj.weight"]
    x = jax.lax.conv_general_dilated(
        x, w_, (4, 4), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) \
        + p[f"{prefix}.patch_embed.proj.bias"][None, :, None, None]
    h, w = x.shape[2], x.shape[3]
    x = x.reshape(b, cfg.embed_dim, h * w).transpose(0, 2, 1)
    x = _ln(p, f"{prefix}.patch_embed.norm", x)

    outs = []
    for i, depth in enumerate(cfg.depths):
        shift = cfg.window // 2
        for j in range(depth):
            x = _block(p, f"{prefix}.layers.{i}.blocks.{j}", x, (h, w),
                       cfg.num_heads[i], cfg.window,
                       0 if j % 2 == 0 else shift)
        if i in cfg.out_indices:
            y = _ln(p, f"{prefix}.norm{i}", x)
            outs.append(y.transpose(0, 2, 1)
                        .reshape(b, cfg.num_features[i], h, w))
        if i < len(cfg.depths) - 1:
            x = _patch_merging(p, f"{prefix}.layers.{i}.downsample", x,
                               (h, w))
            h, w = (h + 1) // 2, (w + 1) // 2
    return outs


def swin_param_shapes(cfg: SwinConfig,
                      prefix: str = "backbone.0") -> dict:
    s = {}
    e = cfg.embed_dim
    s[f"{prefix}.patch_embed.proj.weight"] = (e, 3, 4, 4)
    s[f"{prefix}.patch_embed.proj.bias"] = (e,)
    s[f"{prefix}.patch_embed.norm.weight"] = (e,)
    s[f"{prefix}.patch_embed.norm.bias"] = (e,)
    ws = cfg.window
    for i, depth in enumerate(cfg.depths):
        c = cfg.num_features[i]
        for j in range(depth):
            blk = f"{prefix}.layers.{i}.blocks.{j}"
            for nm in ("norm1", "norm2"):
                s[f"{blk}.{nm}.weight"] = (c,)
                s[f"{blk}.{nm}.bias"] = (c,)
            s[f"{blk}.attn.relative_position_bias_table"] = \
                ((2 * ws - 1) ** 2, cfg.num_heads[i])
            s[f"{blk}.attn.qkv.weight"] = (3 * c, c)
            s[f"{blk}.attn.qkv.bias"] = (3 * c,)
            s[f"{blk}.attn.proj.weight"] = (c, c)
            s[f"{blk}.attn.proj.bias"] = (c,)
            hid = int(c * cfg.mlp_ratio)
            s[f"{blk}.mlp.fc1.weight"] = (hid, c)
            s[f"{blk}.mlp.fc1.bias"] = (hid,)
            s[f"{blk}.mlp.fc2.weight"] = (c, hid)
            s[f"{blk}.mlp.fc2.bias"] = (c,)
        if i < len(cfg.depths) - 1:
            dn = f"{prefix}.layers.{i}.downsample"
            s[f"{dn}.norm.weight"] = (4 * c,)
            s[f"{dn}.norm.bias"] = (4 * c,)
            s[f"{dn}.reduction.weight"] = (2 * c, 4 * c)
    for i in cfg.out_indices:
        c = cfg.num_features[i]
        s[f"{prefix}.norm{i}.weight"] = (c,)
        s[f"{prefix}.norm{i}.bias"] = (c,)
    return s
