"""Segment-Anything (SAM) in pure JAX — box-prompted mask prediction.

TPU re-host of the vendored torch SAM (P21,
ref:ext/segment_anything/modeling/{image_encoder,prompt_encoder,
mask_decoder,transformer,sam}.py, build configs build_sam.py:14-56).
Weights are pluggable, LPIPS/CLIP-style: params is a FLAT dict keyed by
the official checkpoint state_dict names (`image_encoder.blocks.0.attn.
qkv.weight`, ...), so `load_sam_params` is a torch.load + numpy cast
with zero renaming. `init_sam_params` builds a random-weight model of
the same shapes for tests.

The RES pipeline (query/res.py) uses exactly the box-prompted,
single-mask path (ref:guidance/res_model.py:285-340): `SamJax.predict`
mirrors SamPredictor.set_image + predict_torch(boxes=...,
multimask_output=False) including the longest-side-1024 resize,
mean/std normalization, bottom-right padding, and the 256->1024->crop->
original upscale chain (ref:ext/segment_anything/predictor.py and
modeling/sam.py:139-172).

TPU notes: all attention is dense MXU matmuls; window partition is a
static reshape/transpose; the 14x14 windows of ViT-H give (64*B, 196,
1280) batched attention — comfortably MXU-shaped. Everything is jit-
compatible with static image size (1024 fixed by the architecture).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn: Tuple[int, ...] = (2, 5, 8, 11)
    window: int = 14
    img_size: int = 1024
    patch: int = 16
    prompt_dim: int = 256
    mask_in_chans: int = 16
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp: int = 2048
    num_multimask: int = 3

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


# checkpoint configs (ref:build_sam.py:14-44)
SAM_VIT_B = SAMConfig()
SAM_VIT_L = SAMConfig(embed_dim=1024, depth=24, num_heads=16,
                      global_attn=(5, 11, 17, 23))
SAM_VIT_H = SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                      global_attn=(7, 15, 23, 31))

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(p, name, x, *, stride=1, pad=0):
    """NCHW conv with torch OIHW weights (+ optional bias)."""
    w = p[f"{name}.weight"]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    b = p.get(f"{name}.bias")
    return y if b is None else y + b[None, :, None, None]


def _deconv2x(p, name, x):
    """ConvTranspose2d(k=2, s=2); torch weight layout (Cin, Cout, 2, 2)."""
    w = p[f"{name}.weight"]
    # transpose_kernel=True + OIHW spec matches torch ConvTranspose2d
    # exactly with the native (Cin, Cout, kh, kw) weight (verified
    # numerically vs F.conv_transpose2d)
    y = jax.lax.conv_transpose(
        x, w, (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
    b = p.get(f"{name}.bias")
    return y if b is None else y + b[None, :, None, None]


from goi_tpu.query._nn import gelu as _gelu, linear as _linear
from goi_tpu.query._nn import layer_norm as _layer_norm


def _ln(p, name, x, eps=1e-6):   # SAM pins 1e-6 (modeling/common.py)
    return _layer_norm(p, name, x, eps=eps)


def _ln2d(p, name, x, eps=1e-6):
    """LayerNorm2d: normalize the CHANNEL dim of NCHW
    (ref:modeling/common.py:31-43, eps 1e-6)."""
    m = jnp.mean(x, 1, keepdims=True)
    v = jnp.mean((x - m) ** 2, 1, keepdims=True)
    x = (x - m) / jnp.sqrt(v + eps)
    return x * p[f"{name}.weight"][None, :, None, None] \
        + p[f"{name}.bias"][None, :, None, None]


def _mlp_block(p, name, x, act=_gelu):
    """MLPBlock: lin1 -> act -> lin2 (ref:modeling/common.py:13-28).
    GELU in the ViT blocks; the two-way decoder passes ReLU
    (ref:transformer.py:23 activation default)."""
    return _linear(p, f"{name}.lin2", act(_linear(p, f"{name}.lin1", x)))


# ---------------------------------------------------------------------------
# image encoder (ViTDet; ref:modeling/image_encoder.py)
# ---------------------------------------------------------------------------

def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """(2*max(q,k)-1, d) table -> (q, k, d) lookup, linearly resizing the
    table when sizes differ (ref:image_encoder.py:292-322)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]),
                                   "linear")
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q - k) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int32)]


def _attn(p, name, x, num_heads: int, rel_hw: Optional[Tuple[int, int]]):
    """Windowed/global ViT attention with decomposed relative position
    (ref:image_encoder.py:185-245, add_decomposed_rel_pos :325-373).
    x: (B, H, W, C)."""
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = _linear(p, f"{name}.qkv", x).reshape(b, h * w, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * num_heads, h * w, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(0, 2, 1)
    if rel_hw is not None:
        rh = _get_rel_pos(h, h, p[f"{name}.rel_pos_h"])
        rw = _get_rel_pos(w, w, p[f"{name}.rel_pos_w"])
        rq = q.reshape(b * num_heads, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = attn.reshape(b * num_heads, h, w, h, w) \
            + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        attn = attn.reshape(b * num_heads, h * w, h * w)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).reshape(b, num_heads, h, w, hd) \
        .transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
    return _linear(p, f"{name}.proj", out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c),
            (hp, wp))


def _window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def image_encoder(p: dict, cfg: SAMConfig, x: jax.Array) -> jax.Array:
    """(B, 3, 1024, 1024) normalized image -> (B, 256, 64, 64)
    embedding (ref:image_encoder.py:107-117)."""
    pre = "image_encoder"
    x = _conv(p, f"{pre}.patch_embed.proj", x, stride=cfg.patch)
    x = x.transpose(0, 2, 3, 1)                   # (B, H, W, C)
    x = x + p[f"{pre}.pos_embed"]
    for i in range(cfg.depth):
        blk = f"{pre}.blocks.{i}"
        shortcut = x
        y = _ln(p, f"{blk}.norm1", x)
        if i in cfg.global_attn:
            y = _attn(p, f"{blk}.attn", y, cfg.num_heads,
                      (cfg.grid, cfg.grid))
        else:
            h, w = y.shape[1], y.shape[2]
            win, pad_hw = _window_partition(y, cfg.window)
            win = _attn(p, f"{blk}.attn", win, cfg.num_heads,
                        (cfg.window, cfg.window))
            y = _window_unpartition(win, cfg.window, pad_hw, (h, w))
        x = shortcut + y
        x = x + _mlp_block(p, f"{blk}.mlp", _ln(p, f"{blk}.norm2", x))
    x = x.transpose(0, 3, 1, 2)                   # (B, C, H, W)
    x = _conv(p, f"{pre}.neck.0", x)
    x = _ln2d(p, f"{pre}.neck.1", x)
    x = _conv(p, f"{pre}.neck.2", x, pad=1)
    return _ln2d(p, f"{pre}.neck.3", x)


# ---------------------------------------------------------------------------
# prompt encoder (ref:modeling/prompt_encoder.py)
# ---------------------------------------------------------------------------

def _pe_encode(p, coords):
    """[0,1] coords (..., 2) -> (..., prompt_dim) random-Fourier PE
    (ref:prompt_encoder.py:183-195)."""
    g = p["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    c = (2.0 * coords - 1.0) @ g * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)


def dense_pe(p: dict, cfg: SAMConfig) -> jax.Array:
    """(1, prompt_dim, 64, 64) grid PE (get_dense_pe)."""
    gs = cfg.grid
    y = (np.arange(gs, dtype=np.float32) + 0.5) / gs
    x = (np.arange(gs, dtype=np.float32) + 0.5) / gs
    grid = np.stack(np.meshgrid(x, y, indexing="xy"), -1)  # (gs, gs, 2)
    return _pe_encode(p, jnp.asarray(grid)).transpose(2, 0, 1)[None]


def encode_boxes(p: dict, cfg: SAMConfig, boxes: jax.Array) -> jax.Array:
    """(B, 4) xyxy in 1024-input pixels -> (B, 2, prompt_dim) sparse
    embedding (ref:prompt_encoder.py:96-104)."""
    coords = (boxes.reshape(-1, 2, 2) + 0.5) / cfg.img_size
    emb = _pe_encode(p, coords)
    corner = jnp.stack([p["prompt_encoder.point_embeddings.2.weight"][0],
                        p["prompt_encoder.point_embeddings.3.weight"][0]])
    return emb + corner[None]


def encode_points(p: dict, cfg: SAMConfig, points: jax.Array,
                  labels: jax.Array, pad: bool = True) -> jax.Array:
    """(B, N, 2) pixel coords + (B, N) labels {1 pos, 0 neg, -1 pad} ->
    (B, N(+1), prompt_dim) (ref:prompt_encoder.py:75-94)."""
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros_like(points[:, :1])], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones_like(labels[:, :1])], axis=1)
    emb = _pe_encode(p, (points + 0.5) / cfg.img_size)
    emb = jnp.where(labels[..., None] == -1,
                    p["prompt_encoder.not_a_point_embed.weight"][0], emb)
    emb = jnp.where(labels[..., None] == 0,
                    emb + p["prompt_encoder.point_embeddings.0.weight"][0],
                    emb)
    emb = jnp.where(labels[..., None] == 1,
                    emb + p["prompt_encoder.point_embeddings.1.weight"][0],
                    emb)
    return emb


def no_mask_embed(p: dict, cfg: SAMConfig, bs: int) -> jax.Array:
    """(bs, prompt_dim, 64, 64) dense embedding when no mask prompt."""
    e = p["prompt_encoder.no_mask_embed.weight"][0]
    return jnp.broadcast_to(e[None, :, None, None],
                            (bs, e.shape[0], cfg.grid, cfg.grid))


# ---------------------------------------------------------------------------
# two-way transformer + mask decoder (ref:modeling/transformer.py,
# mask_decoder.py)
# ---------------------------------------------------------------------------

def _dec_attn(p, name, q, k, v, num_heads):
    """Attention with optional channel downsample
    (ref:transformer.py:185-240)."""
    q = _linear(p, f"{name}.q_proj", q)
    k = _linear(p, f"{name}.k_proj", k)
    v = _linear(p, f"{name}.v_proj", v)
    b, nq, c = q.shape
    hd = c // num_heads

    def split(x):
        return x.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    a = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(hd), -1)
    o = (a @ vh).transpose(0, 2, 1, 3).reshape(b, nq, c)
    return _linear(p, f"{name}.out_proj", o)


def two_way_transformer(p: dict, cfg: SAMConfig, image_emb: jax.Array,
                        image_pe: jax.Array, tokens: jax.Array):
    """(B, C, H, W) image emb + PE, (B, T, C) query tokens ->
    (queries (B,T,C), keys (B,HW,C)) (ref:transformer.py:62-106)."""
    pre = "mask_decoder.transformer"
    b, c, h, w = image_emb.shape
    keys = image_emb.reshape(b, c, h * w).transpose(0, 2, 1)
    key_pe = image_pe.reshape(image_pe.shape[0], c, h * w) \
        .transpose(0, 2, 1)
    queries = tokens
    nh = cfg.decoder_heads
    for i in range(cfg.decoder_depth):
        lyr = f"{pre}.layers.{i}"
        if i == 0:
            # skip_first_layer_pe: self-attn REPLACES queries
            # (ref:transformer.py:158-162)
            queries = _dec_attn(p, f"{lyr}.self_attn",
                                queries, queries, queries, nh)
        else:
            q = queries + tokens
            queries = queries + _dec_attn(p, f"{lyr}.self_attn",
                                          q, q, queries, nh)
        queries = _ln(p, f"{lyr}.norm1", queries, eps=1e-5)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _dec_attn(
            p, f"{lyr}.cross_attn_token_to_image", q, k, keys, nh)
        queries = _ln(p, f"{lyr}.norm2", queries, eps=1e-5)
        queries = queries + _mlp_block(p, f"{lyr}.mlp", queries,
                                       act=jax.nn.relu)
        queries = _ln(p, f"{lyr}.norm3", queries, eps=1e-5)
        q = queries + tokens
        k = keys + key_pe
        keys = keys + _dec_attn(
            p, f"{lyr}.cross_attn_image_to_token", k, q, queries, nh)
        keys = _ln(p, f"{lyr}.norm4", keys, eps=1e-5)
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _dec_attn(
        p, f"{pre}.final_attn_token_to_image", q, k, keys, nh)
    queries = _ln(p, f"{pre}.norm_final_attn", queries, eps=1e-5)
    return queries, keys


def _head_mlp(p, name, x, layers: int, sigmoid: bool = False):
    for i in range(layers):
        x = _linear(p, f"{name}.layers.{i}", x)
        if i < layers - 1:
            x = jax.nn.relu(x)
    return jax.nn.sigmoid(x) if sigmoid else x


def mask_decoder(p: dict, cfg: SAMConfig, image_emb: jax.Array,
                 image_pe: jax.Array, sparse: jax.Array,
                 dense: jax.Array, multimask: bool):
    """-> (masks (B, n, 256, 256) logits, iou_pred (B, n))
    (ref:mask_decoder.py:91-176). n = 3 if multimask else 1."""
    pre = "mask_decoder"
    nm = cfg.num_multimask + 1
    out_tok = jnp.concatenate([p[f"{pre}.iou_token.weight"],
                               p[f"{pre}.mask_tokens.weight"]], 0)
    b = sparse.shape[0]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (b,) + out_tok.shape), sparse], 1)
    src = image_emb + dense
    pos = jnp.broadcast_to(image_pe, src.shape)
    hs, keys = two_way_transformer(p, cfg, src, pos, tokens)
    iou_tok = hs[:, 0]
    mask_toks = hs[:, 1:1 + nm]
    c, h, w = src.shape[1:]
    up = keys.transpose(0, 2, 1).reshape(b, c, h, w)
    up = _gelu(_ln2d(p, f"{pre}.output_upscaling.1",
                     _deconv2x(p, f"{pre}.output_upscaling.0", up)))
    up = _gelu(_deconv2x(p, f"{pre}.output_upscaling.3", up))
    hyper = jnp.stack(
        [_head_mlp(p, f"{pre}.output_hypernetworks_mlps.{i}",
                   mask_toks[:, i], 3) for i in range(nm)], 1)
    hh, ww = up.shape[2:]
    masks = (hyper @ up.reshape(b, up.shape[1], hh * ww)) \
        .reshape(b, nm, hh, ww)
    iou = _head_mlp(p, f"{pre}.iou_prediction_head", iou_tok, 3)
    sl = slice(1, None) if multimask else slice(0, 1)
    return masks[:, sl], iou[:, sl]


# ---------------------------------------------------------------------------
# predictor (resize / normalize / postprocess; ref:predictor.py, sam.py)
# ---------------------------------------------------------------------------

class SamJax:
    """SamPredictor equivalent for the box-prompted single-mask path."""

    def __init__(self, params: dict, cfg: SAMConfig = SAM_VIT_H):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.cfg = cfg
        self._encode = jax.jit(partial(image_encoder, cfg=cfg))
        self._emb = None
        self._orig_hw = None
        self._new_hw = None

    @staticmethod
    def _longest_side(h, w, target):
        scale = target / max(h, w)
        return int(h * scale + 0.5), int(w * scale + 0.5)

    def set_image(self, image: np.ndarray) -> None:
        """image: (H, W, 3) uint8/float RGB (ref:predictor.py set_image:
        resize longest side to 1024, normalize, pad bottom-right)."""
        h, w = image.shape[:2]
        nh, nw = self._longest_side(h, w, self.cfg.img_size)
        img = jax.image.resize(jnp.asarray(image, jnp.float32),
                               (nh, nw, 3), "bilinear")
        img = (img - PIXEL_MEAN) / PIXEL_STD
        img = jnp.pad(img, ((0, self.cfg.img_size - nh),
                            (0, self.cfg.img_size - nw), (0, 0)))
        self._emb = self._encode(self.params,
                                 x=img.transpose(2, 0, 1)[None])
        self._orig_hw = (h, w)
        self._new_hw = (nh, nw)

    def predict_boxes(self, boxes: np.ndarray, multimask: bool = False):
        """boxes: (B, 4) xyxy in ORIGINAL image pixels -> (masks
        (B, n, H, W) bool, iou (B, n)) — predict_torch(boxes=...,
        multimask_output=...) (ref:guidance/res_model.py:296-306)."""
        assert self._emb is not None, "call set_image() first"
        p, cfg = self.params, self.cfg
        h, w = self._orig_hw
        nh, nw = self._new_hw
        scale = jnp.asarray([nw / w, nh / h, nw / w, nh / h], jnp.float32)
        sparse = encode_boxes(p, cfg, jnp.asarray(boxes, jnp.float32)
                              * scale)
        dense = no_mask_embed(p, cfg, sparse.shape[0])
        pe = dense_pe(p, cfg)
        masks, iou = mask_decoder(
            p, cfg, jnp.broadcast_to(self._emb,
                                     (sparse.shape[0],)
                                     + self._emb.shape[1:]),
            pe, sparse, dense, multimask)
        # postprocess_masks: 256 -> 1024, crop padding, -> original
        b, n = masks.shape[:2]
        m = jax.image.resize(masks, (b, n, cfg.img_size, cfg.img_size),
                             "bilinear")[:, :, :nh, :nw]
        m = jax.image.resize(m, (b, n, h, w), "bilinear")
        return np.asarray(m > 0.0), np.asarray(iou)


# ---------------------------------------------------------------------------
# params: random init (tests) + checkpoint load
# ---------------------------------------------------------------------------

def sam_param_shapes(cfg: SAMConfig) -> dict:
    """Every checkpoint key -> shape (validated against the official
    sam_vit_* state_dicts)."""
    s = {}
    e, pd = cfg.embed_dim, cfg.prompt_dim

    def lin(name, o, i):
        s[f"{name}.weight"] = (o, i)
        s[f"{name}.bias"] = (o,)

    s["image_encoder.patch_embed.proj.weight"] = (e, 3, cfg.patch,
                                                  cfg.patch)
    s["image_encoder.patch_embed.proj.bias"] = (e,)
    s["image_encoder.pos_embed"] = (1, cfg.grid, cfg.grid, e)
    for i in range(cfg.depth):
        blk = f"image_encoder.blocks.{i}"
        ws = cfg.grid if i in cfg.global_attn else cfg.window
        s[f"{blk}.norm1.weight"] = (e,)
        s[f"{blk}.norm1.bias"] = (e,)
        s[f"{blk}.attn.qkv.weight"] = (3 * e, e)
        s[f"{blk}.attn.qkv.bias"] = (3 * e,)
        lin(f"{blk}.attn.proj", e, e)
        s[f"{blk}.attn.rel_pos_h"] = (2 * ws - 1, e // cfg.num_heads)
        s[f"{blk}.attn.rel_pos_w"] = (2 * ws - 1, e // cfg.num_heads)
        s[f"{blk}.norm2.weight"] = (e,)
        s[f"{blk}.norm2.bias"] = (e,)
        lin(f"{blk}.mlp.lin1", 4 * e, e)
        lin(f"{blk}.mlp.lin2", e, 4 * e)
    s["image_encoder.neck.0.weight"] = (pd, e, 1, 1)
    s["image_encoder.neck.1.weight"] = (pd,)
    s["image_encoder.neck.1.bias"] = (pd,)
    s["image_encoder.neck.2.weight"] = (pd, pd, 3, 3)
    s["image_encoder.neck.3.weight"] = (pd,)
    s["image_encoder.neck.3.bias"] = (pd,)

    s["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        (2, pd // 2)
    for i in range(4):
        s[f"prompt_encoder.point_embeddings.{i}.weight"] = (1, pd)
    s["prompt_encoder.not_a_point_embed.weight"] = (1, pd)
    s["prompt_encoder.no_mask_embed.weight"] = (1, pd)
    mc = cfg.mask_in_chans
    s["prompt_encoder.mask_downscaling.0.weight"] = (mc // 4, 1, 2, 2)
    s["prompt_encoder.mask_downscaling.0.bias"] = (mc // 4,)
    s["prompt_encoder.mask_downscaling.1.weight"] = (mc // 4,)
    s["prompt_encoder.mask_downscaling.1.bias"] = (mc // 4,)
    s["prompt_encoder.mask_downscaling.3.weight"] = (mc, mc // 4, 2, 2)
    s["prompt_encoder.mask_downscaling.3.bias"] = (mc,)
    s["prompt_encoder.mask_downscaling.4.weight"] = (mc,)
    s["prompt_encoder.mask_downscaling.4.bias"] = (mc,)
    s["prompt_encoder.mask_downscaling.6.weight"] = (pd, mc, 1, 1)
    s["prompt_encoder.mask_downscaling.6.bias"] = (pd,)

    pre = "mask_decoder"
    nm = cfg.num_multimask + 1
    s[f"{pre}.iou_token.weight"] = (1, pd)
    s[f"{pre}.mask_tokens.weight"] = (nm, pd)
    for i in range(cfg.decoder_depth):
        lyr = f"{pre}.transformer.layers.{i}"
        for at, dim in (("self_attn", pd),
                        ("cross_attn_token_to_image", pd // 2),
                        ("cross_attn_image_to_token", pd // 2)):
            for nm_ in ("q_proj", "k_proj", "v_proj"):
                lin(f"{lyr}.{at}.{nm_}", dim, pd)
            lin(f"{lyr}.{at}.out_proj", pd, dim)
        for j in range(1, 5):
            s[f"{lyr}.norm{j}.weight"] = (pd,)
            s[f"{lyr}.norm{j}.bias"] = (pd,)
        lin(f"{lyr}.mlp.lin1", cfg.decoder_mlp, pd)
        lin(f"{lyr}.mlp.lin2", pd, cfg.decoder_mlp)
    for nm_ in ("q_proj", "k_proj", "v_proj"):
        lin(f"{pre}.transformer.final_attn_token_to_image.{nm_}",
            pd // 2, pd)
    lin(f"{pre}.transformer.final_attn_token_to_image.out_proj",
        pd, pd // 2)
    s[f"{pre}.transformer.norm_final_attn.weight"] = (pd,)
    s[f"{pre}.transformer.norm_final_attn.bias"] = (pd,)
    s[f"{pre}.output_upscaling.0.weight"] = (pd, pd // 4, 2, 2)
    s[f"{pre}.output_upscaling.0.bias"] = (pd // 4,)
    s[f"{pre}.output_upscaling.1.weight"] = (pd // 4,)
    s[f"{pre}.output_upscaling.1.bias"] = (pd // 4,)
    s[f"{pre}.output_upscaling.3.weight"] = (pd // 4, pd // 8, 2, 2)
    s[f"{pre}.output_upscaling.3.bias"] = (pd // 8,)
    for i in range(nm):
        h = f"{pre}.output_hypernetworks_mlps.{i}"
        lin(f"{h}.layers.0", pd, pd)
        lin(f"{h}.layers.1", pd, pd)
        lin(f"{h}.layers.2", pd // 8, pd)
    h = f"{pre}.iou_prediction_head"
    lin(f"{h}.layers.0", 256, pd)
    lin(f"{h}.layers.1", 256, 256)
    lin(f"{h}.layers.2", nm, 256)
    return s


def init_sam_params(key, cfg: SAMConfig) -> dict:
    shapes = sam_param_shapes(cfg)
    keys = jax.random.split(key, len(shapes))
    out = {}
    for k_, (name, shp) in zip(keys, sorted(shapes.items())):
        if name.endswith(".bias") or "norm" in name or ".neck.1" in name \
                or ".neck.3" in name:
            out[name] = jnp.zeros(shp) if name.endswith("bias") \
                else jnp.ones(shp)
        elif name.endswith("pos_embed") or "rel_pos" in name:
            out[name] = 0.02 * jax.random.normal(k_, shp)
        else:
            fan = shp[-1] if len(shp) == 2 else int(np.prod(shp[1:]))
            out[name] = jax.random.normal(k_, shp) / np.sqrt(max(fan, 1))
    return out


def load_sam_params(path: str) -> dict:
    """Load an official sam_vit_*.pth checkpoint (torch CPU)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}
