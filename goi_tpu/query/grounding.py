"""GroundingDINO (open-vocabulary text->boxes detector) in pure JAX.

In-repo re-host of the RES pipeline's detector (P20/N10): the reference
runs the vendored torch GroundingDINO to turn a referring prompt into
boxes that seed SAM (ref:guidance/res_model.py:205-238,
ref:ext/GroundingDINO/groundingdino/models/GroundingDINO/
{groundingdino,transformer,fuse_modules}.py). Everything is
re-implemented TPU-first on the framework's own towers:

  Swin image backbone (query/swin.py)  +  BERT text tower (query/bert.py)
    -> input projections (conv1x1 + GroupNorm32, one extra conv3x3/s2)
    -> 6x feature-enhancer layer: bi-directional image<->text fusion
       (BiAttentionBlock), text self-attention enhancer, multi-scale
       deformable image self-attention (query/deform_attn.py core)
    -> language-guided query selection (two_stage_type="standard"):
       per-location contrastive logits against the fused text, top-900
       proposals (ref:transformer.py:284-327)
    -> 6x cross-modality decoder layer: query self-attn, text cross-attn,
       deformable image cross-attn, iterative box refinement
       (ref:transformer.py:802-927)
    -> ContrastiveEmbed logits over text tokens + sigmoid boxes.

Weights are pluggable SAM-style: params is a FLAT dict keyed by the
official groundingdino_swint_ogc.pth state_dict names, so
``load_groundingdino_params`` is torch.load + a "module." strip.
``init_grounding_params`` builds a random tiny model for tests.

TPU notes: the image is resized to a STATIC square (one compilation);
text is padded to a static length. All attention is dense MXU matmuls;
the deformable sampling reuses the fused gather+lerp core. Detection
boxes are normalized cxcywh, so the square resize (vs the reference's
aspect-preserving RandomResize([800])) maps back to the original frame
exactly — a deliberate static-shape deviation.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.query.bert import (BERT_BASE, BERT_TINY_TEST, BertConfig,
                                BertTokenizer, bert_forward,
                                bert_param_shapes, special_token_masks)
from goi_tpu.query.deform_attn import ms_deform_attn_core
from goi_tpu.query.swin import (SWIN_T, SWIN_TINY_TEST, SwinConfig,
                                swin_forward, swin_param_shapes)


@dataclasses.dataclass(frozen=True)
class GroundingConfig:
    d_model: int = 256
    heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn: int = 2048
    n_points: int = 4
    num_queries: int = 900
    max_text_len: int = 256
    text_pad: int = 64          # static tokenized-caption length
    img_size: int = 800         # static square input
    pe_temperature: float = 20.0  # ref:config pe_temperatureH/W
    swin: SwinConfig = SWIN_T
    bert: BertConfig = BERT_BASE

    @property
    def levels(self) -> int:
        return len(self.swin.out_indices) + 1


GDINO_SWINT = GroundingConfig()
GDINO_TINY_TEST = GroundingConfig(
    d_model=32, heads=4, enc_layers=2, dec_layers=2, ffn=64,
    num_queries=20, max_text_len=40, text_pad=16, img_size=64,
    swin=SWIN_TINY_TEST, bert=BERT_TINY_TEST)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

from goi_tpu.query._nn import linear as _linear
from goi_tpu.query._nn import layer_norm as _layer_norm


def _ln(p, name, x, eps=1e-5):   # torch nn.LayerNorm default
    return _layer_norm(p, name, x, eps=eps)


def _mlp(p, name, x, layers=3):
    """DETR MLP: relu between layers (ref:GroundingDINO/utils.py:171)."""
    for i in range(layers):
        x = _linear(p, f"{name}.layers.{i}", x)
        if i < layers - 1:
            x = jax.nn.relu(x)
    return x


def _mha(p, name, q, k, v, heads: int, *, attn_bias=None):
    """torch nn.MultiheadAttention semantics (packed in_proj)."""
    e = q.shape[-1]
    w = p[f"{name}.in_proj_weight"]
    b = p[f"{name}.in_proj_bias"]
    qh = q @ w[:e].T + b[:e]
    kh = k @ w[e:2 * e].T + b[e:2 * e]
    vh = v @ w[2 * e:].T + b[2 * e:]
    hd = e // heads

    def split(a):
        return a.reshape(a.shape[0], -1, heads, hd).transpose(0, 2, 1, 3)

    a = split(qh) @ split(kh).transpose(0, 1, 3, 2) / math.sqrt(hd)
    if attn_bias is not None:
        a = a + attn_bias
    a = jax.nn.softmax(a, -1)
    o = (a @ split(vh)).transpose(0, 2, 1, 3).reshape(q.shape[0], -1, e)
    return _linear(p, f"{name}.out_proj", o)


def _group_norm(p, name, x, groups=32, eps=1e-5):
    from goi_tpu.query._nn import group_norm
    return group_norm(p, name, x, groups=groups, eps=eps)


def _sine_embed_1d(x, num_feats: int, temperature: float = 10000.0):
    """x (...,) -> (..., num_feats) interleaved sin/cos
    (ref:GroundingDINO/utils.py:24-53 sine_func)."""
    dim_t = temperature ** (
        2 * (np.arange(num_feats) // 2) / num_feats)
    s = x[..., None] * (2 * math.pi) / dim_t
    return jnp.stack([jnp.sin(s[..., 0::2]), jnp.cos(s[..., 1::2])],
                     -1).reshape(*x.shape, num_feats)


def sine_pos_embed_hw(h: int, w: int, num_feats: int,
                      temperature: float) -> np.ndarray:
    """PositionEmbeddingSineHW with no padding (mask all valid),
    normalize=True (ref:backbone/position_encoding.py:86-136).
    Returns (h*w, 2*num_feats) [pos_y | pos_x]."""
    eps = 1e-6
    y = (np.arange(h, dtype=np.float32) + 1.0) / (h + eps) * 2 * math.pi
    x = (np.arange(w, dtype=np.float32) + 1.0) / (w + eps) * 2 * math.pi
    dim_t = temperature ** (2 * (np.arange(num_feats) // 2) / num_feats)
    py = y[:, None] / dim_t
    px = x[:, None] / dim_t
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])],
                  -1).reshape(h, num_feats)
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])],
                  -1).reshape(w, num_feats)
    grid = np.concatenate([
        np.broadcast_to(py[:, None], (h, w, num_feats)),
        np.broadcast_to(px[None, :], (h, w, num_feats))], -1)
    return grid.reshape(h * w, 2 * num_feats).astype(np.float32)


def _msda(p, name, query, value, ref_points, shapes, heads, n_points):
    """MSDeformAttn module with torch-Linear checkpoint weights
    (ref:ms_deform_attn.py:232-345). query (B, Q, E); value (B, S, E);
    ref_points (B, Q, L, 2 or 4) normalized."""
    n_levels = len(shapes)
    b, q, e = query.shape
    v = _linear(p, f"{name}.value_proj", value)
    v = v.reshape(b, -1, heads, e // heads)
    off = _linear(p, f"{name}.sampling_offsets", query) \
        .reshape(b, q, heads, n_levels, n_points, 2)
    aw = _linear(p, f"{name}.attention_weights", query)
    aw = jax.nn.softmax(aw.reshape(b, q, heads, n_levels * n_points))
    aw = aw.reshape(b, q, heads, n_levels, n_points)
    if ref_points.shape[-1] == 2:
        norm = jnp.asarray([(w_, h_) for (h_, w_) in shapes],
                           jnp.float32)
        loc = ref_points[:, :, None, :, None, :] \
            + off / norm[None, None, None, :, None, :]
    else:
        loc = ref_points[:, :, None, :, None, :2] \
            + off / n_points * ref_points[:, :, None, :, None, 2:] * 0.5
    out = ms_deform_attn_core(v, shapes, loc, aw)
    return _linear(p, f"{name}.output_proj", out)


# ---------------------------------------------------------------------------
# feature enhancer (encoder)
# ---------------------------------------------------------------------------

def _fusion_layer(p, name, v, l, text_pad_mask, heads, embed_dim):
    """BiAttentionBlock: bidirectional image<->text attention with
    layer-scale residuals (ref:fuse_modules.py:99-295). text_pad_mask
    (bs, nl) True = padding."""
    vn = _ln(p, f"{name}.layer_norm_v", v)
    ln_ = _ln(p, f"{name}.layer_norm_l", l)
    at = f"{name}.attn"
    hd = embed_dim // heads
    scale = hd ** -0.5

    def split(a):
        return a.reshape(a.shape[0], -1, heads, hd).transpose(0, 2, 1, 3)

    qs = split(_linear(p, f"{at}.v_proj", vn) * scale)
    ks = split(_linear(p, f"{at}.l_proj", ln_))
    vv = split(_linear(p, f"{at}.values_v_proj", vn))
    vl = split(_linear(p, f"{at}.values_l_proj", ln_))

    aw = qs @ ks.transpose(0, 1, 3, 2)            # (b, h, nv, nl)
    aw = aw - jnp.max(aw)                         # stable_softmax_2d
    aw = jnp.clip(aw, -50000.0, 50000.0)
    aw_t = aw.transpose(0, 1, 3, 2)               # (b, h, nl, nv)
    aw_l = aw_t - jnp.max(aw_t, -1, keepdims=True)
    aw_l = jnp.clip(aw_l, -50000.0, 50000.0)
    # mask language for vision (no image padding here, so only this
    # direction is masked; ref:fuse_modules.py:205-219)
    aw_v = jnp.where(text_pad_mask[:, None, None, :], -1e9, aw)
    a_v = jax.nn.softmax(aw_v, -1)
    a_l = jax.nn.softmax(aw_l, -1)
    out_v = (a_v @ vl).transpose(0, 2, 1, 3) \
        .reshape(v.shape[0], -1, embed_dim)
    out_l = (a_l @ vv).transpose(0, 2, 1, 3) \
        .reshape(l.shape[0], -1, embed_dim)
    dv = _linear(p, f"{at}.out_v_proj", out_v)
    dl = _linear(p, f"{at}.out_l_proj", out_l)
    return (vn + p[f"{name}.gamma_v"] * dv,
            ln_ + p[f"{name}.gamma_l"] * dl)


def _text_enhance_layer(p, name, src, attn_mask_3d, pos, heads):
    """Vanilla post-norm encoder layer on the text
    (ref:transformer_vanilla.py:72-123). attn_mask_3d (bs, L, L) True =
    attend (the bertwarper sub-sentence mask)."""
    bias = jnp.where(attn_mask_3d[:, None], 0.0, -1e9)
    q = src + pos
    src2 = _mha(p, f"{name}.self_attn", q, q, src, heads,
                attn_bias=bias)
    src = _ln(p, f"{name}.norm1", src + src2)
    h = jax.nn.relu(_linear(p, f"{name}.linear1", src))
    src = _ln(p, f"{name}.norm2",
              src + _linear(p, f"{name}.linear2", h))
    return src


def _enc_layer(p, name, src, pos, ref_points, shapes, heads, n_points):
    """DeformableTransformerEncoderLayer
    (ref:transformer.py:738-799)."""
    src2 = _msda(p, f"{name}.self_attn", src + pos, src, ref_points,
                 shapes, heads, n_points)
    src = _ln(p, f"{name}.norm1", src + src2)
    h = jax.nn.relu(_linear(p, f"{name}.linear1", src))
    src = _ln(p, f"{name}.norm2", src + _linear(p, f"{name}.linear2", h))
    return src


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _dec_layer(p, name, tgt, query_pos, ref_points_in, memory, shapes,
               memory_text, text_pad_mask, heads, n_points):
    """DeformableTransformerDecoderLayer: self-attn -> text cross-attn
    -> deformable image cross-attn -> FFN (ref:transformer.py:868-927)."""
    q = tgt + query_pos
    tgt2 = _mha(p, f"{name}.self_attn", q, q, tgt, heads)
    tgt = _ln(p, f"{name}.norm2", tgt + tgt2)

    bias = jnp.where(text_pad_mask[:, None, None, :], -1e9, 0.0)
    tgt2 = _mha(p, f"{name}.ca_text", tgt + query_pos, memory_text,
                memory_text, heads, attn_bias=bias)
    tgt = _ln(p, f"{name}.catext_norm", tgt + tgt2)

    tgt2 = _msda(p, f"{name}.cross_attn", tgt + query_pos, memory,
                 ref_points_in, shapes, heads, n_points)
    tgt = _ln(p, f"{name}.norm1", tgt + tgt2)

    h = jax.nn.relu(_linear(p, f"{name}.linear1", tgt))
    tgt = _ln(p, f"{name}.norm3", tgt + _linear(p, f"{name}.linear2", h))
    return tgt


def _inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None)
                   / jnp.clip(1.0 - x, eps, None))


def _contrastive(x, text, text_pad_mask, max_text_len):
    """ContrastiveEmbed (ref:GroundingDINO/utils.py:233-268):
    x (b, nq, E) @ text (b, nl, E)^T, padding -> -inf, padded out to
    max_text_len."""
    res = x @ text.transpose(0, 2, 1)
    res = jnp.where(text_pad_mask[:, None, :], -jnp.inf, res)
    pad = max_text_len - res.shape[-1]
    return jnp.pad(res, ((0, 0), (0, 0), (0, pad)),
                   constant_values=-jnp.inf)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def grounding_forward(p: dict, cfg: GroundingConfig, image: jax.Array,
                      input_ids: jax.Array, text_attn_3d: jax.Array,
                      position_ids: jax.Array, text_pad_mask: jax.Array):
    """image (B, 3, S, S) ImageNet-normalized; input_ids (B, L) int32;
    text_attn_3d (B, L, L) bool sub-sentence mask; position_ids (B, L);
    text_pad_mask (B, L) True = padding. Returns dict with
    pred_logits (B, nq, max_text_len) and pred_boxes (B, nq, 4)
    (ref:groundingdino.py:212-349)."""
    b = image.shape[0]
    e = cfg.d_model

    # ---- towers ----
    feats = swin_forward(p, cfg.swin, image)
    txt = bert_forward(p, cfg.bert, input_ids, text_attn_3d,
                       position_ids)
    txt = _linear(p, "feat_map", txt)            # (B, L, E)

    # ---- input projections + flatten (ref:groundingdino.py:291-310,
    # transformer.py:221-250) ----
    srcs = []
    for l, f in enumerate(feats):
        w = p[f"input_proj.{l}.0.weight"]
        y = jax.lax.conv_general_dilated(
            f, w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW")) \
            + p[f"input_proj.{l}.0.bias"][None, :, None, None]
        srcs.append(_group_norm(p, f"input_proj.{l}.1", y))
    l_extra = len(feats)
    w = p[f"input_proj.{l_extra}.0.weight"]
    y = jax.lax.conv_general_dilated(
        feats[-1], w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW")) \
        + p[f"input_proj.{l_extra}.0.bias"][None, :, None, None]
    srcs.append(_group_norm(p, f"input_proj.{l_extra}.1", y))

    shapes = tuple((s.shape[2], s.shape[3]) for s in srcs)
    src_flat = jnp.concatenate(
        [s.reshape(b, e, -1).transpose(0, 2, 1) for s in srcs], 1)
    pos_flat = jnp.concatenate(
        [jnp.asarray(sine_pos_embed_hw(h, wd, e // 2,
                                       cfg.pe_temperature))[None]
         + p["transformer.level_embed"][l][None, None]
         for l, (h, wd) in enumerate(shapes)], 1)
    pos_flat = jnp.broadcast_to(pos_flat, src_flat.shape)

    # ---- encoder (feature enhancer) ----
    # reference points: per-location normalized centers, replicated
    # per level (valid_ratios == 1, no padding)
    refs = np.concatenate([
        np.stack(np.meshgrid((np.arange(wd) + 0.5) / wd,
                             (np.arange(h) + 0.5) / h,
                             indexing="xy"), -1).reshape(-1, 2)
        for (h, wd) in shapes], 0).astype(np.float32)
    enc_ref = jnp.broadcast_to(
        jnp.asarray(refs)[None, :, None],
        (b, refs.shape[0], len(shapes), 2))

    pos_text = _sine_embed_1d(position_ids.astype(jnp.float32), e,
                              temperature=10000.0)
    mem, mem_text = src_flat, txt
    for i in range(cfg.enc_layers):
        mem, mem_text = _fusion_layer(
            p, f"transformer.encoder.fusion_layers.{i}", mem, mem_text,
            text_pad_mask, max(1, cfg.heads // 2), cfg.ffn // 2)
        mem_text = _text_enhance_layer(
            p, f"transformer.encoder.text_layers.{i}", mem_text,
            text_attn_3d, pos_text, max(1, cfg.heads // 2))
        mem = _enc_layer(p, f"transformer.encoder.layers.{i}", mem,
                         pos_flat, enc_ref, shapes, cfg.heads,
                         cfg.n_points)

    # ---- language-guided query selection (two-stage "standard",
    # ref:transformer.py:284-327, utils.py:56-116) ----
    props = []
    for lvl, (h, wd) in enumerate(shapes):
        grid = np.stack(np.meshgrid(
            (np.arange(wd, dtype=np.float32) + 0.5) / wd,
            (np.arange(h, dtype=np.float32) + 0.5) / h,
            indexing="xy"), -1).reshape(-1, 2)
        wh = np.full_like(grid, 0.05 * (2.0 ** lvl))
        props.append(np.concatenate([grid, wh], -1))
    props = np.concatenate(props, 0)
    valid = ((props > 0.01) & (props < 0.99)).all(-1)
    props_unsig = np.log(props / (1 - props)).astype(np.float32)
    props_unsig = jnp.asarray(
        np.where(valid[:, None], props_unsig, np.inf))[None]
    out_mem = mem * jnp.asarray(valid, jnp.float32)[None, :, None]
    out_mem = _ln(p, "transformer.enc_output_norm",
                  _linear(p, "transformer.enc_output", out_mem))

    enc_logits = _contrastive(out_mem, mem_text, text_pad_mask,
                              cfg.max_text_len)
    topk_score = jnp.max(enc_logits, -1)         # (B, S)
    _, topk_idx = jax.lax.top_k(topk_score, cfg.num_queries)
    coords_unsig = _mlp(p, "transformer.enc_out_bbox_embed", out_mem) \
        + props_unsig
    ref_unsig = jnp.take_along_axis(coords_unsig,
                                    topk_idx[..., None], 1)
    ref_boxes = jax.nn.sigmoid(ref_unsig)        # detached in torch
    tgt = jnp.broadcast_to(p["transformer.tgt_embed.weight"][None],
                           (b, cfg.num_queries, e))

    # ---- decoder with iterative box refinement
    # (ref:transformer.py:633-735) ----
    ref = jax.lax.stop_gradient(ref_boxes)
    ref_last_in = ref
    for i in range(cfg.dec_layers):
        # query pos: sine embed of (cy, cx, w, h) -> MLP
        sine = jnp.concatenate(
            [_sine_embed_1d(ref[..., 1], e // 2),
             _sine_embed_1d(ref[..., 0], e // 2),
             _sine_embed_1d(ref[..., 2], e // 2),
             _sine_embed_1d(ref[..., 3], e // 2)], -1)
        query_pos = _mlp(p, "transformer.decoder.ref_point_head", sine,
                         layers=2)
        ref_in = jnp.broadcast_to(
            ref[:, :, None], (b, cfg.num_queries, len(shapes), 4))
        tgt = _dec_layer(p, f"transformer.decoder.layers.{i}", tgt,
                         query_pos, ref_in, mem, shapes, mem_text,
                         text_pad_mask, cfg.heads, cfg.n_points)
        ref_last_in = ref
        # in-loop anchor update from the raw layer output
        # (ref:transformer.py:716-728)
        delta = _mlp(p, f"bbox_embed.{i}", tgt)
        ref = jax.lax.stop_gradient(
            jax.nn.sigmoid(delta + _inverse_sigmoid(ref)))

    # reported heads run on the NORMED hidden states with the ref that
    # ENTERED the last layer (ref:groundingdino.py:317-335)
    hs = _ln(p, "transformer.decoder.norm", tgt)
    logits = _contrastive(hs, mem_text, text_pad_mask, cfg.max_text_len)
    boxes_out = jax.nn.sigmoid(
        _mlp(p, f"bbox_embed.{cfg.dec_layers - 1}", hs)
        + _inverse_sigmoid(ref_last_in))
    return {"pred_logits": logits, "pred_boxes": boxes_out}


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def grounding_param_shapes(cfg: GroundingConfig) -> dict:
    s = {}
    e = cfg.d_model
    s.update(swin_param_shapes(cfg.swin))
    s.update(bert_param_shapes(cfg.bert))
    s["feat_map.weight"] = (e, cfg.bert.hidden)
    s["feat_map.bias"] = (e,)
    chans = [cfg.swin.num_features[i] for i in cfg.swin.out_indices]
    for l, c in enumerate(chans):
        s[f"input_proj.{l}.0.weight"] = (e, c, 1, 1)
        s[f"input_proj.{l}.0.bias"] = (e,)
        s[f"input_proj.{l}.1.weight"] = (e,)
        s[f"input_proj.{l}.1.bias"] = (e,)
    s[f"input_proj.{len(chans)}.0.weight"] = (e, chans[-1], 3, 3)
    s[f"input_proj.{len(chans)}.0.bias"] = (e,)
    s[f"input_proj.{len(chans)}.1.weight"] = (e,)
    s[f"input_proj.{len(chans)}.1.bias"] = (e,)
    s["transformer.level_embed"] = (cfg.levels, e)

    def lin(name, o, i):
        s[f"{name}.weight"] = (o, i)
        s[f"{name}.bias"] = (o,)

    def msda(name):
        n = cfg.levels * cfg.heads * cfg.n_points
        lin(f"{name}.sampling_offsets", 2 * n, e)
        lin(f"{name}.attention_weights", n, e)
        lin(f"{name}.value_proj", e, e)
        lin(f"{name}.output_proj", e, e)

    def norm(name, d=e):
        s[f"{name}.weight"] = (d,)
        s[f"{name}.bias"] = (d,)

    def mha(name):
        s[f"{name}.in_proj_weight"] = (3 * e, e)
        s[f"{name}.in_proj_bias"] = (3 * e,)
        lin(f"{name}.out_proj", e, e)

    fd = cfg.ffn // 2
    for i in range(cfg.enc_layers):
        lyr = f"transformer.encoder.layers.{i}"
        msda(f"{lyr}.self_attn")
        norm(f"{lyr}.norm1")
        lin(f"{lyr}.linear1", cfg.ffn, e)
        lin(f"{lyr}.linear2", e, cfg.ffn)
        norm(f"{lyr}.norm2")
        tl = f"transformer.encoder.text_layers.{i}"
        mha(f"{tl}.self_attn")
        lin(f"{tl}.linear1", fd, e)
        lin(f"{tl}.linear2", e, fd)
        norm(f"{tl}.norm1")
        norm(f"{tl}.norm2")
        fl = f"transformer.encoder.fusion_layers.{i}"
        norm(f"{fl}.layer_norm_v")
        norm(f"{fl}.layer_norm_l")
        for nm in ("v_proj", "l_proj", "values_v_proj", "values_l_proj"):
            lin(f"{fl}.attn.{nm}", fd, e)
        lin(f"{fl}.attn.out_v_proj", e, fd)
        lin(f"{fl}.attn.out_l_proj", e, fd)
        s[f"{fl}.gamma_v"] = (e,)
        s[f"{fl}.gamma_l"] = (e,)
    for i in range(cfg.dec_layers):
        lyr = f"transformer.decoder.layers.{i}"
        msda(f"{lyr}.cross_attn")
        norm(f"{lyr}.norm1")
        mha(f"{lyr}.ca_text")
        norm(f"{lyr}.catext_norm")
        mha(f"{lyr}.self_attn")
        norm(f"{lyr}.norm2")
        lin(f"{lyr}.linear1", cfg.ffn, e)
        lin(f"{lyr}.linear2", e, cfg.ffn)
        norm(f"{lyr}.norm3")
        for j, (o, i_) in enumerate(((e, e), (e, e), (4, e))):
            lin(f"bbox_embed.{i}.layers.{j}", o, i_)
    norm("transformer.decoder.norm")
    lin("transformer.decoder.ref_point_head.layers.0", e, 2 * e)
    lin("transformer.decoder.ref_point_head.layers.1", e, e)
    s["transformer.tgt_embed.weight"] = (cfg.num_queries, e)
    lin("transformer.enc_output", e, e)
    norm("transformer.enc_output_norm")
    for j, (o, i_) in enumerate(((e, e), (e, e), (4, e))):
        lin(f"transformer.enc_out_bbox_embed.layers.{j}", o, i_)
    return s


def init_grounding_params(key, cfg: GroundingConfig) -> dict:
    shapes = grounding_param_shapes(cfg)
    keys = jax.random.split(key, len(shapes))
    out = {}
    for k_, (name, shp) in zip(keys, sorted(shapes.items())):
        if name.endswith(".bias") or "gamma" in name:
            out[name] = (1e-4 * jnp.ones(shp) if "gamma" in name
                         else jnp.zeros(shp))
        elif "norm" in name.lower() and len(shp) == 1:
            out[name] = jnp.ones(shp)
        elif len(shp) == 1:
            out[name] = 0.02 * jax.random.normal(k_, shp)
        else:
            fan = shp[-1] if len(shp) == 2 else int(np.prod(shp[1:]))
            out[name] = jax.random.normal(k_, shp) / np.sqrt(max(fan, 1))
    return out


def load_groundingdino_params(path: str) -> dict:
    """Load the official groundingdino_swint_ogc.pth (torch CPU)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if "relative_position_index" in k or "relative_coords" in k:
            continue  # recomputed buffers
        out[k] = np.asarray(v, np.float32)
    return out


# ---------------------------------------------------------------------------
# predictor
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class GroundingDINOJax:
    """get_grounding_output equivalent (ref:guidance/res_model.py:
    205-238): image + caption -> filtered boxes + per-box phrases."""

    def __init__(self, params: dict, cfg: GroundingConfig,
                 tokenizer: BertTokenizer):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.cfg = cfg
        self.tokenizer = tokenizer
        self._fwd = jax.jit(partial(grounding_forward, cfg=cfg))

    def _prep_text(self, caption: str):
        cap = caption.lower().strip()
        if not cap.endswith("."):
            cap = cap + "."
        ids = self.tokenizer.encode(cap)
        if len(ids) > self.cfg.text_pad:
            # force a ". [SEP]" terminator so the last sub-sentence
            # still gets a bertwarper attention block + position ids:
            # special_token_masks skips a special token at the LAST
            # position (ref:bertwarper.py:240), so the block for the
            # tail is filled by the '.' at n-2 — a bare truncation
            # leaves the tail diagonal-only at position 0, silently
            # ignoring it
            ids = ids[:self.cfg.text_pad]
            ids[-2] = self.tokenizer.vocab["."]
            ids[-1] = self.tokenizer.sep_id
        n = len(ids)
        pad = self.cfg.text_pad - n
        ids_np = np.asarray(ids + [self.tokenizer.pad_id] * pad,
                            np.int32)[None]
        attn, pos, _ = special_token_masks(
            ids_np[:, :n], self.tokenizer.special_ids())
        attn_full = np.zeros((1, self.cfg.text_pad, self.cfg.text_pad),
                             bool)
        attn_full[:, :n, :n] = attn
        # padded rows attend themselves so softmax stays finite
        for j in range(n, self.cfg.text_pad):
            attn_full[:, j, j] = True
        pos_full = np.zeros((1, self.cfg.text_pad), np.int32)
        pos_full[:, :n] = pos
        pad_mask = np.ones((1, self.cfg.text_pad), bool)
        pad_mask[:, :n] = False
        return ids_np, attn_full, pos_full, pad_mask, ids

    def predict(self, image: np.ndarray, caption: str,
                box_threshold: float = 0.3,
                text_threshold: float = 0.25):
        """image (H, W, 3) float [0,1] -> (boxes (n, 4) cxcywh
        normalized, scores (n,), phrases list[str])."""
        s = self.cfg.img_size
        img = jax.image.resize(jnp.asarray(image, jnp.float32),
                               (s, s, 3), "bilinear")
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        ids_np, attn, pos, pad_mask, ids = self._prep_text(caption)
        out = self._fwd(self.params, image=img.transpose(2, 0, 1)[None],
                        input_ids=jnp.asarray(ids_np),
                        text_attn_3d=jnp.asarray(attn),
                        position_ids=jnp.asarray(pos),
                        text_pad_mask=jnp.asarray(pad_mask))
        raw = np.asarray(out["pred_logits"][0], np.float32)
        with np.errstate(over="ignore"):
            logits = 1.0 / (1.0 + np.exp(-raw))  # -inf pad -> 0
        boxes = np.asarray(out["pred_boxes"][0])
        scores = logits.max(-1)
        keep = scores > box_threshold
        phrases = []
        for row in logits[keep]:
            posmap = row[:len(ids)] > text_threshold
            tok = [ids[i] for i in np.nonzero(posmap)[0]]
            phrases.append(self.tokenizer.decode(tok))
        return boxes[keep], scores[keep].astype(np.float32), phrases
