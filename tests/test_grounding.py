"""GroundingDINO-JAX vs the vendored torch implementation (tiny dims).

Oracles (data dependencies only, skipped when absent):
- Swin backbone vs ref:ext/GroundingDINO/.../backbone/swin_transformer.py
- BERT tower + WordPiece tokenizer vs HuggingFace transformers
- sub-sentence masks vs ref bertwarper
- FULL model (image+caption -> pred_logits/pred_boxes) vs a torch
  wiring of the vendored Transformer/fuse/utils modules following
  ref:groundingdino.py:212-349, with identical random weights loaded
  through the checkpoint state_dict name contract.
"""

import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from goi_tpu.query.bert import (BERT_TINY_TEST, BertTokenizer,
                                bert_forward, bert_param_shapes,
                                make_test_vocab, special_token_masks)
from goi_tpu.query.grounding import (GDINO_TINY_TEST, GroundingConfig,
                                     GroundingDINOJax,
                                     grounding_forward,
                                     grounding_param_shapes,
                                     init_grounding_params)
from goi_tpu.query.res import JaxRESProvider, rerank_keep
from goi_tpu.query.swin import (SWIN_TINY_TEST, swin_forward,
                                swin_param_shapes)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

GD = "/root/reference/ext/GroundingDINO"


def _stub_ref_packages():
    """Make the vendored GroundingDINO modules importable without their
    heavy dependency chain (timm, torchvision, pycocotools)."""
    if "groundingdino" in sys.modules:
        return
    # --- timm ---
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    def _mod(name, path=None):
        m = types.ModuleType(name)
        if path is not None:
            m.__path__ = [path] if path else []
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        return m

    _mod("timm", "")
    _mod("timm.models", "")
    tl = _mod("timm.models.layers")
    tl.DropPath, tl.to_2tuple, tl.trunc_normal_ = \
        DropPath, to_2tuple, trunc_normal_

    # --- torchvision (never called here; the stub must also satisfy
    # the reference segment_anything import in test_sam_jax.py, which
    # can land in the same process — keep it a superset of both) ---
    if "torchvision" not in sys.modules:
        tv = _mod("torchvision", "")
        ops = _mod("torchvision.ops", "")
        boxes = _mod("torchvision.ops.boxes")
        boxes.nms = boxes.batched_nms = boxes.box_area = \
            lambda *a, **k: None
        ops.boxes = boxes
        tv.ops = ops
        tr = _mod("torchvision.transforms", "")
        trf = _mod("torchvision.transforms.functional")
        trf.resize = trf.to_pil_image = lambda *a, **k: None
        tr.functional = trf
        tv.transforms = tr

    # --- groundingdino package skeleton (skip heavy __init__s) ---
    root = f"{GD}/groundingdino"

    def pkg(name, path):
        _mod(name, path)

    pkg("groundingdino", root)
    pkg("groundingdino.util", f"{root}/util")
    pkg("groundingdino.models", f"{root}/models")
    pkg("groundingdino.models.GroundingDINO",
        f"{root}/models/GroundingDINO")
    pkg("groundingdino.models.GroundingDINO.backbone",
        f"{root}/models/GroundingDINO/backbone")

    misc = _mod("groundingdino.util.misc")

    class NestedTensor:
        def __init__(self, tensors, mask):
            self.tensors = tensors
            self.mask = mask

        def decompose(self):
            return self.tensors, self.mask

    def inverse_sigmoid(x, eps=1e-3):
        x = x.clamp(min=0, max=1)
        return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

    misc.NestedTensor = NestedTensor
    misc.inverse_sigmoid = inverse_sigmoid


def _ref(mod):
    _stub_ref_packages()
    name = f"groundingdino.models.GroundingDINO.{mod}"
    try:
        return importlib.import_module(name)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"vendored GroundingDINO not importable: {e}")


def _to_torch_sd(params, strip=""):
    out = {}
    for k, v in params.items():
        if strip and not k.startswith(strip):
            continue
        out[k[len(strip):]] = torch.from_numpy(
            np.asarray(v, np.float32))
    return out


def _rand_params(shapes, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, shp in sorted(shapes.items()):
        if k.endswith(".bias"):
            out[k] = rng.normal(0, 0.02, shp).astype(np.float32)
        elif ("norm" in k.lower() or "gamma" in k) and len(shp) == 1:
            out[k] = rng.uniform(0.5, 1.5, shp).astype(np.float32)
        else:
            fan = shp[-1] if len(shp) >= 2 else shp[0]
            out[k] = rng.normal(0, 1 / np.sqrt(fan), shp) \
                .astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# Swin vs vendored torch
# ---------------------------------------------------------------------------

def test_swin_vs_torch():
    sw = _ref("backbone.swin_transformer")
    cfg = SWIN_TINY_TEST
    ref = sw.SwinTransformer(
        pretrain_img_size=224, embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.num_heads),
        window_size=cfg.window, drop_path_rate=0.0, ape=False,
        patch_norm=True, out_indices=cfg.out_indices,
        frozen_stages=-1, use_checkpoint=False)
    ref.eval()  # the vendored train() override returns None

    params = _rand_params(swin_param_shapes(cfg), seed=3)
    missing, unexpected = ref.load_state_dict(
        _to_torch_sd(params, strip="backbone.0."), strict=False)
    assert not unexpected
    assert all("relative_position_index" in m for m in missing)

    # non-multiple-of-window size exercises padding + shifted masks
    x = np.random.default_rng(0).normal(
        0, 1, (1, 3, 40, 56)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref.forward_raw(torch.from_numpy(x))
    jx_outs = jax.jit(lambda p, v: swin_forward(p, cfg, v))(
        {k: jnp.asarray(v) for k, v in params.items()}, x)
    assert len(ref_outs) == len(jx_outs) == len(cfg.out_indices)
    for r, j in zip(ref_outs, jx_outs):
        np.testing.assert_allclose(np.asarray(j), r.numpy(),
                                   atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# BERT + tokenizer vs HuggingFace
# ---------------------------------------------------------------------------

def test_bert_vs_hf():
    hf = pytest.importorskip("transformers")
    cfg = BERT_TINY_TEST
    ref = hf.BertModel(hf.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
        num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
        intermediate_size=cfg.intermediate,
        max_position_embeddings=cfg.max_position,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)).eval()

    params = _rand_params(bert_param_shapes(cfg), seed=5)
    missing, unexpected = ref.load_state_dict(
        _to_torch_sd(params, strip="bert."), strict=False)
    assert not unexpected
    assert all("position_ids" in m for m in missing)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 11)).astype(np.int64)
    # block-diagonal 3D mask + restarting position ids (the bertwarper
    # contract)
    attn = np.zeros((2, 11, 11), bool)
    attn[:, :5, :5] = True
    attn[:, 5:, 5:] = True
    pos = np.concatenate([np.arange(5), np.arange(6)])[None].repeat(2, 0)
    with torch.no_grad():
        r = ref(input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(attn).float(),
                position_ids=torch.from_numpy(pos)).last_hidden_state
    j = bert_forward({k: jnp.asarray(v) for k, v in params.items()},
                     cfg, jnp.asarray(ids), jnp.asarray(attn),
                     jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(j), r.numpy(), atol=2e-5,
                               rtol=1e-4)


def test_wordpiece_tokenizer_vs_hf():
    from transformers import BertTokenizer as HFTok
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", ",", "the",
             "red", "chair", "sofa", "run", "##ning", "##ner", "un",
             "##aff", "##able", "a", "b", "c"]
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        vp = os.path.join(td, "vocab.txt")
        with open(vp, "w") as f:
            f.write("\n".join(vocab) + "\n")
        hf = HFTok(vp)
        mine = BertTokenizer(vp)
        for text in ("The red chair.", "unaffable runner?",
                     "running, running.", "THE   RED\tsofa",
                     "xyzzy chair"):
            assert mine.encode(text) == hf(text)["input_ids"], text
        # decode matches the reference's phrase extraction usage
        ids = mine.encode("unaffable running")[1:-1]
        assert mine.decode(ids) == hf.decode(ids)


def test_special_token_masks_vs_ref():
    bw = _ref("bertwarper")
    vocab = make_test_vocab(["the", "red", "chair", "sofa"])
    tok = BertTokenizer(vocab)
    ids = np.asarray([tok.encode("the red chair . sofa .")], np.int64)
    ref_attn, ref_pos, ref_cate = \
        bw.generate_masks_with_special_tokens_and_transfer_map(
            {"input_ids": torch.from_numpy(ids)}, tok.special_ids(),
            None)
    attn, pos, cate = special_token_masks(ids, tok.special_ids())
    np.testing.assert_array_equal(attn, ref_attn.numpy())
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    assert len(cate) == len(ref_cate)
    np.testing.assert_array_equal(cate[0], ref_cate[0].numpy())


# ---------------------------------------------------------------------------
# full model vs torch wiring
# ---------------------------------------------------------------------------

def test_grounding_full_vs_torch():
    sw = _ref("backbone.swin_transformer")
    pe = _ref("backbone.position_encoding")
    tr = _ref("transformer")
    ut = _ref("utils")
    bw = _ref("bertwarper")
    hf = pytest.importorskip("transformers")
    from groundingdino.util.misc import NestedTensor, inverse_sigmoid

    # d_model=256 is required: the vendored text-enhancer hardcodes a
    # 256-dim sine pos embed (ref:transformer.py:538-542)
    cfg = GroundingConfig(
        d_model=256, heads=8, enc_layers=2, dec_layers=2, ffn=2048,
        num_queries=20, max_text_len=40, text_pad=16, img_size=64,
        swin=SWIN_TINY_TEST, bert=BERT_TINY_TEST)
    params = _rand_params(grounding_param_shapes(cfg), seed=7)

    # ---- torch side ----
    backbone = sw.SwinTransformer(
        embed_dim=cfg.swin.embed_dim, depths=list(cfg.swin.depths),
        num_heads=list(cfg.swin.num_heads), window_size=cfg.swin.window,
        drop_path_rate=0.0, ape=False, patch_norm=True,
        out_indices=cfg.swin.out_indices, frozen_stages=-1)
    backbone.eval()
    bert = hf.BertModel(hf.BertConfig(
        vocab_size=cfg.bert.vocab_size, hidden_size=cfg.bert.hidden,
        num_hidden_layers=cfg.bert.layers,
        num_attention_heads=cfg.bert.heads,
        intermediate_size=cfg.bert.intermediate,
        max_position_embeddings=cfg.bert.max_position,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)).eval()
    transformer = tr.Transformer(
        d_model=cfg.d_model, nhead=cfg.heads,
        num_queries=cfg.num_queries, num_encoder_layers=cfg.enc_layers,
        num_decoder_layers=cfg.dec_layers, dim_feedforward=cfg.ffn,
        dropout=0.0, activation="relu", return_intermediate_dec=True,
        query_dim=4, num_patterns=0, num_feature_levels=cfg.levels,
        enc_n_points=cfg.n_points, dec_n_points=cfg.n_points,
        learnable_tgt_init=True, two_stage_type="standard",
        embed_init_tgt=True, use_text_enhancer=True,
        use_fusion_layer=True, use_checkpoint=False,
        use_transformer_ckpt=False, use_text_cross_attention=True,
        text_dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0)
    import copy
    bbox = nn.ModuleList(
        [ut.MLP(cfg.d_model, cfg.d_model, 4, 3)
         for _ in range(cfg.dec_layers)])
    transformer.decoder.bbox_embed = bbox
    transformer.enc_out_bbox_embed = ut.MLP(cfg.d_model, cfg.d_model,
                                            4, 3)
    transformer.enc_out_class_embed = ut.ContrastiveEmbed(
        max_text_len=cfg.max_text_len)
    chans = [cfg.swin.num_features[i] for i in cfg.swin.out_indices]

    class RefGD(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = nn.ModuleList([backbone])
            self.bert = bert
            self.feat_map = nn.Linear(cfg.bert.hidden, cfg.d_model)
            projs = [nn.Sequential(
                nn.Conv2d(c, cfg.d_model, 1),
                nn.GroupNorm(32, cfg.d_model)) for c in chans]
            projs.append(nn.Sequential(
                nn.Conv2d(chans[-1], cfg.d_model, 3, 2, 1),
                nn.GroupNorm(32, cfg.d_model)))
            self.input_proj = nn.ModuleList(projs)
            self.transformer = transformer
            self.bbox_embed = bbox

    model = RefGD()
    model.eval()
    missing, unexpected = model.load_state_dict(_to_torch_sd(params),
                                                strict=False)
    assert not unexpected, unexpected[:5]
    for m in missing:
        assert ("relative_position_index" in m or "position_ids" in m
                or "pooler" in m or
                "transformer.decoder.bbox_embed" in m), m

    vocab = make_test_vocab(["the", "red", "chair", "sofa", "table"])
    tok = BertTokenizer(vocab)
    caption = "the red chair ."
    ids = np.asarray([tok.encode(caption)], np.int64)
    L = ids.shape[1]
    img = np.random.default_rng(11).uniform(
        -1.5, 1.5, (1, 3, cfg.img_size, cfg.img_size)).astype(np.float32)

    with torch.no_grad():
        t_ids = torch.from_numpy(ids)
        attn, pos, _ = \
            bw.generate_masks_with_special_tokens_and_transfer_map(
                {"input_ids": t_ids}, tok.special_ids(), None)
        bert_out = model.bert(
            input_ids=t_ids, attention_mask=attn.float(),
            position_ids=pos).last_hidden_state
        encoded_text = model.feat_map(bert_out)
        text_dict = {
            "encoded_text": encoded_text,
            "text_token_mask": torch.ones(1, L, dtype=torch.bool),
            "position_ids": pos,
            "text_self_attention_masks": attn,
        }
        feats = model.backbone[0].forward_raw(torch.from_numpy(img))
        srcs = [model.input_proj[l](f) for l, f in enumerate(feats)]
        srcs.append(model.input_proj[len(feats)](feats[-1]))
        masks = [torch.zeros(1, s.shape[2], s.shape[3],
                             dtype=torch.bool) for s in srcs]
        pos_emb = pe.PositionEmbeddingSineHW(
            cfg.d_model // 2, temperatureH=cfg.pe_temperature,
            temperatureW=cfg.pe_temperature, normalize=True)
        poss = [pos_emb(NestedTensor(s, m))
                for s, m in zip(srcs, masks)]
        hs, reference, _, _, _ = model.transformer(
            srcs, masks, None, poss, None, None, text_dict)
        delta = model.bbox_embed[-1](hs[-1])
        ref_boxes = (delta + inverse_sigmoid(reference[-2])).sigmoid()
        ref_logits = ut.ContrastiveEmbed(cfg.max_text_len)(
            hs[-1], text_dict)

    # ---- JAX side ----
    j_attn, j_pos, _ = special_token_masks(ids, tok.special_ids())
    out = jax.jit(lambda p, **kw: grounding_forward(p, cfg, **kw))(
        {k: jnp.asarray(v) for k, v in params.items()},
        image=jnp.asarray(img), input_ids=jnp.asarray(ids),
        text_attn_3d=jnp.asarray(j_attn),
        position_ids=jnp.asarray(j_pos),
        text_pad_mask=jnp.zeros((1, L), bool))

    jb = np.asarray(out["pred_boxes"][0])
    jl = np.asarray(out["pred_logits"][0])
    rb = ref_boxes[0].numpy()
    rl = ref_logits[0].numpy()
    np.testing.assert_allclose(jb, rb, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(jl[:, :L], rl[:, :L], atol=2e-3,
                               rtol=1e-2)
    assert np.all(np.isneginf(jl[:, L:])) and np.all(
        np.isneginf(rl[:, L:]))


# ---------------------------------------------------------------------------
# predictor + RES provider
# ---------------------------------------------------------------------------

def test_rerank_keep_rules():
    # reference cutoff: drop at the first i with p[i] < a*p[0] or
    # p[i] < b*p[i-1] (ref:guidance/res_model.py:384-399)
    p = np.asarray([1.0, 0.995, 0.992, 0.9, 0.1])
    np.testing.assert_array_equal(rerank_keep(p, 0.99, 0.9), [0, 1, 2])
    # order is by descending prob regardless of input order
    p = np.asarray([0.5, 1.0, 0.999])
    np.testing.assert_array_equal(rerank_keep(p, 0.99, 0.9), [1, 2])
    # prev-ratio cut
    p = np.asarray([1.0, 0.995, 0.6])
    np.testing.assert_array_equal(rerank_keep(p, 0.5, 0.9), [0, 1])
    assert len(rerank_keep(np.asarray([1.0]), 0.99, 0.9)) == 1


def test_predict_and_res_provider():
    cfg = GDINO_TINY_TEST
    params = init_grounding_params(jax.random.PRNGKey(0), cfg)
    tok = BertTokenizer(make_test_vocab(["the", "red", "chair"]))
    dino = GroundingDINOJax(params, cfg, tok)
    img = np.random.default_rng(0).uniform(
        0, 1, (48, 64, 3)).astype(np.float32)
    boxes, scores, phrases = dino.predict(img, "the red chair",
                                          box_threshold=0.0)
    assert boxes.shape == (cfg.num_queries, 4)
    assert np.isfinite(boxes).all()
    assert ((boxes >= 0) & (boxes <= 1)).all()
    assert len(phrases) == len(scores)

    from goi_tpu.query.sam import SAMConfig, SamJax, init_sam_params
    tiny_sam = SAMConfig(embed_dim=32, depth=2, num_heads=2,
                         global_attn=(1,), window=4, img_size=64,
                         patch=8, prompt_dim=16, decoder_mlp=32)
    sam = SamJax(init_sam_params(jax.random.PRNGKey(1), tiny_sam),
                 tiny_sam)
    prov = JaxRESProvider(dino, sam, box_threshold=0.0)
    mask = prov.predict_mask(img, "the red chair")
    assert mask is not None and mask.shape == img.shape[:2]
    assert mask.dtype == bool

    # threshold nothing passes -> None (ref returns empty)
    prov_hi = JaxRESProvider(dino, sam, box_threshold=1.1)
    assert prov_hi.predict_mask(img, "the red chair") is None


def test_prep_text_truncation_keeps_sep():
    """A caption longer than text_pad must be truncated WITH a
    terminating [SEP], so the tail sub-sentence still receives a full
    bertwarper attention block and nonzero position ids (a bare cut
    leaves it diagonal-only at position 0 — silently ignored)."""
    from goi_tpu.query.grounding import GroundingConfig, GroundingDINOJax

    vocab = make_test_vocab(["the", "red", "chair", "sofa", "table"])
    tok = BertTokenizer(vocab)
    cfg = GroundingConfig(text_pad=8)
    det = object.__new__(GroundingDINOJax)
    det.tokenizer = tok
    det.cfg = cfg

    long_caption = "the red chair . the sofa . the red table"
    ids_np, attn, pos, pad_mask, ids = det._prep_text(long_caption)
    assert ids_np.shape == (1, cfg.text_pad)
    assert len(ids) == cfg.text_pad
    assert ids[-1] == tok.sep_id                    # forced terminator
    assert ids[-2] == tok.vocab["."]                # block-filling dot
    assert not pad_mask[0].any()                    # no pad rows
    # every non-special token in the tail sub-sentence attends beyond
    # itself: the bertwarper block exists (position ids restart at 0
    # per sub-sentence by bertwarper convention, so attn is the signal)
    specials = set(tok.special_ids()) | {tok.vocab["."]}
    tail = [i for i in range(5, cfg.text_pad - 1)
            if ids[i] not in specials]
    assert tail, "test caption must leave tail tokens"
    for i in tail:
        assert attn[0, i].sum() > 1, (i, attn[0, i])


def test_prep_text_short_caption_unchanged():
    vocab = make_test_vocab(["the", "red", "chair"])
    tok = BertTokenizer(vocab)
    from goi_tpu.query.grounding import GroundingConfig, GroundingDINOJax
    cfg = GroundingConfig(text_pad=16)
    det = object.__new__(GroundingDINOJax)
    det.tokenizer = tok
    det.cfg = cfg
    ids_np, attn, pos, pad_mask, ids = det._prep_text("the red chair")
    assert ids == tok.encode("the red chair .")
    assert pad_mask[0, len(ids):].all()


def test_official_checkpoint_shape_contract():
    """The committed names+shapes manifest of the official
    groundingdino_swint_ogc.pth architecture (derived from the VENDORED
    torch model at full geometry by tests/golden/
    derive_gdino_manifest.py) must cover grounding_param_shapes(
    GDINO_SWINT) 1:1 — loading the real checkpoint
    (ref:guidance/res_model.py:72-87) is a tested contract, the same
    discipline as tests/test_sam_jax.py's SAM manifest check."""
    import json
    import os

    from goi_tpu.query.grounding import (GDINO_SWINT,
                                         grounding_param_shapes)

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "gdino_swint_manifest.json")
    with open(path) as f:
        manifest = json.load(f)
    ours = grounding_param_shapes(GDINO_SWINT)
    missing = [k for k in ours if k not in manifest]
    assert not missing, missing[:8]
    for k, shp in ours.items():
        assert list(shp) == manifest[k], (k, shp, manifest[k])
    # manifest entries we deliberately don't load: fixed buffers the
    # checkpoint rebuilds (relative position indices, BERT position
    # ids), the unused BERT pooler, and the decoder's bbox_embed
    # aliases of the top-level bbox_embed ModuleList
    extra = set(manifest) - set(ours)
    for k in sorted(extra):
        assert ("relative_position_index" in k
                or "position_ids" in k
                or ".pooler." in k
                or "transformer.decoder.bbox_embed" in k), k
